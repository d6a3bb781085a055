"""Driver contract for the graft builder (Ray Data target).

The driver initialises Ray BEFORE importing this module; nothing here
(nor in go_osm_search_ray) calls ray.init()/ray.shutdown().

- entry():      flagship pipeline over /root/testdata/sf0.001 — derive
                geo keys -> tile assignment -> PIP spatial join.
- queries():    one callable per implemented operator (SURVEY.md §2);
                each takes sf_dir and returns Dataset / DataFrame / Table.
- oracle_sql(): matching DuckDB SQL on the pre-registered views for
                every SQL-expressible query.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: orders-derived points -> tiles -> PIP join vs nation
    rectangles, on sf0.001."""
    from go_osm_search_ray.pipelines import queries as q

    return q.q_pip_join("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from go_osm_search_ray.pipelines import queries as q

    return {name: fn for name, (fn, _sql) in q.registry().items()}


def oracle_sql(sf_dir: str | None = None) -> dict[str, str]:
    """Oracle SQL for every SQL-expressible query.  The trained-state
    oracles (kmeans/PQ/IVF/BPE/SemDeDup VALUES tables) are regenerated
    from the sf the harness compares at: the driver's contract sf0.01
    by default, overridable via arg or GRAFT_ORACLE_SF_DIR."""
    import os

    from go_osm_search_ray.pipelines import queries as q

    sf = sf_dir or os.environ.get("GRAFT_ORACLE_SF_DIR") or q.ORACLE_SF
    return {name: sql for name, (_fn, sql) in q.registry(sf).items() if sql is not None}
