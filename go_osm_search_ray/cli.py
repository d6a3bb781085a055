"""CLI entry points (the reference's two executables, §3.1/§3.2):

    python -m go_osm_search_ray.cli index  --docs D.parquet --out IDX/
    python -m go_osm_search_ray.cli search --index IDX/ --docs D.parquet \
        --query "kebon binatag" [--scoring bm25f] [-k 10]
    python -m go_osm_search_ray.cli flagship --n 100000 --out OUT/

Only this module (and bench.py / the pytest fixture) owns a Ray
session; library code never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray():
    """Own the Ray session: local by default; under `ray job submit`
    RAY_ADDRESS (or address=auto) attaches to the cluster instead."""
    import os

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_index(args):
    ray = _ray()
    import ray.data as rd

    from .pipelines import indexer
    from . import synth

    factory = lambda: rd.read_parquet(args.docs, columns=[args.id_col, args.text_col])
    m = indexer.build_index(factory, args.out,
                            spell_error_lines=synth.spell_errors_lines(),
                            id_col=args.id_col, text_col=args.text_col)
    print(json.dumps(m))
    ray.shutdown()


def cmd_search(args):
    ray = _ray()
    import pandas as pd
    import ray.data as rd

    from .pipelines import indexer, search

    idx = indexer.LoadedIndex(args.index)
    factory = lambda: rd.read_parquet(args.docs, columns=[args.id_col, args.text_col])
    qs = pd.DataFrame({"query_id": [0], "query": [args.query]})
    out = search.full_text_search(factory, qs, idx.corrector, k=args.k,
                                  scoring=args.scoring)
    hydrated = idx.get_docs(args.docs, out["doc_id"].tolist())
    merged = out.merge(hydrated, left_on="doc_id", right_on=args.id_col)
    print(merged.to_json(orient="records"))
    ray.shutdown()


def cmd_flagship(args):
    ray = _ray()

    from .pipelines import flagship

    m = flagship.run_flagship_synth(args.n, args.out, seed=args.seed)
    print(json.dumps({"partitions": len(m["partitions"]),
                      "rows": sum(p["row_count"] for p in m["partitions"].values()),
                      "wall_ms": m["wall_ms"]}))
    ray.shutdown()


def main(argv=None):
    p = argparse.ArgumentParser(prog="go_osm_search_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("index")
    pi.add_argument("--docs", required=True)
    pi.add_argument("--out", required=True)
    pi.add_argument("--id-col", default="doc_id")
    pi.add_argument("--text-col", default="text")
    pi.set_defaults(fn=cmd_index)

    ps = sub.add_parser("search")
    ps.add_argument("--index", required=True)
    ps.add_argument("--docs", required=True)
    ps.add_argument("--query", required=True)
    ps.add_argument("--scoring", default="bm25f",
                    choices=["bm25f", "bm25plus", "tfidf"])
    ps.add_argument("-k", type=int, default=10)
    ps.add_argument("--id-col", default="doc_id")
    ps.add_argument("--text-col", default="text")
    ps.set_defaults(fn=cmd_search)

    pf = sub.add_parser("flagship")
    pf.add_argument("--n", type=int, default=100000)
    pf.add_argument("--out", required=True)
    pf.add_argument("--seed", type=int, default=42)
    pf.set_defaults(fn=cmd_flagship)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main(sys.argv[1:])
