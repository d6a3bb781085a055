"""Two-phase aggregation helpers.

Ray Data's sort-based `groupby().aggregate()` pays a large fixed
all-to-all cost (and degrades with group count in this version: ~60 s
for 100k groups on 100k rows at 8 CPUs).  When the per-batch PARTIAL
aggregation already collapses the data to O(distinct keys per block),
the final combine over partials is tiny — so this helper finishes it
with a single pandas combine on the driver.

Scale contract: the RESULT (and the per-block partials) must be
bounded by the key cardinality, not the input size.  That holds for
tile histograms, term DF, vocab counts, n-gram counts, hourly windows.
For genuinely huge key spaces (e.g. per-document stats over 10^12 docs)
keep `Dataset.groupby` (pass combine="shuffle") so the merge itself is
distributed — the partial stage is identical either way.
"""

from __future__ import annotations

import pandas as pd


def two_phase_agg(ds, partial_fn, keys, sums, combine: str = "driver"):
    """partial_fn: batch -> partial rows with `keys` + `sums` columns.
    Returns aggregated result with SUM over each column in `sums`.

    combine="driver": small final pandas combine (default; see module
    docstring).  combine="shuffle": Ray groupby for unbounded keys.
    """
    partials = ds.map_batches(partial_fn, batch_format="pandas")
    if combine == "shuffle":
        from ray.data.aggregate import Sum

        return partials.groupby(keys).aggregate(
            *[Sum(c, alias_name=c) for c in sums]
        )
    pdf = partials.to_pandas()
    if len(pdf) == 0:
        return pdf
    out = pdf.groupby(keys, sort=True, as_index=False)[list(sums)].sum()
    return out
