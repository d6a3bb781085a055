"""Index artifact build + load round-trip (reference indexer CLI, §3.1)."""

import os

import numpy as np
import pandas as pd
import pytest

from go_osm_search_ray import synth
from go_osm_search_ray.pipelines import indexer
from go_osm_search_ray.stages import text

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
class TestIndexer:
    def test_build_and_load(self, tmp_path):
        import ray.data as rd

        out = str(tmp_path / "idx")
        factory = lambda: rd.read_parquet(f"{SF}/documents.parquet",
                                          columns=["doc_id", "text"])
        m = indexer.build_index(factory, out,
                                spell_error_lines=synth.spell_errors_lines())
        assert set(m["stages"]) == {"postings", "doc_stats", "vocab", "ngrams",
                                    "meta"}
        assert all(v >= 0 for v in m["stages"].values())
        assert os.path.exists(os.path.join(out, "_manifest.json"))

        idx = indexer.LoadedIndex(out)
        assert idx.meta["docs_count"] == 500

        # stage-level resume: a full manifest skips every stage
        # (timings carried over verbatim), and a manifest missing the
        # tail stages rebuilds ONLY those (simulated mid-run crash)
        m2 = indexer.build_index(factory, out, resume=True,
                                 spell_error_lines=synth.spell_errors_lines())
        assert m2["stages"] == m["stages"]
        import json

        with open(os.path.join(out, "_manifest.json")) as fh:
            man = json.load(fh)
        for k in ("ngrams", "meta"):
            man["stages"].pop(k)
        with open(os.path.join(out, "_manifest.json"), "w") as fh:
            json.dump(man, fh)
        m3 = indexer.build_index(factory, out, resume=True,
                                 spell_error_lines=synth.spell_errors_lines())
        assert m3["stages"]["postings"] == m["stages"]["postings"]  # skipped
        assert indexer.LoadedIndex(out).meta["docs_count"] == 500  # rebuilt ok

        # J4 semi-join: postings for specific terms with filter pushdown
        p = idx.postings(["hash", "scan"])
        assert set(p["term"]) == {"hash", "scan"}
        # postings agree with a fresh distributed computation
        df = text.term_df(factory()).to_pandas().set_index("term")["df"]
        for r in p.itertuples():
            assert len(r.postings) == df[r.term] == r.df
            assert list(r.postings) == sorted(r.postings)

        # corrector rebuilt from artifacts corrects a typo
        got = idx.corrector.correct(["hsah"])
        assert got == ["hash"]

        # S12 doc hydration with filter pushdown
        docs = idx.get_docs(f"{SF}/documents.parquet", [3, 7])
        assert set(docs["doc_id"]) == {3, 7}

    def test_meta_stats(self, tmp_path):
        import ray.data as rd

        out = str(tmp_path / "idx2")
        factory = lambda: rd.read_parquet(f"{SF}/documents.parquet",
                                          columns=["doc_id", "text"])
        indexer.build_index(factory, out)
        idx = indexer.LoadedIndex(out)
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        toks = text.tokenize_series(docs["text"])
        assert abs(idx.meta["avg_doc_len"] - toks.str.len().mean()) < 1e-9


def test_merge_postings_incremental_equals_batch(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from go_osm_search_ray.pipelines.indexer import merge_postings
    from go_osm_search_ray.stages import text as T

    df = pd.DataFrame({
        "doc_id": np.arange(10, dtype=np.int64),
        "text": [f"alpha beta doc{i} shared token" for i in range(10)],
    })
    old = ray.data.from_pandas(df[df.doc_id % 3 != 0]).repartition(2)
    new = ray.data.from_pandas(df[df.doc_id % 3 == 0]).repartition(2)
    merged = merge_postings(T.postings_lists(old), new).to_pandas()
    full = T.postings_lists(ray.data.from_pandas(df)).to_pandas()
    m = {r["term"]: list(r["postings"]) for _, r in merged.iterrows()}
    f = {r["term"]: list(r["postings"]) for _, r in full.iterrows()}
    assert m == f
    assert (merged.set_index("term")["df"]
            == merged.set_index("term")["postings"].map(len)).all()
