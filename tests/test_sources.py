"""Source-format dispatch: the same pipeline over parquet / CSV / JSONL."""

import numpy as np
import pandas as pd
import pytest

from go_osm_search_ray.sources import read_table_auto
from go_osm_search_ray.stages import text


@pytest.mark.usefixtures("ray_session")
class TestReadTableAuto:
    def _frame(self):
        return pd.DataFrame({
            "doc_id": np.arange(6, dtype=np.int64),
            "text": ["hash join", "merge sort", "hash scan",
                     "table scan", "sort merge", "hash hash"],
            "extra": ["x"] * 6,
        })

    def test_same_pipeline_all_formats(self, tmp_path):
        df = self._frame()
        paths = {
            "parquet": str(tmp_path / "docs.parquet"),
            "csv": str(tmp_path / "docs.csv"),
            "jsonl": str(tmp_path / "docs.jsonl"),
        }
        df.to_parquet(paths["parquet"])
        df.to_csv(paths["csv"], index=False)
        df.to_json(paths["jsonl"], orient="records", lines=True)

        results = {}
        for fmt, p in paths.items():
            ds = read_table_auto(p, columns=["doc_id", "text"])
            out = text.term_df(ds).to_pandas().set_index("term")["df"]
            results[fmt] = out.to_dict()
        assert results["parquet"] == results["csv"] == results["jsonl"]
        assert results["parquet"]["hash"] == 3

    def test_unknown_format_raises(self, tmp_path):
        with pytest.raises(ValueError):
            read_table_auto(str(tmp_path / "docs.avro"))


@pytest.mark.usefixtures("ray_session")
class TestStageRegistry:
    """SURVEY.md §2.11 — the Ray-Data-native extension surface."""

    def test_builtin_stages_listed_and_apply(self):
        import pandas as pd
        import ray.data as rd

        from go_osm_search_ray import stage

        names = stage.list_stages()
        assert "tokenize" in names and "image:ahash" in names
        ds = rd.from_pandas(pd.DataFrame(
            {"doc_id": [1, 2], "text": ["Hello World", "foo bar baz"]}
        ))
        out = stage.apply(ds, "tokenize").to_pandas()
        assert list(out["tokens"][0]) == ["hello", "world"]

    def test_user_registration_and_shuffle_key_contract(self):
        import pandas as pd
        import ray.data as rd

        from go_osm_search_ray import stage

        @stage.register_stage("test-upper", batch_format="pandas",
                              shuffle_key=("doc_id",))
        def upper(b):
            return b.assign(text=b["text"].str.upper())

        st = stage.get_stage("test-upper")
        assert st.shuffle_key == ("doc_id",)
        ds = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["x"]}))
        assert stage.apply(ds, "test-upper").to_pandas()["text"][0] == "X"
        with pytest.raises(ValueError):
            stage.register_stage("test-upper", lambda b: b)
        with pytest.raises(KeyError):
            stage.get_stage("nope")

    def test_scoring_resolution(self):
        from go_osm_search_ray import stage

        assert stage.resolve_scoring("bm25f") == "bm25f"
        with pytest.raises(ValueError):
            stage.resolve_scoring("pagerank")
        stage.register_stage("score:custom", lambda b: b)
        assert stage.resolve_scoring("custom") == "custom"
