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


@pytest.mark.usefixtures("ray_session")
class TestOsmXml:
    """Round-5 ask #8: real-format OSM XML ingestion — the reference's
    parse_osm.go reader semantics (entity scan, tag extraction,
    way->node ref resolution) proven against the checked-in extract's
    CSV ground truth."""

    OSM = "/root/repo/tests/data/sample.osm"
    NODES_CSV = "/root/repo/tests/data/sample_nodes.csv"
    REFS_CSV = "/root/repo/tests/data/sample_way_refs.csv"

    def test_nodes_match_csv_truth(self):
        from go_osm_search_ray.sources.osm import read_osm

        got = read_osm(self.OSM, kind="nodes").to_pandas() \
            .sort_values("node_id").reset_index(drop=True)
        want = pd.read_csv(self.NODES_CSV, keep_default_na=False) \
            .sort_values("node_id").reset_index(drop=True)
        assert len(got) == len(want) == 3000
        np.testing.assert_array_equal(got["node_id"], want["node_id"])
        np.testing.assert_array_equal(got["lat"], want["lat"])
        np.testing.assert_array_equal(got["lon"], want["lon"])
        assert (got["amenity"] == want["amenity"].astype(str)).all()
        # entity escapes + unicode names round-trip
        assert (got["name"] == want["name"].astype(str)).all()
        assert got["name"].str.contains("& Co").any()
        assert got["name"].str.contains("Σigma").any()

    def test_way_refs_and_dispatch(self):
        from go_osm_search_ray.sources import read_table_auto
        from go_osm_search_ray.sources.osm import read_osm

        got = read_osm(self.OSM, kind="way_refs").to_pandas() \
            .sort_values(["way_id", "seq"]).reset_index(drop=True)
        want = pd.read_csv(self.REFS_CSV) \
            .sort_values(["way_id", "seq"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # .osm dispatches through read_table_auto with column pruning
        auto = read_table_auto(self.OSM, columns=["node_id", "lat"])
        assert auto.schema().names == ["node_id", "lat"]

    def test_way_lengths_drop_unresolved(self):
        """S2 resolve-or-skip: every way with a dangling ref (planted
        every 57th way) is excluded; resolved lengths positive."""
        from go_osm_search_ray.pipelines.queries import q_osm_way_lengths

        out = q_osm_way_lengths("unused").to_pandas()
        refs = pd.read_csv(self.REFS_CSV)
        nodes = set(pd.read_csv(self.NODES_CSV)["node_id"])
        dangling = set(refs.loc[~refs["node_id"].isin(nodes), "way_id"])
        assert len(dangling) > 0
        assert not (set(out["way_id"]) & dangling)
        assert len(out) == refs["way_id"].nunique() - len(dangling)
        assert (out["length_m"] > 0).all()
