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
