"""Incremental corpus ingest (pipelines/ingest.py): admit decisions vs the
DuckDB oracle, idempotent replay, crash-staging isolation."""

from __future__ import annotations

import glob
import json
import os

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _docs_ds(rows: dict):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], pa.int64()),
                "text": pa.array(rows["text"], pa.string()),
            }
        )
    )


class TestCorpusIngest:
    def test_matches_oracle(self, ray_session, tmp_path):
        from data_quality_ray.pipelines.ingest import CORPUS_INGEST_SQL, corpus_ingest

        out = corpus_ingest(SF_DIR, index_root=str(tmp_path))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')"
        )
        orc = con.execute(CORPUS_INGEST_SQL).fetchdf()
        pd.testing.assert_frame_equal(out, orc.astype(out.dtypes.to_dict()))

    def test_statuses_and_replay(self, ray_session, tmp_path):
        from data_quality_ray.pipelines.ingest import accepted_doc_ids, ingest_new_docs

        idx = str(tmp_path / "idx")
        b1 = _docs_ds({"doc_id": [1, 2, 3], "text": ["aa bb", "cc dd", "ee ff"]})
        s1 = ingest_new_docs(b1, idx, "b1")
        assert s1 == {
            "batch_id": "b1",
            "accepted": 3,
            "rejected_existing": 0,
            "rejected_in_batch": 0,
        }
        # batch 2: one index hit (whitespace-normalized match), one in-batch
        # dup pair (lowest doc_id wins), one genuinely new doc
        b2 = _docs_ds(
            {"doc_id": [10, 11, 12, 13], "text": ["  AA   bb ", "new one", "new one", "zz"]}
        )
        s2 = ingest_new_docs(b2, idx, "b2")
        assert s2 == {
            "batch_id": "b2",
            "accepted": 2,
            "rejected_existing": 1,
            "rejected_in_batch": 1,
        }
        member = accepted_doc_ids(idx).to_pandas()
        assert sorted(member["doc_id"]) == [1, 2, 3, 11, 13]  # 11 beat 12

        # replay of a committed batch: recorded summary, index unchanged
        files_before = sorted(glob.glob(os.path.join(idx, "deltas", "*", "*", "*.parquet")))
        assert ingest_new_docs(b2, idx, "b2") == s2
        assert (
            sorted(glob.glob(os.path.join(idx, "deltas", "*", "*", "*.parquet")))
            == files_before
        )

    def test_crashed_staging_is_invisible(self, ray_session, tmp_path):
        from data_quality_ray.pipelines.ingest import ingest_new_docs

        idx = str(tmp_path / "idx")
        ingest_new_docs(_docs_ds({"doc_id": [1], "text": ["aa"]}), idx, "b1")
        # a crashed ingest leaves only a staging dir — readers must ignore it
        crash = os.path.join(idx, ".tmp-crashed")
        os.makedirs(os.path.join(crash, "bucket=0"), exist_ok=True)
        with open(os.path.join(crash, "bucket=0", "junk.parquet"), "w") as f:
            f.write("not parquet")
        s = ingest_new_docs(_docs_ds({"doc_id": [2], "text": ["aa"]}), idx, "b2")
        assert s["rejected_existing"] == 1 and s["accepted"] == 0

    def test_summary_json_is_the_commit_marker(self, ray_session, tmp_path):
        from data_quality_ray.pipelines.ingest import ingest_new_docs

        idx = str(tmp_path / "idx")
        s = ingest_new_docs(_docs_ds({"doc_id": [5], "text": ["qq"]}), idx, "b9")
        with open(os.path.join(idx, "deltas", "b9", "summary.json")) as f:
            assert json.load(f) == s


class TestBloomPruning:
    def test_disjoint_batch_reads_no_index_files(self, ray_session, tmp_path):
        from data_quality_ray.pipelines import ingest as I

        idx = str(tmp_path / "idx")
        I.ingest_new_docs(
            _docs_ds({"doc_id": [1, 2, 3], "text": ["aa bb", "cc dd", "ee ff"]}),
            idx,
            "b1",
        )
        # entirely-novel batch: bloom must exclude every delta file
        novel = _docs_ds({"doc_id": [9, 10], "text": ["xx yy", "pp qq"]})
        fp = novel.map_batches(I._fingerprint_batch, batch_format="pyarrow").materialize()
        buckets = sorted(int(b) for b in fp.unique("bucket"))
        assert I._bloom_pruned_paths(idx, fp, buckets) == []
        # overlapping batch: its delta/bucket file is selected
        dup = _docs_ds({"doc_id": [9], "text": ["cc   DD"]})
        fp2 = dup.map_batches(I._fingerprint_batch, batch_format="pyarrow").materialize()
        b2 = sorted(int(b) for b in fp2.unique("bucket"))
        hit = I._bloom_pruned_paths(idx, fp2, b2)
        assert len(hit) >= 1 and all("deltas/b1/bucket=" in p for p in hit)
        # end-to-end: admit decisions unchanged by the pruning
        s = I.ingest_new_docs(dup, idx, "b2")
        assert s["rejected_existing"] == 1 and s["accepted"] == 0

    def test_sidecarless_delta_always_read(self, ray_session, tmp_path):
        import os

        from data_quality_ray.pipelines import ingest as I

        idx = str(tmp_path / "idx")
        I.ingest_new_docs(_docs_ds({"doc_id": [1], "text": ["aa bb"]}), idx, "b1")
        os.remove(os.path.join(idx, "deltas", "b1", I.BLOOM_SIDECAR))
        novel = _docs_ds({"doc_id": [2], "text": ["zz ww"]})
        fp = novel.map_batches(I._fingerprint_batch, batch_format="pyarrow").materialize()
        buckets = sorted(int(b) for b in fp.unique("bucket"))
        # pre-bloom layout: the delta's touched-bucket files must be read
        paths = I._bloom_pruned_paths(idx, fp, buckets)
        all_b1 = I._index_paths(idx, list(range(I.N_INGEST_BUCKETS)))
        want = [p for p in all_b1 if any(f"bucket={b}/" in p for b in buckets)]
        assert paths == want
        s = I.ingest_new_docs(_docs_ds({"doc_id": [3], "text": ["aa   BB"]}), idx, "b2")
        assert s["rejected_existing"] == 1
