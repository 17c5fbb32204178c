"""Decontamination (pipelines/decontam.py) and repetition-stats semantics
beyond the oracle-parity check in test_conformance.py."""

from __future__ import annotations

import pyarrow as pa

SF_DIR = "/root/testdata/sf0.001"


class TestDecontaminate:
    def test_benchmark_sources_are_flagged(self, ray_session):
        """Every benchmark-contributing doc (doc_id % BENCH_MOD == 0 with a
        full-length slice) contains its own slice → must appear in the
        output with n_hits ≥ the slice's gram count."""
        from data_quality_ray.pipelines.decontam import (
            BENCH_MOD,
            ITEM_LEN,
            ITEM_OFF,
            NGRAM_N,
            _norm_tokens,
            doc_decontaminate,
        )
        import pyarrow.parquet as pq

        out = doc_decontaminate(SF_DIR)
        flagged = dict(zip(out["doc_id"], out["n_hits"]))
        docs = pq.read_table(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas()
        n_sources = 0
        for _, r in docs.iterrows():
            if int(r["doc_id"]) % BENCH_MOD != 0:
                continue
            sl = _norm_tokens(r["text"])[ITEM_OFF : ITEM_OFF + ITEM_LEN]
            if len(sl) < NGRAM_N:
                continue
            n_sources += 1
            expect = len(sl) - NGRAM_N + 1
            assert flagged.get(int(r["doc_id"]), 0) >= expect
        assert n_sources > 0  # fixture sanity: the benchmark is non-empty

    def test_planted_contamination(self, ray_session, tmp_path):
        """A doc embedding a benchmark slice mid-text is flagged; a disjoint
        doc is not."""
        import ray.data as rd

        from data_quality_ray.pipelines import decontam as D

        bench_text = " ".join(f"tok{i}" for i in range(30))  # doc_id 0 → benchmark
        slice_txt = " ".join(
            f"tok{i}" for i in range(D.ITEM_OFF, D.ITEM_OFF + D.ITEM_LEN)
        )
        contaminated = "aa bb " + slice_txt + " cc dd"
        clean = " ".join(f"zz{i}" for i in range(40))
        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array([bench_text, contaminated, clean], pa.string()),
            }
        )
        p = tmp_path / "documents.parquet"
        import pyarrow.parquet as pq

        pq.write_table(t, p)
        out = D.doc_decontaminate(str(tmp_path))
        got = dict(zip(out["doc_id"], out["n_hits"]))
        assert 1 in got and got[1] == D.ITEM_LEN - D.NGRAM_N + 1
        assert 2 not in got


class TestRepetitionStats:
    def test_counts_on_known_doc(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from data_quality_ray.pipelines.documents import doc_repetition_stats

        # "a b a b c" → 4 2-grams, 'a b' twice → 1 dup; top token 'a'/'b' ×2
        t = pa.table(
            {
                "doc_id": pa.array([7], pa.int64()),
                "text": pa.array(["A b a B c"], pa.string()),
            }
        )
        pq.write_table(t, tmp_path / "documents.parquet")
        out = doc_repetition_stats(str(tmp_path))
        r = out.iloc[0]
        assert (
            r["n_tokens"],
            r["n_2grams"],
            r["dup_2grams"],
            r["top_token_n"],
        ) == (5, 4, 1, 2)
