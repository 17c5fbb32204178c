"""Robustness: nulls, empty batches, and odd inputs flow through the
pipeline without raising (the tolerant-decode philosophy applied end-to-end)."""

import numpy as np
import pyarrow as pa


def test_pipeline_tolerates_nulls_and_empties(ray_session):
    import ray.data as rd

    from data_quality_ray.pipelines import quality
    from data_quality_ray.functions import codecs

    pcm = (np.sin(np.arange(8000) / 8000 * 440 * 2 * np.pi) * 20000).astype(np.int16)
    good = codecs.encode(pcm, "pcm16", 8000)
    tbl = pa.table(
        {
            "clip_id": pa.array(["a", "b", "c", "d"]),
            "bytes": pa.array([good, None, b"", good], pa.binary()),
            "sr_hz": pa.array([8000] * 4, pa.int32()),
            "dur_ms": pa.array([1000] * 4, pa.int32()),
            "codec": pa.array(["pcm16", "pcm16", "wav", "pcm16"]),
            "transcript": pa.array(["the of and to in is was for that with" * 2, None, "", "x"]),
        }
    )
    out = quality.annotate(rd.from_arrow(tbl), validate=False).to_pandas()
    assert len(out) == 4
    row = out.set_index("clip_id")
    assert bool(row.loc["a", "decode_ok"])
    assert not row.loc["b", "decode_ok"] and not row.loc["c", "decode_ok"]
    assert not row.loc["b", "keep"] and not row.loc["c", "keep"]
    assert row.loc["b", "transcript_scrubbed"] == ""  # null text → empty scrub
    assert row.loc["b", "bucket"] == "bad"
    # decodable audio + degenerate transcript: flagged, never crashes
    assert row.loc["d", "quality_score"] in (0.2, 0.5)


def test_lineage_partial_empty_block_schema_stable():
    """An empty block must yield a partial with the EXACT partial schema
    (string/int64/float64) — pandas dtype inference from an empty groupby
    used to emit all-double columns that poisoned the block union."""
    import pyarrow as pa

    from data_quality_ray.pipelines.quality import (
        _LINEAGE_PARTIAL_SCHEMA,
        _lineage_partial,
    )

    empty = _LINEAGE_PARTIAL_SCHEMA  # partial schema is also the input contract
    cols = ["lang", "split", "keep", "ppl", "quality_score", "bucket", "transcript_scrubbed"]
    batch = pa.table(
        {
            "lang": pa.array([], pa.string()),
            "split": pa.array([], pa.string()),
            "keep": pa.array([], pa.bool_()),
            "ppl": pa.array([], pa.float64()),
            "quality_score": pa.array([], pa.float64()),
            "bucket": pa.array([], pa.string()),
            "transcript_scrubbed": pa.array([], pa.string()),
        }
    )
    out = _lineage_partial(batch)
    assert out.num_rows == 0
    assert out.schema == _LINEAGE_PARTIAL_SCHEMA
    # concatenation with a real partial must not raise
    full = pa.table(
        {
            "lang": ["en"], "split": ["train"], "keep": [True], "ppl": [3.5],
            "quality_score": [1.0], "bucket": ["good"],
            "transcript_scrubbed": ["hello world"],
        }
    )
    both = pa.concat_tables([out, _lineage_partial(full)])
    assert both.num_rows == 1


def test_orphan_tmp_dirs_swept_on_retry(ray_session, clips_dir_1k, tmp_path):
    """A leftover .tmp-{pid}-* dir from a crashed attempt is removed by the
    next run of that partition (no unbounded accumulation)."""
    import glob
    import os

    from data_quality_ray.pipelines.quality import run_checkpointed

    out = str(tmp_path / "out")
    os.makedirs(out)
    stale = os.path.join(out, ".tmp-00000-deadbeef")
    os.makedirs(stale)
    with open(os.path.join(stale, "junk.parquet"), "w") as f:
        f.write("not parquet")
    summary = run_checkpointed(clips_dir_1k, out, n_partitions=1)
    assert summary["rows"] == 1000
    assert not os.path.exists(stale)
    assert glob.glob(os.path.join(out, ".tmp-*")) == []


def test_pipeline_tolerates_extra_input_columns(ray_session, clips_dir_1k, tmp_path):
    """Schema evolution: an input clip table with EXTRA columns must flow
    through the full annotation DAG unchanged (extras are not part of the
    output contract but must not break validation or any stage)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_quality_ray.pipelines import quality

    src = pq.read_table(clips_dir_1k)
    extra = src.append_column(
        "extra_meta", pa.array([f"m{i}" for i in range(src.num_rows)], pa.string())
    )
    d = str(tmp_path / "clips_extra")
    os.makedirs(d)
    pq.write_table(extra, os.path.join(d, "part-0.parquet"))
    out = quality.annotate(quality.read_clips(d))
    df = out.to_pandas()
    assert len(df) == src.num_rows
    assert "keep" in df.columns and "extra_meta" in df.columns


def test_checkpointed_run_with_empty_input_file(ray_session, tmp_path):
    """A ZERO-ROW input parquet file must flow through the checkpointed
    runner end-to-end (the empty lineage partial used to poison the block
    union with inferred-double columns)."""
    import os

    import pyarrow.parquet as pq

    from data_quality_ray.pipelines.documents import run_document_pipeline

    src = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    in_dir = str(tmp_path / "docs_in")
    os.makedirs(in_dir)
    pq.write_table(src.slice(0, 100), os.path.join(in_dir, "a.parquet"))
    pq.write_table(src.slice(0, 0), os.path.join(in_dir, "b-empty.parquet"))
    out = str(tmp_path / "out")
    summary = run_document_pipeline(in_dir, out, n_partitions=2)
    assert summary["partitions"] == 2
    assert summary["rows"] == 100


def test_document_dag_tolerates_null_and_empty_text(ray_session):
    """Null / empty text rows flow through the whole document DAG and come
    out flagged, never crashing a stage."""
    import pyarrow as pa
    import ray.data as rd

    from data_quality_ray.pipelines.documents import annotate_documents

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["hello world ok", None, ""], pa.string()),
        }
    )
    out = annotate_documents(rd.from_arrow(t)).to_pandas().sort_values("doc_id")
    assert len(out) == 3
    assert (out[out["doc_id"] > 1]["bucket"] == "bad").all()  # null/empty → flagged
    assert not out[out["doc_id"] > 1]["keep"].any()
