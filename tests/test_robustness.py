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
