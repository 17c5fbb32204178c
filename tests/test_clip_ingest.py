"""Audio content ingest: planted admit paths, idempotent replay, index layout."""

import glob
import os

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from data_quality_ray.functions import codecs
from data_quality_ray.pipelines import clip_ingest
from data_quality_ray.stages.fingerprint import FP_HOP

SR = 16_000


@pytest.fixture(scope="module")
def _ray(ray_session):
    return ray_session


def _tone(f0: float, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(3 * SR) / SR
    sig = 0.45 * np.sin(2 * np.pi * f0 * t) + 0.05 * rng.standard_normal(len(t))
    return np.clip(sig, -0.999, 0.999).astype(np.float32)


def _clips_table(specs):
    """specs: [(clip_num, pcm, codec, shift_frames)] → clip-table pa.Table."""
    ids, bufs, srs, cods = [], [], [], []
    for num, pcm, codec, shift in specs:
        if shift:
            pcm = np.concatenate([np.zeros(shift * FP_HOP, dtype=pcm.dtype), pcm])
        pcm16 = np.clip(np.round(pcm * 32767.0), -32768, 32767).astype(np.int16)
        ids.append(f"clip-{num:09d}")
        bufs.append(codecs.encode(pcm16, codec, SR))
        srs.append(SR)
        cods.append(codec)
    return pa.table(
        {
            "clip_id": pa.array(ids, pa.string()),
            "bytes": pa.array(bufs, pa.binary()),
            "sr_hz": pa.array(srs, pa.int32()),
            "codec": pa.array(cods, pa.string()),
        }
    )


def test_ingest_admit_paths_and_replay(_ray, tmp_path):
    idx = str(tmp_path / "index")
    tones = [_tone(100.0 + 60 * i, seed=i) for i in range(6)]

    # batch-001: six distinct recordings → all accepted
    b1 = rd.from_arrow(_clips_table([(i, tones[i], "pcm16", 0) for i in range(6)]))
    s1 = clip_ingest.ingest_new_clips(b1, idx, "batch-001")
    assert s1 == {
        "batch_id": "batch-001",
        "accepted": 6,
        "rejected_existing": 0,
        "rejected_in_batch": 0,
    }
    assert glob.glob(os.path.join(idx, "deltas", "batch-001", "bucket=*", "*.parquet"))

    # batch-002 plants every path: re-encoded + shifted copies of stored
    # content under NEW ids (must be caught by content, not id), two fresh
    # recordings, and an in-batch transcode dup of one fresh recording
    fresh1, fresh2 = _tone(460.0, seed=10), _tone(520.0, seed=11)
    b2 = rd.from_arrow(
        _clips_table(
            [
                (100, tones[0], "ulaw", 8),   # stored content, new codec+shift
                (101, tones[3], "alaw", 8),   # stored content
                (102, fresh1, "pcm16", 0),    # new content → accepted
                (103, fresh2, "pcm16", 0),    # new content → accepted
                (104, fresh2, "ulaw", 8),     # dup of 103 within this batch
            ]
        )
    )
    s2 = clip_ingest.ingest_new_clips(b2, idx, "batch-002")
    assert s2 == {
        "batch_id": "batch-002",
        "accepted": 2,
        "rejected_existing": 2,
        "rejected_in_batch": 1,
    }

    # replay of a committed batch returns the recorded summary verbatim
    assert clip_ingest.ingest_new_clips(b2, idx, "batch-002") == s2

    # only ACCEPTED clips' landmarks were indexed (ids 102, 103)
    stored = set()
    for p in glob.glob(os.path.join(idx, "deltas", "batch-002", "bucket=*", "*.parquet")):
        import pyarrow.parquet as pq

        stored |= set(pq.read_table(p, columns=["clip"])["clip"].to_pylist())
    assert stored == {102, 103}

    # batch-003: content equal to batch-002's accepted fresh clip → rejected
    b3 = rd.from_arrow(_clips_table([(200, fresh1, "alaw", 8)]))
    s3 = clip_ingest.ingest_new_clips(b3, idx, "batch-003")
    assert s3["accepted"] == 0 and s3["rejected_existing"] == 1


def test_ingest_crash_leaves_no_partial_commit(_ray, tmp_path):
    """A staging dir (.tmp-*) must never be read as index state."""
    idx = str(tmp_path / "index")
    b1 = rd.from_arrow(_clips_table([(0, _tone(150.0, seed=0), "pcm16", 0)]))
    clip_ingest.ingest_new_clips(b1, idx, "batch-001")
    # fake a crashed ingest: stale staging dir with landmark-like files
    stale = os.path.join(idx, ".tmp-batch-999")
    os.makedirs(os.path.join(stale, "bucket=0"), exist_ok=True)
    with open(os.path.join(stale, "bucket=0", "junk.parquet"), "w") as f:
        f.write("not parquet")
    # a new batch ingests fine (the stale dir is invisible to _delta_paths)
    b2 = rd.from_arrow(_clips_table([(1, _tone(300.0, seed=1), "pcm16", 0)]))
    s = clip_ingest.ingest_new_clips(b2, idx, "batch-002")
    assert s["accepted"] == 1


def test_ingest_empty_or_undecodable_batch_commits_empty_delta(_ray, tmp_path):
    """A batch with no fingerprintable payloads must commit (idempotently)
    without touching the matching machinery."""
    idx = str(tmp_path / "index")
    bad = pa.table(
        {
            "clip_id": pa.array(["clip-000000000"], pa.string()),
            "bytes": pa.array([b"\x00\x01garbage"], pa.binary()),
            "sr_hz": pa.array([SR], pa.int32()),
            "codec": pa.array(["wav"], pa.string()),  # undecodable payload
        }
    )
    s = clip_ingest.ingest_new_clips(rd.from_arrow(bad), idx, "batch-001")
    assert s == {
        "batch_id": "batch-001",
        "accepted": 0,
        "rejected_existing": 0,
        "rejected_in_batch": 0,
    }
    assert clip_ingest.ingest_new_clips(rd.from_arrow(bad), idx, "batch-001") == s
    # a later real batch still ingests cleanly on top of the empty delta
    b2 = rd.from_arrow(_clips_table([(1, _tone(250.0, seed=5), "pcm16", 0)]))
    assert clip_ingest.ingest_new_clips(b2, idx, "batch-002")["accepted"] == 1


def test_ingest_transitive_stored_hit_rejected(_ray, tmp_path, monkeypatch):
    """A new clip whose only strong match is a SIBLING that itself matched
    stored content must be rejected_existing too (transitive closure) —
    otherwise degraded copies of stored content leak into the index."""
    import pandas as pd

    from data_quality_ray.pipelines import multimodal_dedup

    idx = str(tmp_path / "index")
    b = rd.from_arrow(
        _clips_table([(i, _tone(120.0 + 90 * i, seed=40 + i), "pcm16", 0) for i in (1, 2, 3)])
    )

    def fake_pairs(fp, min_votes, max_hash_group, bipartite=False, n_pkeys=64):
        # stored(-1) ↔ 1 strong; 1 ↔ 2 strong; 3 matches nothing
        return pd.DataFrame(
            {"a": [-1, 1], "b": [1, 2], "dt_frames": [0, 0], "votes": [500, 500]}
        )

    monkeypatch.setattr(multimodal_dedup, "landmark_match_pairs", fake_pairs)
    s = clip_ingest.ingest_new_clips(b, idx, "batch-001")
    assert s["rejected_existing"] == 2  # clip 1 directly, clip 2 transitively
    assert s["rejected_in_batch"] == 0
    assert s["accepted"] == 1
