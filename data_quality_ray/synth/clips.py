"""Deterministic synthetic audio-clip + transcript table (FIXTURES.md §2).

Schema = BASELINE.json input_hint:
    clip_id:string, bytes:binary, sr_hz:int32, dur_ms:int32, codec:string,
    transcript:string

Every row is a pure function of ``(seed, row_index)`` — generation is
embarrassingly parallel and identical whether produced by the local
generator or the Ray Data pipeline, at any block split. Planted defect
classes (FIXTURES.md §2 table) are assigned per-row; the class tag is
written to a *sidecar* table (``meta.parquet``) that the pipeline never
reads — pipeline input is exactly the 6-column clip table.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from data_quality_ray.functions import codecs
from data_quality_ray.functions.hashing import u64_seed
from data_quality_ray.synth import corpora

SEED = 42
CHARS_PER_SEC = 25.0  # speech-rate link used by the length-mismatch rule

CLIP_SF_ROWS: dict[str, int] = {"sf0.001": 1_000, "sf0.01": 10_000, "sf0.1": 100_000}

# (class name, cumulative probability edge); clean is the remainder
_CLASSES = [
    ("wrong_lang", 0.05),
    ("gibberish", 0.10),
    ("repetitive", 0.15),
    ("symbol_heavy", 0.20),
    ("length_mismatch", 0.25),
    ("pii", 0.33),
    ("toxic", 0.38),
    ("corrupt_audio", 0.45),
    ("clean", 1.01),
]

_SRS = np.array([8000, 16000], dtype=np.int32)

CLIP_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("bytes", pa.binary()),
        ("sr_hz", pa.int32()),
        ("dur_ms", pa.int32()),
        ("codec", pa.string()),
        ("transcript", pa.string()),
    ]
)


def _row_class(u: float) -> str:
    for name, edge in _CLASSES:
        if u < edge:
            return name
    return "clean"


def _pick_lang(rng) -> str:
    r = rng.random()
    acc = 0.0
    for lang, w in corpora.LANG_WEIGHTS.items():
        acc += w
        if r < acc:
            return lang
    return "en"


def _sentence(rng, words: list[str], target_chars: int) -> str:
    out: list[str] = []
    n = 0
    while n < target_chars:
        w = words[int(rng.integers(len(words)))]
        out.append(w)
        n += len(w) + 1
    return " ".join(out)


def clean_pcm(seed_parts: tuple, n_samples: int, sr_hz: int) -> np.ndarray:
    """Reference float PCM for a row (pre-encode). Pure function of seed."""
    rng = np.random.default_rng(u64_seed("audio", *seed_parts))
    t = np.arange(n_samples, dtype=np.float64) / sr_hz
    f0 = float(rng.uniform(90.0, 400.0))
    sig = (
        0.45 * np.sin(2 * np.pi * f0 * t)
        + 0.18 * np.sin(2 * np.pi * 2.1 * f0 * t + rng.uniform(0, 6.28))
        + 0.05 * rng.standard_normal(n_samples)
    )
    return np.clip(sig, -0.999, 0.999).astype(np.float32)


def make_row(seed: int, i: int) -> dict:
    """Generate one clip row (+ sidecar fields ``_class``, ``_lang``)."""
    rng = np.random.default_rng(u64_seed("row", seed, i))
    cls = _row_class(rng.random())
    lang = _pick_lang(rng)
    sr_hz = int(_SRS[int(rng.integers(len(_SRS)))])
    codec = codecs.CODECS[int(rng.integers(len(codecs.CODECS)))]
    dur_ms = int(rng.integers(400, 1601))
    n_samples = dur_ms * sr_hz // 1000
    target_chars = max(8, int(dur_ms / 1000.0 * CHARS_PER_SEC))

    words = corpora.WORDS[lang]
    if cls == "wrong_lang":
        text = _sentence(rng, corpora.JUNK_SYLLABLES, target_chars)
    elif cls == "gibberish":
        a = corpora.GIBBERISH_ALPHABET
        text = "".join(a[int(j)] for j in rng.integers(0, len(a), target_chars))
    elif cls == "repetitive":
        few = [words[int(rng.integers(len(words)))] for _ in range(2)]
        unit = " ".join(few)
        reps = max(4, target_chars // (len(unit) + 1))
        text = " ".join([unit] * reps)
    elif cls == "symbol_heavy":
        base = _sentence(rng, words, target_chars)
        syms = "@#$%^&*()!?%+=/\\~"
        chars = list(base)
        for j in range(0, len(chars), 2):
            chars[j] = syms[int(rng.integers(len(syms)))]
        text = "".join(chars)
    elif cls == "length_mismatch":
        factor = 6.0 if rng.random() < 0.5 else 0.05
        text = _sentence(rng, words, max(2, int(target_chars * factor)))
    elif cls == "pii":
        text = _sentence(rng, words, target_chars)
        kind = int(rng.integers(3))
        pii = (
            corpora.make_email(rng)
            if kind == 0
            else corpora.make_phone(rng) if kind == 1 else corpora.make_id(rng)
        )
        toks = text.split(" ")
        pos = int(rng.integers(len(toks) + 1))
        toks.insert(pos, pii)
        text = " ".join(toks)
    elif cls == "toxic":
        text = _sentence(rng, words, target_chars)
        tox = corpora.TOXIC_LEXICON[int(rng.integers(len(corpora.TOXIC_LEXICON)))]
        toks = text.split(" ")
        pos = int(rng.integers(len(toks) + 1))
        toks.insert(pos, tox)
        text = " ".join(toks)
    else:  # clean / corrupt_audio
        text = _sentence(rng, words, target_chars)

    pcm_f = clean_pcm((seed, i), n_samples, sr_hz)
    pcm = (pcm_f * 32767.0).astype(np.int16)
    buf = codecs.encode(pcm, codec, sr_hz)
    if cls == "corrupt_audio":
        mode = int(rng.integers(3))
        if mode == 0:
            buf = buf[: max(1, int(rng.integers(1, 8)))]  # truncate to garbage
        elif mode == 1:
            buf = b""
        else:
            buf = os.urandom(0) + bytes(rng.integers(0, 256, 13).astype(np.uint8))
        if codec == "pcm16" and len(buf) % 2 == 0:
            buf = buf[:-1] if len(buf) > 1 else b"\x00"
        if codec in ("ulaw", "alaw") and len(buf) > 0:
            buf = b""  # raw G.711 has no framing to violate; empty = corrupt
    return {
        "clip_id": f"clip-{i:09d}",
        "bytes": buf,
        "sr_hz": sr_hz,
        "dur_ms": dur_ms,
        "codec": codec,
        "transcript": text,
        "_class": cls,
        "_lang": lang,
    }


def make_batch(seed: int, indices: np.ndarray) -> pa.Table:
    rows = [make_row(seed, int(i)) for i in indices]
    cols = {k: [r[k] for r in rows] for k in rows[0]}
    return pa.table(
        {
            "clip_id": pa.array(cols["clip_id"], pa.string()),
            "bytes": pa.array(cols["bytes"], pa.binary()),
            "sr_hz": pa.array(cols["sr_hz"], pa.int32()),
            "dur_ms": pa.array(cols["dur_ms"], pa.int32()),
            "codec": pa.array(cols["codec"], pa.string()),
            "transcript": pa.array(cols["transcript"], pa.string()),
            "_class": pa.array(cols["_class"], pa.string()),
            "_lang": pa.array(cols["_lang"], pa.string()),
        }
    )


def generate_clips_local(n: int, seed: int = SEED) -> pa.Table:
    """Single-process generation (tests / oracle fixtures)."""
    return make_batch(seed, np.arange(n))


def generate_clips(out_dir: str, n: int, seed: int = SEED, *, use_ray: bool = True) -> None:
    """Distributed generation → partitioned parquet under ``out_dir``.

    Layout: ``out_dir/clips/part-*.parquet`` (6 input columns) and
    ``out_dir/meta/part-*.parquet`` (clip_id + sidecar tags). Atomic-ish:
    a ``_DONE`` marker is written last; :func:`ensure_clips` treats its
    absence as "regenerate".
    """
    clips_dir = os.path.join(out_dir, "clips")
    meta_dir = os.path.join(out_dir, "meta")
    os.makedirs(clips_dir, exist_ok=True)
    os.makedirs(meta_dir, exist_ok=True)

    if use_ray:
        import ray.data as rd

        def gen(batch: pa.Table) -> pa.Table:
            return make_batch(seed, batch["id"].to_numpy())

        nblocks = max(1, min(256, n // 2000))
        full = rd.range(n, override_num_blocks=nblocks).map_batches(
            gen, batch_format="pyarrow", batch_size=4096
        )
        full.write_parquet(clips_dir)
        # rewrite: split sidecar out of the written files (single pass, small)
        _split_sidecar(clips_dir, meta_dir)
    else:
        # shard even the local path: one ~2500-row file per shard so the
        # reader gets block-level parallelism (one file = one read task)
        tbl = generate_clips_local(n, seed)
        shard = 2500
        for si, off in enumerate(range(0, n, shard)):
            sl = tbl.slice(off, shard)
            pq.write_table(
                sl.select([c for c in sl.column_names if not c.startswith("_")]),
                os.path.join(clips_dir, f"part-{si:05d}.parquet"),
            )
            pq.write_table(
                sl.select(["clip_id", "_class", "_lang"]),
                os.path.join(meta_dir, f"part-{si:05d}.parquet"),
            )
    with open(os.path.join(out_dir, "_DONE"), "w") as f:
        f.write(f"n={n} seed={seed}\n")


def _split_sidecar(clips_dir: str, meta_dir: str) -> None:
    for name in sorted(os.listdir(clips_dir)):
        if not name.endswith(".parquet"):
            continue
        path = os.path.join(clips_dir, name)
        t = pq.read_table(path)
        if "_class" not in t.column_names:
            continue
        pq.write_table(t.select(["clip_id", "_class", "_lang"]), os.path.join(meta_dir, name))
        pq.write_table(t.select([c for c in t.column_names if not c.startswith("_")]), path)


def clips_path(name: str, root: str = "/tmp/graft_clips") -> str:
    return os.path.join(root, name)


def clip_sf_name(sf_dir: str) -> str:
    """Map an sf dir to a known clip scale name; warn (stderr) + fall back
    to sf0.01 for unknown names rather than silently mislabeling scales."""
    import sys

    name = os.path.basename(os.path.normpath(sf_dir))
    if name in CLIP_SF_ROWS:
        return name
    print(
        f"[data_quality_ray] unknown scale {name!r}; using clip table sf0.01",
        file=sys.stderr,
    )
    return "sf0.01"


def ensure_clips(name: str, root: str = "/tmp/graft_clips", *, use_ray: bool = True) -> str:
    """Generate-once cache of the clip table for a scale-factor name.

    Concurrency-safe: generation happens in a private tmp dir which is
    atomically renamed into place; if another process wins the rename race,
    its (identical, deterministic) output is used and ours is discarded.
    Returns the directory containing ``clips/`` + ``meta/``.
    """
    import shutil
    import uuid as _uuid

    n = CLIP_SF_ROWS[name]
    out = clips_path(name, root)
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    import ray

    distributed = use_ray and n > 5_000 and ray.is_initialized()
    tmp = f"{out}.tmp-{os.getpid()}-{_uuid.uuid4().hex[:6]}"
    generate_clips(tmp, n, SEED, use_ray=distributed)
    os.makedirs(root, exist_ok=True)
    try:
        os.rename(tmp, out)
    except OSError:
        if os.path.exists(os.path.join(out, "_DONE")):
            # another process committed first; its content is identical
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            # stale partial dir (earlier crash): move it aside, then try to
            # commit ours; if a concurrent committer beat us to it, theirs is
            # identical — keep it and discard ours (never rmtree a dir that
            # might have just gained _DONE)
            stale = f"{out}.stale-{os.getpid()}-{_uuid.uuid4().hex[:6]}"
            try:
                os.rename(out, stale)
            except OSError:
                pass
            else:
                shutil.rmtree(stale, ignore_errors=True)
            try:
                os.rename(tmp, out)
            except OSError:
                if os.path.exists(os.path.join(out, "_DONE")):
                    shutil.rmtree(tmp, ignore_errors=True)
                else:
                    raise
    return out
