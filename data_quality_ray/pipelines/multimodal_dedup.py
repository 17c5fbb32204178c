"""Content-level near-duplicate detection for AUDIO, IMAGE and VIDEO payloads —
the multimodal extension of the text dedup family, reusing its distributed
pair machinery (banded candidates → bucket-partitioned signature joins →
vectorized verify; pipelines/dedup.py).

- audio: clips are embedded (log-mel actor pool, stages/audio_embed.py) and
  near-dups found by cosine over LSH-bucketed candidates — catches the
  SAME recording re-encoded through a different codec (G.711 transcodes,
  ADPCM), which exact byte hashing can never match.
- image: a 64-bit average-hash (8×8 grayscale mean threshold — the classic
  public aHash) with simhash-style 4×16 banding (pigeonhole-lossless for
  hamming ≤ 3) and exact popcount verification.

- video: a video's signature is its SET of per-frame aHashes; 16-bit band
  blocking of every frame hash generates candidates and verification
  requires most frames to find a low-hamming partner (order-free, so
  re-encoded/noised copies match).

All variants plant their duplicates (re-encoded clips / noised images and
videos at id + DUP_OFFSET) since the synthetic tables are duplicate-free.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from data_quality_ray.functions import codecs
from data_quality_ray.pipelines.dedup import (
    DUP_OFFSET,
    _attach_both_sigs,
    _candidate_pairs_ds,
    _list_offsets,
    _verify_simhash_batch,
)

import functools


# ---------------------------------------------------------------------------
# Audio: codec-transcode-invariant near-dup via embeddings
# ---------------------------------------------------------------------------


def _clip_num(ids: list[str]) -> np.ndarray:
    """clip-000123 → 123 (the numeric identity the pair machinery keys on);
    derived ids without a numeric tail key by a stable hash (clip_key)."""
    from data_quality_ray.stages.fingerprint import clip_key

    return np.array([clip_key(s) for s in ids], dtype=np.int64)


_NEXT_CODEC = {"pcm16": "ulaw", "ulaw": "alaw", "alaw": "pcm16", "wav": "ulaw"}


def transcode_shift_copies(t: pa.Table, offset: int, shift_frames: int = 0) -> pa.Table:
    """Duplicate-planting helper shared by every audio near-dup/ingest demo:
    decode each clip, optionally prefix ``shift_frames`` hops of silence,
    re-encode through the NEXT G.711 codec, and re-key at id + offset.
    One definition so the planted-offset arithmetic every test calibrates
    against can never diverge between call sites."""
    from data_quality_ray.stages.fingerprint import FP_HOP, clip_key

    ids, bufs, srs, cods = [], [], [], []
    for i in range(t.num_rows):
        sr = int(t["sr_hz"][i].as_py())
        codec = t["codec"][i].as_py()
        pcm = codecs.decode_tolerant(t["bytes"][i].as_py(), codec, sr)
        if pcm is None:
            continue
        if shift_frames:
            pad = np.zeros(shift_frames * FP_HOP * sr // 16_000, dtype=pcm.dtype)
            pcm = np.concatenate([pad, pcm])
        new_codec = _NEXT_CODEC.get(codec, "ulaw")
        pcm16 = np.clip(np.round(pcm * 32767.0), -32768, 32767).astype(np.int16)
        num = clip_key(t["clip_id"][i].as_py()) + offset
        ids.append(f"clip-{num:09d}")
        bufs.append(codecs.encode(pcm16, new_codec, sr))
        srs.append(sr)
        cods.append(new_codec)
    return pa.table(
        {
            "clip_id": pa.array(ids, pa.string()),
            "bytes": pa.array(bufs, pa.binary()),
            "sr_hz": pa.array(srs, pa.int32()),
            "codec": pa.array(cods, pa.string()),
        }
    )


def clip_audio_near_dup(
    clips_dir: str, threshold: float = 0.9999, limit: int = 2000
) -> pd.DataFrame:
    """(a, b) pairs of clips whose CONTENT matches across codecs.

    The corpus is doubled with TRANSCODED copies (decode → re-encode via a
    different codec, id + DUP_OFFSET) — byte-level dedup can never match
    these; the log-mel embedding is codec-invariant (tested ≥ 0.999 cosine
    across pcm16/wav/ulaw/alaw), so cosine ≥ threshold recovers them.
    Shape: embed (actor pool) → hyperplane LSH bucket explode (key-only)
    → partitioned pair generation → partitioned embedding joins →
    vectorized cosine verify. ``limit`` bounds the demo corpus.

    Threshold calibration (measured at 400 clips + transcodes): 0.9999
    returns EXACTLY the planted transcode pairs; 0.999 adds clips whose
    synthesis recipes genuinely share spectral content — lower it to hunt
    recipe-level near-dups rather than transcodes."""
    from data_quality_ray.pipelines.embeddings import _Hyperplanes
    from data_quality_ray.stages.audio_embed import N_MELS, AudioEmbedStage
    from data_quality_ray import config

    base = rd.read_parquet(
        clips_dir, columns=["clip_id", "bytes", "sr_hz", "codec"]
    ).limit(limit)

    def transcode(t: pa.Table) -> pa.Table:
        return transcode_shift_copies(t, DUP_OFFSET)

    ds = base.union(base.map_batches(transcode, batch_format="pyarrow"))
    emb = ds.map_batches(
        AudioEmbedStage,
        batch_format="pyarrow",
        batch_size=512,
        concurrency=config.actor_pool_bounds(),
    )

    def keyed(t: pa.Table) -> pa.Table:
        keep = t.filter(t["decode_ok"].combine_chunks())
        return pa.table(
            {
                "doc_id": pa.array(_clip_num(keep["clip_id"].to_pylist()), pa.int64()),
                "embedding": keep["embedding"].combine_chunks(),
            }
        )

    keyed_ds = emb.map_batches(keyed, batch_format="pyarrow").materialize()

    hp = _Hyperplanes(N_MELS, n_tables=8, n_bits=8, seed=29)

    def to_buckets(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # a batch whose clips all failed decode
            return pa.schema(
                [("band", pa.int32()), ("band_hash", pa.uint64()), ("doc_id", pa.int64())]
            ).empty_table()
        ids = t["doc_id"].to_numpy()
        mat = np.asarray(t["embedding"].combine_chunks().flatten(), dtype=np.float64).reshape(
            len(ids), -1
        )
        codes = hp.codes(mat)  # embeddings are already L2-normalized
        n, T_ = codes.shape
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(T_, dtype=np.int32), n)),
                "band_hash": pa.array(codes.T.reshape(-1).astype(np.uint64), pa.uint64()),
                "doc_id": pa.array(np.tile(ids, T_), pa.int64()),
            }
        )

    def verify(t: pa.Table) -> pa.Table:
        schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
        if t.num_rows == 0:
            return schema.empty_table()
        A = np.asarray(t["sig_a"].combine_chunks().flatten(), dtype=np.float64).reshape(
            t.num_rows, -1
        )
        B = np.asarray(t["sig_b"].combine_chunks().flatten(), dtype=np.float64).reshape(
            t.num_rows, -1
        )
        keep = pa.array(np.einsum("ij,ij->i", A, B) >= threshold)
        return t.select(["a", "b"]).filter(keep).cast(schema)

    cand = _candidate_pairs_ds(keyed_ds.map_batches(to_buckets, batch_format="pyarrow"))
    joined = _attach_both_sigs(cand, keyed_ds, "embedding", pa.list_(pa.float32()))
    pairs = (
        joined.map_batches(verify, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    return pairs


# ---------------------------------------------------------------------------
# Image: perceptual average-hash near-dup
# ---------------------------------------------------------------------------


def ahash64(img: np.ndarray) -> np.uint64:
    """Classic 64-bit average hash: 8×8 nearest-resized grayscale, bit set
    where the pixel exceeds the mean."""
    h, w = img.shape[:2]
    ys = (np.arange(8) * h // 8).clip(0, h - 1)
    xs = (np.arange(8) * w // 8).clip(0, w - 1)
    small = img[ys][:, xs].astype(np.float64)
    gray = small @ np.array([0.299, 0.587, 0.114])
    bits = (gray > gray.mean()).reshape(-1)
    return np.uint64((bits.astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def image_near_dup(
    n_images: int = 300, max_hamming: int = 3, seed: int = 5, components: str = "driver"
) -> pd.DataFrame:
    """(doc_id, cluster_rep) over a synthetic image corpus doubled with
    mildly noised copies (id + DUP_OFFSET): aHash signature per image →
    simhash-style 4×16 banding (lossless for hamming ≤ 3) → partitioned
    signature joins → exact popcount verify → connected components."""
    from data_quality_ray.pipelines.dedup import _cluster_output
    from data_quality_ray.stages.multimodal import decode_image, synth_images

    tbl = synth_images(n_images, seed=seed)

    def decode_all(t: pa.Table) -> pa.Table:
        ids_out, sig_out = [], []
        for i in range(t.num_rows):
            try:
                img = decode_image(
                    t["bytes"][i].as_py(),
                    t["width"][i].as_py(),
                    t["height"][i].as_py(),
                    t["format"][i].as_py(),
                )
            except (NotImplementedError, ValueError):
                continue
            num = int(str(t["image_id"][i].as_py()).rsplit("-", 1)[-1])
            rng = np.random.default_rng(num + 4242)  # content-keyed noise
            noisy = np.clip(
                img.astype(np.int32) + rng.integers(-6, 7, img.shape), 0, 255
            ).astype(np.uint8)
            ids_out += [num, num + DUP_OFFSET]
            sig_out += [ahash64(img), ahash64(noisy)]
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "simhash": pa.array(sig_out, pa.uint64()),
            }
        )

    sigs = rd.from_arrow(tbl).map_batches(decode_all, batch_format="pyarrow").materialize()

    def bands(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        h = t["simhash"].to_numpy()
        band, bhash, did = [], [], []
        for b in range(4):
            chunk = (h >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            band.extend([b] * len(ids))
            bhash.extend(chunk.tolist())
            did.extend(ids.tolist())
        return pa.table(
            {
                "band": pa.array(band, pa.int32()),
                "band_hash": pa.array(bhash, pa.uint64()),
                "doc_id": pa.array(did, pa.int64()),
            }
        )

    cand = _candidate_pairs_ds(sigs.map_batches(bands, batch_format="pyarrow"))
    joined = _attach_both_sigs(cand, sigs, "simhash", pa.uint64())
    verified_ds = joined.map_batches(
        functools.partial(_verify_simhash_batch, max_hamming=max_hamming),
        batch_format="pyarrow",
    )
    return _cluster_output(sigs, verified_ds, components)


# ---------------------------------------------------------------------------
# Video: frame-hash-set near-dup
# ---------------------------------------------------------------------------


def video_near_dup(
    n_videos: int = 120,
    max_hamming: int = 3,
    min_frame_match: float = 0.75,
    seed: int = 9,
    components: str = "driver",
) -> pd.DataFrame:
    """(doc_id, cluster_rep) over a synthetic video corpus doubled with
    noised copies: a video's signature is its SET of per-frame aHashes
    (order-free, like a shingle set); candidates come from 16-bit band
    blocking of every frame hash (pigeonhole-lossless per frame for
    hamming ≤ 3); verification matches frames pairwise by popcount and
    requires ≥ ``min_frame_match`` of frames to find a ≤-hamming partner.
    Same distributed pair machinery as the text/image/audio families."""
    from data_quality_ray.pipelines.dedup import _cluster_output
    from data_quality_ray.stages.multimodal import synth_videos

    tbl = synth_videos(n_videos, seed=seed)

    def sigs_batch(t: pa.Table) -> pa.Table:
        from data_quality_ray.functions import video_codecs

        ids_out, sig_out = [], []
        for i in range(t.num_rows):
            fmt = t["format"][i].as_py()
            buf = t["bytes"][i].as_py()
            if fmt == "fake-vid8":
                nf, h, w = (t[c][i].as_py() for c in ("n_frames", "height", "width"))
                arr = np.frombuffer(buf, dtype=np.uint8).reshape(nf, h, w, 3)
            else:
                arr = video_codecs.decode_y4m(buf)
            num = int(str(t["video_id"][i].as_py()).rsplit("-", 1)[-1])
            rng = np.random.default_rng(num + 777)  # content-keyed perturbation
            noisy = np.clip(
                arr.astype(np.int32) + rng.integers(-5, 6, arr.shape), 0, 255
            ).astype(np.uint8)
            for vid, frames in ((num, arr), (num + DUP_OFFSET, noisy)):
                hs = np.unique(
                    np.array([ahash64(f) for f in frames], dtype=np.uint64)
                )
                ids_out.append(vid)
                sig_out.append(hs.tolist())
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "fh": pa.array(sig_out, pa.list_(pa.uint64())),
            }
        )

    sigs = rd.from_arrow(tbl).map_batches(sigs_batch, batch_format="pyarrow").materialize()

    def bands(t: pa.Table) -> pa.Table:
        vals, offs = _list_offsets(t["fh"])
        ids = np.repeat(t["doc_id"].to_numpy(), np.diff(offs))
        band, bhash, did = [], [], []
        for b in range(4):
            chunk = (vals >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            band.append(np.full(len(vals), b, dtype=np.int32))
            bhash.append(chunk)
            did.append(ids)
        return pa.table(
            {
                "band": pa.array(np.concatenate(band), pa.int32()),
                "band_hash": pa.array(np.concatenate(bhash), pa.uint64()),
                "doc_id": pa.array(np.concatenate(did), pa.int64()),
            }
        )

    def verify(t: pa.Table) -> pa.Table:
        schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
        if t.num_rows == 0:
            return schema.empty_table()
        va, oa = _list_offsets(t["sig_a"])
        vb, ob = _list_offsets(t["sig_b"])
        keep = np.zeros(t.num_rows, dtype=bool)
        for i in range(t.num_rows):
            A = va[oa[i] : oa[i + 1]]
            B = vb[ob[i] : ob[i + 1]]
            x = A[:, None] ^ B[None, :]
            pop = np.unpackbits(
                x.view(np.uint8).reshape(x.size, 8), axis=1
            ).sum(axis=1).reshape(x.shape)
            hit = pop <= max_hamming
            # SYMMETRIC coverage: most of a's frames must match in b AND
            # vice versa — a short clip that is a subset of an unrelated
            # longer video must NOT pair
            cov_a = hit.any(axis=1).mean()
            cov_b = hit.any(axis=0).mean()
            keep[i] = min(cov_a, cov_b) >= min_frame_match
        return t.select(["a", "b"]).filter(pa.array(keep)).cast(schema)

    cand = _candidate_pairs_ds(sigs.map_batches(bands, batch_format="pyarrow"))
    joined = _attach_both_sigs(cand, sigs, "fh", pa.list_(pa.uint64()))
    verified_ds = joined.map_batches(verify, batch_format="pyarrow")
    return _cluster_output(sigs, verified_ds, components)


# ---------------------------------------------------------------------------
# Audio: constellation-fingerprint content matching (Wang 2003 landmarks)
# ---------------------------------------------------------------------------


def landmark_match_pairs(
    fp: "rd.Dataset",
    min_votes: int,
    max_hash_group: int,
    bipartite: bool = False,
    n_pkeys: int = 64,
) -> pd.DataFrame:
    """Shared offset-voting kernel over exploded landmark rows
    (clip:int64, hash:int64, t:int32) → verified (a, b, dt_frames, votes).

    Used by ``clip_fingerprint_matches`` (all-pairs within one corpus) and
    ``pipelines/clip_ingest`` (``bipartite=True``: stored rows carry
    NEGATED ids and pairs need ≥ 1 non-negative/new endpoint). Both
    shuffles group by a bounded partition key with ALL group handling
    vectorized inside: rows sorted by hash, group boundaries by diff,
    index pairs generated per group SIZE — a per-hash ``map_groups`` at
    ~10^6 distinct landmarks was measured at > 300 s where this form
    takes seconds. Hub hashes shared by more than ``max_hash_group``
    clips discriminate nothing and are dropped (stop-word treatment).
    """

    def add_pkey(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column(
            "pkey", pc.bit_wise_and(t["hash"], pa.scalar(n_pkeys - 1, pa.int64()))
        )

    def emit_pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "a": pd.Series(dtype=np.int64),
                "b": pd.Series(dtype=np.int64),
                "dt": pd.Series(dtype=np.int32),
                "w": pd.Series(dtype=np.int64),
                "pk2": pd.Series(dtype=np.int64),
            }
        )
        h = g["hash"].to_numpy()
        c = g["clip"].to_numpy()
        t = g["t"].to_numpy()
        order = np.lexsort((c, h))
        h, c, t = h[order], c[order], t[order]
        starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
        lens = np.diff(np.r_[starts, len(h)])
        aa, bb, dts = [], [], []
        for s in range(2, max_hash_group + 1):
            gs = starts[lens == s]
            if len(gs) == 0:
                continue
            ii, jj = np.triu_indices(s, k=1)
            ia = (gs[:, None] + ii[None, :]).ravel()
            ib = (gs[:, None] + jj[None, :]).ravel()
            if bipartite:  # ≥ 1 new (non-negative) endpoint per pair
                keep = (c[ia] >= 0) | (c[ib] >= 0)
                ia, ib = ia[keep], ib[keep]
            aa.append(c[ia])
            bb.append(c[ib])
            dts.append(t[ib] - t[ia])
        if not aa:
            return empty
        a = np.concatenate(aa)
        b = np.concatenate(bb)
        dt = np.concatenate(dts).astype(np.int32)
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        dt = np.where(swap, -dt, dt).astype(np.int32)
        out = (
            pd.DataFrame({"a": a2, "b": b2, "dt": dt})
            .groupby(["a", "b", "dt"], as_index=False, sort=False)
            .size()
            .rename(columns={"size": "w"})
        )  # map-side combine before the pair shuffle
        out["w"] = out["w"].astype(np.int64)
        out["pk2"] = ((out["a"] * 1_000_003 + out["b"]) % n_pkeys).astype(np.int64)
        return out

    def score_part(g: pd.DataFrame) -> pd.DataFrame:
        """Offset-histogram scoring, vectorized: sum votes by (a, b, dt),
        keep each pair's best dt (ties → smallest) if it clears min_votes."""
        s = g.groupby(["a", "b", "dt"], as_index=False)["w"].sum()
        s = s.sort_values(["a", "b", "w", "dt"], ascending=[True, True, False, True])
        best = s.drop_duplicates(["a", "b"], keep="first")
        best = best[best["w"] >= min_votes]
        return pd.DataFrame(
            {
                "a": best["a"].to_numpy(np.int64),
                "b": best["b"].to_numpy(np.int64),
                "dt_frames": best["dt"].to_numpy(np.int32),
                "votes": best["w"].to_numpy(np.int64),
            }
        )

    out = (
        fp.map_batches(add_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(emit_pairs_part, batch_format="pandas")
        .groupby("pk2")
        .map_groups(score_part, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame(
            {
                "a": pd.Series(dtype=np.int64),
                "b": pd.Series(dtype=np.int64),
                "dt_frames": pd.Series(dtype=np.int32),
                "votes": pd.Series(dtype=np.int64),
            }
        )
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def clip_fingerprint_matches(
    clips_dir: str,
    limit: int = 600,
    min_votes: "int | None" = None,
    max_hash_group: "int | None" = None,
    shift_frames: int = 8,
) -> pd.DataFrame:
    """(a, b, dt_frames, votes) content matches via landmark fingerprints.

    The third audio-identity signal next to byte hashing and log-mel
    embeddings: spectral-peak landmark hashes (stages/fingerprint.py) voted
    by ALIGNMENT — a pair matches when many shared hashes agree on one time
    offset. Catches a copy that is transcoded AND padded with leading
    silence (which shifts every frame time, so embedding cosine still
    matches but byte hashing cannot see the copy at all), and reports the
    recovered alignment ``dt_frames``.

    Planted corpus (the synthetic table is duplicate-free): each base clip
    is re-encoded through the next G.711 codec and prefixed with
    ``shift_frames`` hops of silence, at id + DUP_OFFSET
    (``transcode_shift_copies``). A planted copy must therefore match its
    source at exactly dt = +shift_frames.

    Vote thresholds default to the calibration-tested constants in
    stages/fingerprint.py (shared with the clip_ingest admit gate).

    Note on precision at sf: the synthetic corpus draws f0 from a 310 Hz
    interval, so two UNRELATED clips whose tones land in the same FFT bin
    are spectrally identical at the analysis resolution and can genuinely
    match — those are reported too (they ARE same-content by this signal).
    The planted-pair tests use well-separated tones to pin exact behavior.
    """
    from data_quality_ray.stages.fingerprint import (
        FP_MAX_HASH_GROUP,
        FP_MIN_VOTES,
        fingerprint_batch,
    )

    base = rd.read_parquet(
        clips_dir, columns=["clip_id", "bytes", "sr_hz", "codec"]
    ).limit(limit)

    def plant(t: pa.Table) -> pa.Table:
        return transcode_shift_copies(t, DUP_OFFSET, shift_frames)

    ds = base.union(base.map_batches(plant, batch_format="pyarrow"))
    fp = ds.map_batches(fingerprint_batch, batch_format="pyarrow")
    return landmark_match_pairs(
        fp,
        FP_MIN_VOTES if min_votes is None else min_votes,
        FP_MAX_HASH_GROUP if max_hash_group is None else max_hash_group,
    )


def clip_multimodal_consensus(
    clips_dir: str,
    limit: int = 600,
    shift_frames: int = 8,
    text_threshold: float = 0.5,
) -> pd.DataFrame:
    """Multimodal dedup consensus: every audio-fingerprint content match is
    CONFIRMED or CONTRADICTED by transcript evidence — the two independent
    identity signals a real clip corpus carries (a re-uploaded recording
    keeps its audio; a re-transcribed or re-captioned copy changes only
    the text). Catches what either modality alone mislabels: same audio +
    same transcript = a true duplicate ("both"); same audio + rewritten
    transcript = re-captioned content ("audio_only", keep for text
    diversity but dedup for audio training).

    Planted corpus (the synthetic table is duplicate-free): each base clip
    gets a transcode+silence-shift copy at id + DUP_OFFSET; EVEN source
    ids keep the transcript verbatim (expected verdict "both"), ODD ids
    get a reworded transcript (expected "audio_only") — parity-pinned in
    tests.

    Scale shape: the audio side is the shared bounded-shard landmark
    kernel (:func:`landmark_match_pairs`); the text evidence is
    pair-BOUNDED — matched ids broadcast once, ONE distributed pass
    collects only those clips' 512-byte minhash signatures + an
    md5 fingerprint (never transcripts, never unmatched rows), and the
    driver-side jaccard estimate is an aligned signature compare (the
    clip_ingest "bounded by match pairs" contract)."""
    import hashlib

    from data_quality_ray.functions import text as T
    from data_quality_ray.pipelines.dedup import _get_minhasher, _shingle_hashes
    from data_quality_ray.stages.fingerprint import (
        FP_MAX_HASH_GROUP,
        FP_MIN_VOTES,
        clip_key,
        fingerprint_batch,
    )

    base = rd.read_parquet(
        clips_dir, columns=["clip_id", "bytes", "sr_hz", "codec", "transcript"]
    ).limit(limit)

    def plant(t: pa.Table) -> pa.Table:
        audio = transcode_shift_copies(
            t.select(["clip_id", "bytes", "sr_hz", "codec"]), DUP_OFFSET, shift_frames
        )
        # re-attach transcripts by source num (copies may drop undecodable
        # rows, so map rather than assume positional alignment)
        src_tx = {
            clip_key(c): x
            for c, x in zip(t["clip_id"].to_pylist(), t["transcript"].to_pylist())
        }
        tx = []
        for cid in audio["clip_id"].to_pylist():
            num = clip_key(cid) - DUP_OFFSET
            orig = src_tx[num] or ""
            if num % 2:  # odd source: reworded transcript (audio-only copy)
                tx.append("reworded " + " ".join(reversed(orig.split())) + f" variant {num}")
            else:  # even source: verbatim transcript (true duplicate)
                tx.append(orig)
        return audio.append_column("transcript", pa.array(tx, pa.string()))

    ds = base.union(base.map_batches(plant, batch_format="pyarrow"))

    pairs = landmark_match_pairs(
        ds.map_batches(fingerprint_batch, batch_format="pyarrow"),
        FP_MIN_VOTES,
        FP_MAX_HASH_GROUP,
    )
    if len(pairs) == 0:
        return pairs.assign(
            text_jaccard_est=pd.Series(dtype=np.float64),
            text_exact=pd.Series(dtype=bool),
            verdict=pd.Series(dtype=str),
        )

    needed = ray.put(frozenset(map(int, np.union1d(pairs["a"], pairs["b"]))))
    mh = _get_minhasher(64)

    def text_evidence(t: pa.Table) -> pa.Table:
        need = ray.get(needed)
        nums, sigs, md5s = [], [], []
        for cid, x in zip(t["clip_id"].to_pylist(), t["transcript"].to_pylist()):
            num = clip_key(cid)
            if num not in need:
                continue
            norm = T.normalize_for_fingerprint(x or "")
            nums.append(num)
            sigs.append(mh.signature(_shingle_hashes(x or "")).tolist())
            md5s.append(hashlib.md5(norm.encode()).hexdigest())
        return pa.table(
            {
                "num": pa.array(nums, pa.int64()),
                "sig": pa.array(sigs, pa.list_(pa.uint64())),
                "md5": pa.array(md5s, pa.string()),
            }
        )

    ev = ds.map_batches(text_evidence, batch_format="pyarrow").to_pandas()
    sig_of = {int(n): np.asarray(s, dtype=np.uint64) for n, s in zip(ev["num"], ev["sig"])}
    md5_of = dict(zip(ev["num"].astype(int), ev["md5"]))

    est = np.array(
        [
            float(np.mean(sig_of[int(a)] == sig_of[int(b)]))
            for a, b in zip(pairs["a"], pairs["b"])
        ]
    )
    exact = np.array(
        [md5_of[int(a)] == md5_of[int(b)] for a, b in zip(pairs["a"], pairs["b"])]
    )
    out = pairs.assign(
        text_jaccard_est=est,
        text_exact=exact,
        verdict=np.where(exact | (est >= text_threshold), "both", "audio_only"),
    )
    return out.sort_values(["a", "b"]).reset_index(drop=True)
