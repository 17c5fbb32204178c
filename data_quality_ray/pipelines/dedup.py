"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Corpus-grain dedup the reference never needed (it has no identity notion
beyond file names, SURVEY.md §2.8) but a 100 TB training-data pipeline does.
All variants follow the same scale shape:

  signature per row (map_batches, vectorized numpy)
    → explode to (band, band_hash, id) rows
    → groupby band bucket (uniform key by construction, no salting needed)
    → candidate pairs per bucket (map_groups) → distributed pair dedupe
    → verify: two bucket-partitioned joins re-attach both endpoints'
      signatures to each pair, then a vectorized batch kernel compares
      them — NO O(corpus) driver state, no per-pair Python loop
    → connected components → representative = min id per cluster

Only the *verified pair list* reaches the driver (the CC input — orders of
magnitude smaller than the corpus; the distributed alternative is
``_cc_labels_distributed``, iterative min-label propagation with groupby);
final per-doc labels are produced by broadcasting the small pair-graph
label map over the corpus stream. The testdata documents have no
duplicates, so the dedup entries plant them: each corpus is doubled with
(exact or perturbed) copies at ``doc_id + DUP_OFFSET``.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from data_quality_ray.functions import text as T
from data_quality_ray.functions.hashing import stable_u64

DUP_OFFSET = 1_000_000

def _docs(sf_dir: str) -> "rd.Dataset":
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])


def _doubled(sf_dir: str, perturb: bool) -> "rd.Dataset":
    """documents ∪ copies at doc_id+DUP_OFFSET (optionally with the last two
    tokens dropped — near-dup, not exact-dup)."""

    def copy(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy() + DUP_OFFSET
        texts = t["text"].to_pylist()
        if perturb:
            texts = [" ".join(x.split(" ")[:-2]) for x in texts]
        return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})

    base = _docs(sf_dir)
    return base.union(base.map_batches(copy, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# Exact dedup: hash-partition + per-group min id (SQL-checkable)
# ---------------------------------------------------------------------------


def exact_dedup(sf_dir: str) -> pd.DataFrame:
    """Exact dedup of the doubled corpus on normalized-text fingerprint.

    Ray shape: fingerprint in map_batches → map-side per-batch (fingerprint,
    min doc_id) combine → ``groupby(fingerprint).aggregate(Min(doc_id))``.
    The shuffle-side reduce is Ray's vectorized Min aggregate — NOT a
    per-distinct-hash ``map_groups`` UDF (one Python call per unique
    document; the CLAUDE.md measured >300 s scale-killer). The map-side
    combine also shrinks the shuffle to one row per (batch, fingerprint).
    """
    import hashlib

    from ray.data.aggregate import Min as _Min

    def fp_min(t: pa.Table) -> pa.Table:
        h = [
            hashlib.md5(T.normalize_for_fingerprint(x).encode()).hexdigest()
            for x in t["text"].to_pylist()
        ]
        part = (
            pd.DataFrame({"fingerprint": h, "doc_id": t["doc_id"].to_numpy()})
            .groupby("fingerprint", as_index=False)["doc_id"]
            .min()
        )
        return pa.table(
            {
                "doc_id": pa.array(part["doc_id"].to_numpy(), pa.int64()),
                "fingerprint": pa.array(part["fingerprint"], pa.string()),
            }
        )

    out = (
        _doubled(sf_dir, perturb=False)
        .map_batches(fp_min, batch_format="pyarrow")
        .groupby("fingerprint")
        .aggregate(_Min("doc_id", alias_name="doc_id"))
        .to_pandas()
    )
    return (
        out[["doc_id", "fingerprint"]].sort_values("doc_id").reset_index(drop=True)
    )


EXACT_DEDUP_SQL = rf"""
WITH doubled AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {DUP_OFFSET}, text FROM documents
)
SELECT min(doc_id) AS doc_id,
       md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint
FROM doubled
GROUP BY 2
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# MinHash signatures + banded LSH
# ---------------------------------------------------------------------------


_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)
_MIX3 = np.uint64(0x165667B19E3779F9)


from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=8)
def _shingle_mults(k: int) -> "tuple[np.uint64, ...]":
    """Per-position shingle-mix multipliers (first three match the
    historical k=3 mix) — cached per k, not rebuilt per document."""
    with np.errstate(over="ignore"):
        return tuple(
            [_MIX1, _MIX2, _MIX3]
            + [_MIX1 * np.uint64(2 * j + 1) for j in range(3, k)]
        )


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Hashes of word k-gram shingles (uint64), vectorized.

    Tokens are hashed in one vectorized call (pandas siphash, fixed key —
    deterministic across processes); k-gram shingle hashes are an arithmetic
    mix of the k token hashes (no per-shingle string building / digesting).
    """
    toks = T.ws_tokens(T.normalize_for_fingerprint(text))
    if not toks:
        return np.array([np.uint64(0)], dtype=np.uint64)
    th = pd.util.hash_array(np.asarray(toks, dtype=object), categorize=False)
    if len(toks) < k:
        h = np.uint64(0)
        with np.errstate(over="ignore"):
            for v in th:
                h = h * _MIX1 ^ np.uint64(v)
        return np.array([h], dtype=np.uint64)
    mults = _shingle_mults(k)
    n_sh = len(toks) - k + 1
    with np.errstate(over="ignore"):
        sh = th[:n_sh] * mults[0]
        for j in range(1, k):
            sh = sh ^ th[j : j + n_sh] * mults[j]
    return np.unique(sh)


class MinHasher:
    """Minhash via a multiply-add-mod-2^64 permutation family (odd ``a``),
    fully vectorized with native uint64 wraparound — one (n_perm × n_shingle)
    broadcast multiply per document."""

    def __init__(self, n_perm: int = 128, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = (rng.integers(1, 1 << 63, n_perm, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
        self.b = rng.integers(0, 1 << 63, n_perm, dtype=np.uint64)
        self.n_perm = n_perm

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            vals = self.a[:, None] * shingles[None, :] + self.b[:, None]
        return np.min(vals, axis=1)


from functools import lru_cache


@lru_cache(maxsize=4)
def _get_minhasher(n_perm: int) -> MinHasher:
    return MinHasher(n_perm)


def minhash_signatures(ds: "rd.Dataset", n_perm: int = 128) -> "rd.Dataset":
    """(doc_id, sig list<uint64>) per document.

    Runs as stateless TASKS with the (tiny, deterministic) permutation table
    cached per worker process — an actor pool here pays pool-startup latency
    for state that costs microseconds to build; the actor-pool pattern is
    reserved for stages with genuinely heavy state (langid/perplexity
    models, stages/langid.py).
    """

    def sig_batch(t: pa.Table) -> pa.Table:
        mh = _get_minhasher(n_perm)
        sigs = [mh.signature(_shingle_hashes(x)).tolist() for x in t["text"].to_pylist()]
        return pa.table(
            {"doc_id": t["doc_id"], "sig": pa.array(sigs, pa.list_(pa.uint64()))}
        )

    return ds.map_batches(sig_batch, batch_format="pyarrow", batch_size=1024)


def _band_rows(t: pa.Table, n_bands: int, rows_per_band: int) -> pa.Table:
    """Explode signatures into (band, band_hash, doc_id) rows — vectorized:
    one (n_docs × n_bands × rows_per_band) reshape + arithmetic fold."""
    ids = t["doc_id"].to_numpy()
    n = len(ids)
    flat = t["sig"].combine_chunks()
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    sig_mat = np.asarray(flat.values, dtype=np.uint64).reshape(n, n_bands, rows_per_band)
    with np.errstate(over="ignore"):
        h = np.zeros((n, n_bands), dtype=np.uint64)
        for r in range(rows_per_band):
            h = h * _MIX1 ^ sig_mat[:, :, r]
    return pa.table(
        {
            "band": pa.array(np.tile(np.arange(n_bands, dtype=np.int32), n)),
            "band_hash": pa.array(h.reshape(-1), pa.uint64()),
            "doc_id": pa.array(np.repeat(ids, n_bands), pa.int64()),
        }
    )


N_PAIR_PARTITIONS = 64


def _add_partition_key(t: pa.Table) -> pa.Table:
    """Hash-partition key over (band, band_hash) so pair generation runs as
    ~64 partition-grain groups (vectorized pandas inside), not one python
    call per bucket — the explicit partitioned-groupby pattern."""
    bh = t["band_hash"].to_numpy()
    band = t["band"].to_numpy().astype(np.uint64)
    pkey = ((bh ^ (band * np.uint64(0x9E3779B97F4A7C15))) % np.uint64(N_PAIR_PARTITIONS)).astype(
        np.int64
    )
    return t.append_column("pkey", pa.array(pkey, pa.int64()))


def _partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """All candidate pairs within each (band, band_hash) bucket of this
    partition. Buckets are ≥99% singletons: filter them vectorized first."""
    multi = g[g.duplicated(subset=["band", "band_hash"], keep=False)]
    if multi.empty:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64")})
    a_out: list[int] = []
    b_out: list[int] = []
    for (_, _), grp in multi.groupby(["band", "band_hash"], sort=False):
        ids = np.unique(grp["doc_id"].to_numpy())
        if len(ids) < 2:
            continue
        iu, ju = np.triu_indices(len(ids), k=1)
        a_out.extend(ids[iu].tolist())
        b_out.extend(ids[ju].tolist())
    return pd.DataFrame({"a": a_out, "b": b_out})


def _candidate_pairs_ds(band_ds) -> "rd.Dataset":
    """(band, band_hash, doc_id) rows → Dataset of unique candidate (a, b)
    pairs — fully distributed.

    Pair generation is partition-grain (``_partition_pairs``); a pair found
    in several bands lands in several pkey groups, so a second tiny
    co-partitioned pass keyed on the PAIR dedupes across bands. Pairs never
    touch the driver here."""

    def add_pair_key(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy().astype(np.uint64)
        b = t["b"].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            pp = ((a * _MIX1 ^ b * _MIX2) % np.uint64(N_PAIR_PARTITIONS)).astype(np.int64)
        return t.append_column("ppkey", pa.array(pp, pa.int64()))

    def drop_dups(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=["a", "b"])[["a", "b"]]

    return (
        band_ds.map_batches(_add_partition_key, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(_partition_pairs, batch_format="pandas")
        .map_batches(add_pair_key, batch_format="pyarrow")
        .groupby("ppkey")
        .map_groups(drop_dups, batch_format="pandas")
    )


def _bucket_of(keys: np.ndarray, n: int) -> np.ndarray:
    """Uniform hash bucket of int64 keys (multiplicative mix, high bits)."""
    with np.errstate(over="ignore"):
        return (((keys.astype(np.uint64) * _MIX1) >> np.uint64(33)) % np.uint64(n)).astype(
            np.int64
        )


def _attach_sig_partitioned(
    pairs: "rd.Dataset",
    sigs: "rd.Dataset",
    key_col: str,
    sig_col: str,
    sig_type: pa.DataType,
    carry: dict[str, pa.DataType],
    out_col: str,
    n_buckets: int = N_PAIR_PARTITIONS,
) -> "rd.Dataset":
    """Inner-join ``pairs[key_col]`` → ``sigs.doc_id``, appending the matched
    signature as ``out_col`` — the bucket-partitioned join that replaces
    driver-side signature maps (the round-1 ``take_all()`` anti-pattern).

    Both sides are tagged into one schema-aligned stream and co-partitioned
    by a hash bucket of the join key (ONE shuffle; the key is id-like, so
    buckets are uniform); inside each bucket the match is a vectorized
    argsort + searchsorted, no per-row Python. No driver state anywhere;
    per-task memory is O(|sigs| / n_buckets) signatures.
    """
    cols = ["pkey", "side", "key", *carry, "sig"]

    def pair_rows(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy()
        data = {
            "pkey": pa.array(_bucket_of(keys, n_buckets), pa.int64()),
            "side": pa.array(np.zeros(t.num_rows, np.int8)),
            "key": pa.array(keys, pa.int64()),
            **{c: t[c] for c in carry},
            "sig": pa.nulls(t.num_rows, sig_type),
        }
        return pa.table({c: data[c] for c in cols})

    def sig_rows(t: pa.Table) -> pa.Table:
        keys = t["doc_id"].to_numpy()
        data = {
            "pkey": pa.array(_bucket_of(keys, n_buckets), pa.int64()),
            "side": pa.array(np.ones(t.num_rows, np.int8)),
            "key": pa.array(keys, pa.int64()),
            **{c: pa.nulls(t.num_rows, ct) for c, ct in carry.items()},
            "sig": t[sig_col].combine_chunks(),
        }
        return pa.table({c: data[c] for c in cols})

    out_schema = pa.schema(
        [(key_col, pa.int64()), *carry.items(), (out_col, sig_type)]
    )

    def join_group(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy()
        keys = g["key"].to_numpy()
        sig_idx = np.flatnonzero(side == 1)
        pair_idx = np.flatnonzero(side == 0)
        if len(sig_idx) == 0 or len(pair_idx) == 0:
            return out_schema.empty_table()
        sk = keys[sig_idx]
        order = np.argsort(sk, kind="stable")
        sks = sk[order]
        pk = keys[pair_idx]
        pos = np.minimum(np.searchsorted(sks, pk), len(sks) - 1)
        matched = sks[pos] == pk
        take_pair = pa.array(pair_idx[matched])
        take_sig = pa.array(sig_idx[order[pos[matched]]])
        out = {key_col: pa.array(pk[matched], pa.int64())}
        for c in carry:
            out[c] = g[c].take(take_pair)
        out[out_col] = g["sig"].take(take_sig)
        return pa.table(out).cast(out_schema)

    stream = pairs.map_batches(pair_rows, batch_format="pyarrow").union(
        sigs.map_batches(sig_rows, batch_format="pyarrow")
    )
    return stream.groupby("pkey").map_groups(join_group, batch_format="pyarrow")


_SIG_LIST = pa.list_(pa.uint64())


def _attach_both_sigs(
    cand: "rd.Dataset", sigs: "rd.Dataset", sig_col: str, sig_type: pa.DataType
) -> "rd.Dataset":
    """Candidate (a, b) pairs → (a, b, sig_a, sig_b) via two partitioned
    joins (a → sigs, then b → sigs)."""
    j1 = _attach_sig_partitioned(
        cand, sigs, "a", sig_col, sig_type, {"b": pa.int64()}, "sig_a"
    )
    return _attach_sig_partitioned(
        j1, sigs, "b", sig_col, sig_type, {"a": pa.int64(), "sig_a": sig_type}, "sig_b"
    )


def _list_offsets(col: "pa.ChunkedArray") -> tuple[np.ndarray, np.ndarray]:
    """(flat values, row offsets) of a list<uint64> column — offsets are
    rebuilt from per-row lengths so slices/takes are handled correctly."""
    import pyarrow.compute as pc

    arr = col.combine_chunks()
    lens = pc.list_value_length(arr).to_numpy().astype(np.int64)
    vals = np.asarray(arr.flatten(), dtype=np.uint64)
    offs = np.concatenate([[0], np.cumsum(lens)])
    return vals, offs


def _labeled_output(sigs: "rd.Dataset", comp: dict[int, int]) -> pd.DataFrame:
    """(doc_id, cluster_rep) for every doc. Cluster labels exist only for
    nodes that appeared in verified pairs (≪ corpus) — broadcast once via
    ``ray.put``; every batch maps ids vectorized (singletons → themselves).
    The driver holds only the pair-graph labels and the returned frame (the
    query's result contract)."""
    ref = ray.put(comp)

    def lab(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        ids = t["doc_id"].to_numpy()
        s = pd.Series(ids)
        reps = s.map(m).fillna(s).astype(np.int64).to_numpy()
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "cluster_rep": pa.array(reps, pa.int64())}
        )

    return (
        sigs.select_columns(["doc_id"])
        .map_batches(lab, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _connected_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find on the driver (pair list ≪ corpus; see module docstring)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _cluster_output(
    sigs: "rd.Dataset", verified_ds: "rd.Dataset", components: str = "driver"
) -> pd.DataFrame:
    """Shared tail of every near-dup operator: verified-pair Dataset →
    (doc_id, cluster_rep) under the selected labeling engine.

      - ``"driver"``: union-find on the collected pair list (pairs ≪ corpus).
      - ``"distributed"``: per-edge min-label rounds as Ray groupbys;
        per-node label map on the driver.
      - ``"dataset"``: fully dataset-native (``_cc_labels_dataset``) — the
        pair list never reaches the driver. The 100-TB path.
    All three are value-identical (equivalence-tested)."""
    if components == "dataset":
        return _labeled_output_dataset(sigs, _cc_labels_dataset(verified_ds))
    if components not in ("driver", "distributed"):
        raise ValueError(f"unknown components mode: {components!r}")
    verified = verified_ds.to_pandas()  # VERIFIED pairs only (≪ corpus)
    if components == "distributed":
        comp = _cc_labels_distributed(verified)
    else:
        comp = _connected_components(
            [(int(a), int(b)) for a, b in zip(verified["a"], verified["b"])]
        )
    return _labeled_output(sigs, comp)


def minhash_dedup(
    sf_dir: str,
    *,
    n_perm: int = 128,
    n_bands: int = 32,
    threshold: float = 0.5,
    components: str = "driver",
) -> pd.DataFrame:
    """Near-dup detection on the perturbed-doubled corpus via MinHash LSH.

    Returns (doc_id, cluster_rep): every doc with the representative (min id)
    of its near-dup cluster; singletons map to themselves. Candidate pairs
    come from banded LSH buckets; similarity is the minhash estimate
    (matching components / n_perm) ≥ threshold.

    ``components`` selects the cluster-labeling engine:
      - ``"driver"`` (default): union-find over the verified-pair list on
        the driver — exact and fastest while pairs ≪ corpus.
      - ``"distributed"``: per-EDGE min-label rounds as Ray groupbys; the
        per-NODE label map still lives on the driver (O(pair-node) ints).
      - ``"dataset"``: fully dataset-native — pairs never reach the driver;
        labels live in a Dataset and every round is a co-partitioned join
        (``_cc_labels_dataset``). The 100-TB path.
    All three are value-identical (equivalence-tested on the planted corpus).
    """
    import functools

    if components not in ("driver", "distributed", "dataset"):
        raise ValueError(f"unknown components mode: {components!r}")
    rows_per_band = n_perm // n_bands
    ds = _doubled(sf_dir, perturb=True)
    # signatures are tiny (n_docs × n_perm × 8B) and consumed three times
    # (bands + two verify joins + labeling) → materialize once
    sigs = minhash_signatures(ds, n_perm).materialize()

    band_ds = sigs.map_batches(
        lambda t: _band_rows(t, n_bands, rows_per_band), batch_format="pyarrow"
    )
    cand = _candidate_pairs_ds(band_ds)
    # verification: join each pair back to the signature dataset (two
    # bucket-partitioned joins), then compare signatures VECTORIZED per
    # batch — no O(corpus) state ever reaches the driver
    joined = _attach_both_sigs(cand, sigs, "sig", _SIG_LIST)
    verified_ds = joined.map_batches(
        functools.partial(_verify_minhash_batch, n_perm=n_perm, threshold=threshold),
        batch_format="pyarrow",
    )
    return _cluster_output(sigs, verified_ds, components)


def _verify_minhash_batch(t: pa.Table, n_perm: int, threshold: float) -> pa.Table:
    """Estimated Jaccard (matching minhash components) per pair, vectorized
    over the whole batch: two (n_pairs × n_perm) matrices, one equality mean."""
    schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    if t.num_rows == 0:
        return schema.empty_table()
    va, _ = _list_offsets(t["sig_a"])
    vb, _ = _list_offsets(t["sig_b"])
    A = va.reshape(-1, n_perm)
    B = vb.reshape(-1, n_perm)
    est = (A == B).mean(axis=1)
    keep = pa.array(est >= threshold)
    return t.select(["a", "b"]).filter(keep).cast(schema)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _simhash64(texts: list[str]) -> np.ndarray:
    """64-bit simhash over word-unigram hashes (unweighted), vectorized
    BATCH-WIDE: one hash pass over every document's tokens concatenated,
    one unpackbits, and per-document bit votes via ``np.add.reduceat`` —
    no per-document numpy round trips."""
    tok_lists = [set(T.ws_tokens(T.normalize_for_fingerprint(t))) for t in texts]
    lens = np.array([len(t) for t in tok_lists], dtype=np.int64)
    out = np.zeros(len(texts), dtype=np.uint64)
    nz = lens > 0
    if not nz.any():
        return out
    all_toks = np.asarray(
        [tok for toks in tok_lists for tok in toks], dtype=object
    )
    hs = pd.util.hash_array(all_toks, categorize=False).astype(np.uint64)
    # (n_tokens, 64) bit matrix; little-endian byte/bit order ⇔ (h >> j) & 1
    bits = np.unpackbits(
        hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    ).astype(np.int32)
    starts = np.concatenate([[0], np.cumsum(lens[nz])[:-1]])
    sums = np.add.reduceat(bits, starts, axis=0)  # (n_nonempty, 64)
    votes = 2 * sums - lens[nz][:, None]
    h = (
        (votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]
    ).sum(axis=1)
    out[nz] = h
    return out


def simhash_dedup(
    sf_dir: str, max_hamming: int = 3, components: str = "driver"
) -> pd.DataFrame:
    """Near-dup clustering of the perturbed-doubled corpus by SimHash.

    Blocking: 4 bands of 16 bits — any pair with hamming distance ≤ 3 shares
    at least one identical band (pigeonhole), so blocking is lossless for
    the ≤3 radius. Verification = exact popcount on candidate pairs.
    """
    ds = _doubled(sf_dir, perturb=True)

    def sig(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t["doc_id"], "simhash": pa.array(_simhash64(t["text"].to_pylist()), pa.uint64())}
        )

    sigs = ds.map_batches(sig, batch_format="pyarrow").materialize()  # reused twice, tiny

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

    import functools

    cand = _candidate_pairs_ds(sigs.map_batches(bands, batch_format="pyarrow"))
    # hamming verification via the same partitioned join — both simhash
    # values arrive co-located, popcount is vectorized per batch
    joined = _attach_both_sigs(cand, sigs, "simhash", pa.uint64())
    verified_ds = joined.map_batches(
        functools.partial(_verify_simhash_batch, max_hamming=max_hamming),
        batch_format="pyarrow",
    )
    return _cluster_output(sigs, verified_ds, components)


def _verify_simhash_batch(t: pa.Table, max_hamming: int) -> pa.Table:
    """Exact hamming distance per pair: xor + unpackbits popcount, one
    vectorized pass over the batch."""
    schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    if t.num_rows == 0:
        return schema.empty_table()
    A = t["sig_a"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
    B = t["sig_b"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
    x = A ^ B
    pop = np.unpackbits(x.view(np.uint8)).reshape(len(x), 64).sum(axis=1)
    keep = pa.array(pop <= max_hamming)
    return t.select(["a", "b"]).filter(keep).cast(schema)


# ---------------------------------------------------------------------------
# EXACT n-gram Jaccard similarity join (prefix filtering, AllPairs-style)
# ---------------------------------------------------------------------------


def _shingle_ds(ds: "rd.Dataset") -> "rd.Dataset":
    """(doc_id, sh list<uint64>) — sorted unique word-3-gram shingle hashes
    per document (``np.unique`` sorts, which doubles as the global token
    order the prefix filter needs)."""

    def sh(t: pa.Table) -> pa.Table:
        out = [_shingle_hashes(x).tolist() for x in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"], "sh": pa.array(out, _SIG_LIST)})

    return ds.map_batches(sh, batch_format="pyarrow", batch_size=1024)


def _prefix_rows(t: pa.Table, threshold: float) -> pa.Table:
    """Explode each doc's PREFIX shingles to (band=0, band_hash=shingle,
    doc_id) rows. Prefix length = |S| - ceil(t·|S|) + 1 under the global
    (ascending hash) order — the AllPairs/PPJoin bound: any pair with
    Jaccard ≥ t shares at least one prefix shingle, so candidate
    generation is EXACT (no recall loss), unlike the minhash-band path.
    Fully vectorized (repeat/arange gather, no per-row Python)."""
    import pyarrow.compute as pc

    arr = t["sh"].combine_chunks()
    lens = pc.list_value_length(arr).to_numpy().astype(np.int64)
    vals = np.asarray(arr.flatten(), dtype=np.uint64)
    offs = np.concatenate([[0], np.cumsum(lens)])
    # clip: t→0 would give |S|+1 (past the row boundary); prefix is at most
    # the whole set and at least one shingle
    plen = np.clip(lens - np.ceil(threshold * lens).astype(np.int64) + 1, 1, lens)
    ids = t["doc_id"].to_numpy()
    total = int(plen.sum())
    row_of = np.repeat(np.arange(len(ids)), plen)
    start = np.repeat(offs[:-1], plen)
    within = np.arange(total) - np.repeat(
        np.concatenate([[0], np.cumsum(plen)[:-1]]), plen
    )
    return pa.table(
        {
            "band": pa.array(np.zeros(total, np.int32)),
            "band_hash": pa.array(vals[start + within], pa.uint64()),
            "doc_id": pa.array(ids[row_of], pa.int64()),
        }
    )


def _verify_jaccard_batch(t: pa.Table, threshold: float) -> pa.Table:
    """Exact Jaccard for the whole batch in ONE vectorized pass: both
    sides' (pair, shingle) rows are lexsorted together and intersections
    counted from adjacent duplicates (each side's shingles are unique
    within a pair, so a duplicate ⇔ present in both). The division is the
    same double division the SQL oracle performs — values bit-identical."""
    schema = pa.schema([("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())])
    if t.num_rows == 0:
        return schema.empty_table()
    va, oa = _list_offsets(t["sig_a"])
    vb, ob = _list_offsets(t["sig_b"])
    a = t["a"].to_numpy()
    b = t["b"].to_numpy()
    n = len(a)
    la = np.diff(oa)
    lb = np.diff(ob)
    pair_idx = np.concatenate(
        [np.repeat(np.arange(n), la), np.repeat(np.arange(n), lb)]
    )
    vals = np.concatenate([va, vb])
    order = np.lexsort((vals, pair_idx))
    p, v = pair_idx[order], vals[order]
    dup = (p[1:] == p[:-1]) & (v[1:] == v[:-1])
    inter = np.bincount(p[:-1][dup], minlength=n).astype(np.float64)
    union = np.maximum(la + lb - inter, 1.0)
    js = inter / union
    keep = js >= threshold
    return pa.table(
        {
            "a": pa.array(a[keep], pa.int64()),
            "b": pa.array(b[keep], pa.int64()),
            "jaccard": pa.array(js[keep], pa.float64()),
        }
    )


def _exact_jaccard_pairs_ds(sf_dir: str, threshold: float) -> tuple["rd.Dataset", "rd.Dataset"]:
    """(verified-pairs Dataset, shingle Dataset) for the doubled corpus —
    the shared engine of ``ngram_jaccard_pairs`` / ``jaccard_cluster_reps``."""
    import functools

    sh = _shingle_ds(_doubled(sf_dir, perturb=True)).materialize()  # reused 4×
    cand = _candidate_pairs_ds(
        sh.map_batches(
            functools.partial(_prefix_rows, threshold=threshold), batch_format="pyarrow"
        )
    )
    joined = _attach_both_sigs(cand, sh, "sh", _SIG_LIST)
    ver = joined.map_batches(
        functools.partial(_verify_jaccard_batch, threshold=threshold),
        batch_format="pyarrow",
    )
    return ver, sh


def _check_threshold(threshold: float) -> None:
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"jaccard threshold must be in (0, 1], got {threshold}")


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5) -> pd.DataFrame:
    """ALL pairs with exact word-3-gram Jaccard ≥ threshold (exact
    similarity join — SQL-oracle-checkable, unlike an LSH candidate set).

    Shape: shingle sets → prefix-filter explode (exact candidates) →
    partitioned-groupby pair generation → two bucket-partitioned joins to
    re-attach both shingle sets → vectorized exact verify. No driver state;
    the known cost of EXACTNESS is that a globally frequent prefix shingle
    fans out to its pair count (the minhash path stays the approximate
    scale alternative). For a non-default threshold, pair the result with
    ``ngram_jaccard_sql(threshold)`` — the registered oracle constant
    covers the 0.5 default."""
    _check_threshold(threshold)
    ver, _ = _exact_jaccard_pairs_ds(sf_dir, threshold)
    out = ver.to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def jaccard_cluster_reps(
    sf_dir: str, threshold: float = 0.5, components: str = "driver"
) -> pd.DataFrame:
    """(doc_id, cluster_rep) from connected components over the EXACT
    jaccard pair graph — end-to-end dedup whose clustering itself is
    SQL-oracle-checked (recursive min-label CTE in DuckDB)."""
    _check_threshold(threshold)
    ver, sh = _exact_jaccard_pairs_ds(sf_dir, threshold)
    return _cluster_output(sh, ver.select_columns(["a", "b"]), components)


# Shared SQL fragment: the perturbed-doubled corpus + per-doc distinct
# word-3-gram sets, reproducing functions/text.py normalization exactly
# (lower + trim + whitespace collapse; <3 tokens → the whole normalized
# text as the single "gram"; empty → a sentinel no real gram can equal).
_GRAMS_PREFIX_SQL = rf"""
tok0 AS (
  SELECT doc_id, string_split(text, ' ') AS rtk FROM documents
),
doubled AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {DUP_OFFSET},
         array_to_string(rtk[1:greatest(len(rtk) - 2, 0)], ' ')
  FROM tok0
),
toks AS (
  SELECT doc_id,
         lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS ntext,
         string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS tk
  FROM doubled
),
grams AS (
  SELECT doc_id,
         CASE
           WHEN ntext = '' THEN ['']
           WHEN len(tk) < 3 THEN [ntext]
           ELSE list_distinct([tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2]
                               FOR i IN range(1, len(tk) - 1)])
         END AS g
  FROM toks
)
"""


def _jaccard_grams_sql(threshold: float) -> str:
    """Grams prefix + the jpairs CTE for an arbitrary threshold t: the
    length-ratio predicate min ≥ t·max follows from J ≥ t (inter ≤ min and
    inter ≥ t·union ≥ t·max) — an EXACT prefilter for every t in (0, 1]."""
    _check_threshold(threshold)
    return f"""{_GRAMS_PREFIX_SQL},
grams2 AS (
  SELECT doc_id, g, len(g) AS gl FROM grams
),
jpairs AS (
  SELECT a, b, CAST(i AS DOUBLE) / (gla + glb - i) AS jaccard FROM (
    SELECT ga.doc_id AS a, gb.doc_id AS b, ga.gl AS gla, gb.gl AS glb,
           len(list_intersect(ga.g, gb.g)) AS i
    FROM grams2 ga JOIN grams2 gb
      ON ga.doc_id < gb.doc_id
     AND ga.gl >= {threshold} * gb.gl AND gb.gl >= {threshold} * ga.gl
  ) WHERE CAST(i AS DOUBLE) / (gla + glb - i) >= {threshold}
)
"""


def ngram_jaccard_sql(threshold: float = 0.5) -> str:
    return f"""
WITH {_jaccard_grams_sql(threshold)}
SELECT a, b, jaccard FROM jpairs ORDER BY a, b
"""


def jaccard_cluster_reps_sql(threshold: float = 0.5) -> str:
    return f"""
WITH RECURSIVE {_jaccard_grams_sql(threshold)},
edges2 AS (
  SELECT a, b FROM jpairs UNION ALL SELECT b, a FROM jpairs
),
lab AS (
  SELECT doc_id AS node, doc_id AS lbl FROM doubled
  UNION
  SELECT e.b AS node, l.lbl FROM edges2 e JOIN lab l ON l.node = e.a
)
SELECT node AS doc_id, min(lbl) AS cluster_rep FROM lab GROUP BY node ORDER BY doc_id
"""


NGRAM_JACCARD_PAIRS_SQL = ngram_jaccard_sql(0.5)
JACCARD_CLUSTER_REPS_SQL = jaccard_cluster_reps_sql(0.5)


# ---------------------------------------------------------------------------
# Distributed connected components (scale path for cluster assignment)
# ---------------------------------------------------------------------------


def _cc_labels_distributed(pairs: pd.DataFrame) -> dict[int, int]:
    """Min-label propagation over the verified-pair graph as Ray Data
    groupby rounds, with FULL path compression between rounds.

    Scale claim, stated precisely: the per-EDGE work (the dominant cost —
    pair lists dwarf the pair-graph node count) runs as a distributed
    groupby-min each round; the per-NODE label map covers only nodes that
    appear in pairs and lives on the driver (O(pair nodes) ints — fine up
    to billions on a big driver; beyond that, labels become a Dataset
    joined per round). Singletons never enter a round — callers label them
    identity via ``_labeled_output``. Iterates to an exact fixpoint — full
    compression makes each round collapse entire chains, so rounds ≈
    O(log diameter); a hard cap raises instead of silently returning
    partial clusters.
    """
    import ray.data as _rd
    from ray.data.aggregate import Min as _Min

    if pairs.empty:
        return {}
    edges = pairs[["a", "b"]].to_numpy()
    label = {int(i): int(i) for i in np.unique(edges)}

    def compress() -> None:
        # full path compression of the driver label map (iterative chase)
        for n in list(label):
            root = n
            seen = []
            while label.get(root, root) != root:
                seen.append(root)
                root = label[root]
            for m in seen:
                label[m] = root

    for round_no in range(64):
        la = np.array([label[a] for a in edges[:, 0]])
        lb = np.array([label[b] for b in edges[:, 1]])
        nodes = np.concatenate([edges[:, 0], edges[:, 1]])
        labels = np.concatenate([lb, la])
        tbl = pa.table({"node": pa.array(nodes, pa.int64()), "label": pa.array(labels, pa.int64())})
        agg = (
            _rd.from_arrow(tbl)
            .groupby("node")
            .aggregate(_Min("label", alias_name="label"))
            .to_pandas()
        )
        changed = False
        for n, lbl in zip(agg["node"], agg["label"]):
            if lbl < label[n]:
                label[n] = int(lbl)
                changed = True
        compress()
        if not changed:
            return label
    raise RuntimeError("connected components did not converge in 64 rounds")


def connected_components_distributed(pairs: pd.DataFrame, all_ids: list[int]) -> pd.DataFrame:
    """(doc_id, cluster_rep) for ``all_ids`` via the distributed min-label
    rounds of ``_cc_labels_distributed`` (singletons map to themselves)."""
    label = _cc_labels_distributed(pairs)
    ids = sorted(all_ids)
    return pd.DataFrame({"doc_id": ids, "cluster_rep": [label.get(i, i) for i in ids]})


def _cc_pkey(x: np.ndarray) -> np.ndarray:
    """Deterministic bucket of a node id (co-partitioning key for CC joins)."""
    with np.errstate(over="ignore"):
        return (
            ((x.astype(np.uint64) * _MIX2) >> np.uint64(33)) % np.uint64(N_PAIR_PARTITIONS)
        ).astype(np.int64)


def _cc_labels_dataset(edges: "rd.Dataset") -> "rd.Dataset":
    """Fully dataset-native min-label propagation: per-node labels live in a
    Ray Dataset and each round is a co-partitioned join — the TRUE 100-TB
    connected-components path (VERDICT r2 item 4). The driver never holds
    the label map, the edge list, or any O(nodes)/O(edges) structure; per
    round it sees ONE scalar (the changed-node count).

    Round shape (2 bucketed shuffles):
      1. tagged union of edges (keyed by src) and labels (keyed by node)
         → groupby(pkey) → vectorized pandas merge inside each bucket
         propagates every src's label one hop to its dst,
      2. propagated + old label rows re-bucket by node → groupby(pkey)
         → per-node min + changed flag (vectorized).
    Labels only decrease, so the fixpoint (changed == 0) is exact: labels
    are then constant per component and equal to the component's min id.
    Rounds = O(graph diameter) — near-dup clusters are clique-ish, so this
    is small; a hard cap raises instead of returning partial clusters.

    ``edges``: Dataset[(a: int64, b: int64)]. Returns Dataset[(node, label)]
    covering every node that appears in an edge.
    """
    from ray.data.aggregate import Min as _Min

    def sym(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy().astype(np.int64)
        b = t["b"].to_numpy().astype(np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        return pa.table(
            {
                "pkey": pa.array(_cc_pkey(src), pa.int64()),
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "label": pa.array(np.zeros(len(src), dtype=np.int64), pa.int64()),
                "kind": pa.array(np.zeros(len(src), dtype=np.int8), pa.int8()),
            }
        )

    sym_edges = edges.map_batches(sym, batch_format="pyarrow").materialize()
    if sym_edges.count() == 0:
        return rd.from_arrow(
            pa.schema([("node", pa.int64()), ("label", pa.int64())]).empty_table()
        )

    def init_labels(t: pa.Table) -> pa.Table:
        u = np.unique(t["src"].to_numpy())
        return pa.table({"node": pa.array(u, pa.int64()), "label": pa.array(u, pa.int64())})

    labels = (
        sym_edges.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node")
        .aggregate(_Min("label", alias_name="label"))
        .materialize()
    )

    def as_label_rows(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "pkey": pa.array(_cc_pkey(node), pa.int64()),
                "src": pa.array(node, pa.int64()),
                "dst": pa.array(np.full(len(node), -1, dtype=np.int64), pa.int64()),
                "label": t["label"].cast(pa.int64()),
                "kind": pa.array(np.ones(len(node), dtype=np.int8), pa.int8()),
            }
        )

    _prop_schema = pa.schema(
        [("node", pa.int64()), ("label", pa.int64()), ("is_old", pa.int8())]
    )

    def propagate(g: pd.DataFrame) -> pa.Table:
        lab = g.loc[g["kind"] == 1, ["src", "label"]]
        ed = g.loc[g["kind"] == 0, ["src", "dst"]]
        prop = ed.merge(lab, on="src", how="inner")[["dst", "label"]].rename(
            columns={"dst": "node"}
        )
        prop["is_old"] = np.int8(0)
        old = lab.rename(columns={"src": "node"})[["node", "label"]].copy()
        old["is_old"] = np.int8(1)
        out = pd.concat([prop, old], ignore_index=True)
        # arrow output keeps every block in the round the same block type
        # (a pandas block slipping into the next groupby's sort breaks it)
        return pa.Table.from_pandas(out, preserve_index=False).cast(_prop_schema)

    def add_node_pkey(t: pa.Table) -> pa.Table:
        return t.append_column(
            "pkey2", pa.array(_cc_pkey(t["node"].to_numpy().astype(np.int64)), pa.int64())
        )

    _step_schema = pa.schema(
        [("node", pa.int64()), ("label", pa.int64()), ("changed", pa.int64())]
    )

    def min_and_changed(g: pd.DataFrame) -> pa.Table:
        mn = g.groupby("node", sort=False)["label"].min()
        old = g.loc[g["is_old"] == 1].set_index("node")["label"]
        out = mn.reset_index().rename(columns={"label": "label"})
        out["changed"] = (mn.to_numpy() < old.reindex(mn.index).to_numpy()).astype(np.int64)
        return pa.Table.from_pandas(
            out[["node", "label", "changed"]], preserve_index=False
        ).cast(_step_schema)

    for _round in range(64):
        lab_rows = labels.map_batches(as_label_rows, batch_format="pyarrow")
        stepped = (
            sym_edges.union(lab_rows)
            .groupby("pkey")
            .map_groups(propagate, batch_format="pandas")
            .map_batches(add_node_pkey, batch_format="pyarrow")
            .groupby("pkey2")
            .map_groups(min_and_changed, batch_format="pandas")
            .materialize()
        )
        n_changed = stepped.sum("changed")
        labels = stepped.select_columns(["node", "label"]).materialize()
        if not n_changed:
            return labels
    raise RuntimeError("dataset connected components did not converge in 64 rounds")


def _labeled_output_dataset(sigs: "rd.Dataset", labels: "rd.Dataset") -> pd.DataFrame:
    """(doc_id, cluster_rep) for every doc with labels living in a Dataset:
    a tagged union of corpus identity rows (node=label=doc_id) with the
    pair-graph labels, reduced by one distributed groupby-min — the
    dataset-mode counterpart of ``_labeled_output`` (no broadcast dict)."""
    from ray.data.aggregate import Min as _Min

    def ident(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].cast(pa.int64())
        return pa.table({"node": ids, "label": ids})

    out = (
        sigs.select_columns(["doc_id"])
        .map_batches(ident, batch_format="pyarrow")
        .union(labels)
        .groupby("node")
        .aggregate(_Min("label", alias_name="cluster_rep"))
        .to_pandas()
        .rename(columns={"node": "doc_id"})
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    out["cluster_rep"] = out["cluster_rep"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Substring-level duplicate spans (token-window dedup)
# ---------------------------------------------------------------------------


def _span_hashes(text: str, k: int) -> np.ndarray:
    """Distinct hashes of the k-token sliding windows of a document; EMPTY
    for docs with fewer than k tokens (unlike ``_shingle_hashes``, which
    folds short docs into one pseudo-shingle for whole-doc similarity)."""
    toks = T.ws_tokens(T.normalize_for_fingerprint(text))
    if len(toks) < k:
        return np.array([], dtype=np.uint64)
    return _shingle_hashes(text, k)


def doc_duplicate_spans(
    sf_dir: str, k: int = 8, output_dir: "str | None" = None
) -> pd.DataFrame:
    """Per document: how many of its distinct k-token windows also occur in
    at least one OTHER document — substring-grain duplication measurement
    (the window-hash approximation of suffix-array substring dedup used
    for training-corpus cleaning).

    Shape: window-hash explode (vectorized k-gram mix, one row per distinct
    (window, doc)); because every doc's windows are produced whole inside
    one explode batch, the per-doc ``n_windows`` total is FINAL at the
    producing task — it is emitted as a tagged count row alongside the
    window rows, so no corpus-wide groupby is spent on totals. The
    shared-window decision runs inside hash-partitioned groups (a window's
    full doc set is co-located by pkey = f(whash), so the ≥2-docs test is
    exact and local) and each group emits per-doc PARTIAL counts
    (vectorized value_counts), shrinking the last shuffle from
    window-grain to doc-grain. The three per-doc datasets (all ids,
    totals, shared partials) combine via a TAGGED UNION + one distributed
    ``groupby(doc_id).sum`` — no driver-side corpus-grain merge. With
    ``output_dir`` the result is written as partitioned parquet and only a
    head() sample returns; without it, the per-doc frame is the small-sf
    result contract.

    For a non-default ``k``, pair with ``doc_duplicate_spans_sql(k)`` —
    the registered oracle constant covers the k=8 default."""
    if k < 2:
        raise ValueError(f"window size must be ≥ 2, got {k}")
    docs = _docs(sf_dir)

    # kind 0 = (whash, doc_id) window row; kind 1 = per-doc total, with the
    # count carried in ``whash`` (the per-doc total is complete here: each
    # doc's text is tokenized exactly once, in one task)
    def explode(t: pa.Table) -> pa.Table:
        ids_out: list[np.ndarray] = []
        wh_out: list[np.ndarray] = []
        ids = t["doc_id"].to_numpy()
        counts = np.zeros(len(ids), dtype=np.uint64)
        for i, x in enumerate(t["text"].to_pylist()):
            w = _span_hashes(x, k)
            counts[i] = len(w)
            if len(w):
                wh_out.append(w)
                ids_out.append(np.full(len(w), ids[i], dtype=np.int64))
        wh_out.append(counts)
        ids_out.append(ids.astype(np.int64))
        kind = np.zeros(sum(len(a) for a in wh_out), dtype=np.int8)
        kind[-len(ids):] = 1
        return pa.table(
            {
                "whash": pa.array(np.concatenate(wh_out), pa.uint64()),
                "doc_id": pa.array(np.concatenate(ids_out), pa.int64()),
                "kind": pa.array(kind, pa.int8()),
            }
        )

    rows = docs.map_batches(explode, batch_format="pyarrow").materialize()  # reused 2×

    from ray.data.aggregate import Sum as _Sum

    _UNION_SCHEMA = pa.schema(
        [("doc_id", pa.int64()), ("n_windows", pa.int64()), ("n_shared", pa.int64())]
    )

    def totals_rows(t: pa.Table) -> pa.Table:
        m = t.filter(pc.equal(t["kind"], 1))
        return pa.table(
            {
                "doc_id": m["doc_id"],
                "n_windows": m["whash"].cast(pa.int64()),
                "n_shared": pa.array(np.zeros(m.num_rows, np.int64), pa.int64()),
            }
        ).cast(_UNION_SCHEMA)

    totals = rows.map_batches(totals_rows, batch_format="pyarrow")

    def add_pkey(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["kind"], 0)).select(["whash", "doc_id"])
        wh = t["whash"].to_numpy()
        with np.errstate(over="ignore"):
            pk = ((wh * _MIX2) >> np.uint64(33)) % np.uint64(N_PAIR_PARTITIONS)
        return t.append_column("pkey", pa.array(pk.astype(np.int64), pa.int64()))

    def shared_partials(g: pd.DataFrame) -> pd.DataFrame:
        # (whash, doc) rows are distinct → per-whash row count == distinct
        # docs; per-doc counts leave the group pre-aggregated
        keep = g.groupby("whash")["doc_id"].transform("size") >= 2
        vc = g.loc[keep, "doc_id"].value_counts()
        return pd.DataFrame(
            {
                "doc_id": vc.index.to_numpy(),
                "n_windows": np.zeros(len(vc), dtype=np.int64),
                "n_shared": vc.to_numpy().astype(np.int64),
            }
        )

    def _to_union_schema(t: pa.Table) -> pa.Table:
        return t.cast(_UNION_SCHEMA)

    shared = (
        rows.map_batches(add_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(shared_partials, batch_format="pandas")
        .map_batches(_to_union_schema, batch_format="pyarrow")
    )

    def _ids_only(t: pa.Table) -> pa.Table:
        n = t.num_rows
        zeros = pa.array(np.zeros(n, np.int64), pa.int64())
        return pa.table(
            {"doc_id": t["doc_id"].cast(pa.int64()), "n_windows": zeros, "n_shared": zeros}
        ).cast(_UNION_SCHEMA)

    all_ids = docs.select_columns(["doc_id"]).map_batches(
        _ids_only, batch_format="pyarrow"
    )

    # one distributed groupby assembles the per-doc result — the driver
    # never holds a corpus-grain intermediate
    result = (
        all_ids.union(totals)
        .union(shared)
        .groupby("doc_id")
        .aggregate(_Sum("n_windows", alias_name="n_windows"), _Sum("n_shared", alias_name="n_shared"))
    )
    if output_dir is not None:
        result.write_parquet(output_dir)
        out = result.limit(1000).to_pandas()
    else:
        out = result.to_pandas()
    out["n_windows"] = out["n_windows"].astype("int64")
    out["n_shared"] = out["n_shared"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_duplicate_spans_sql(k: int = 8) -> str:
    """Oracle SQL for an arbitrary window size (the registered constant
    covers the k=8 default; pass matching k on both sides for others)."""
    if k < 2:
        raise ValueError(f"window size must be ≥ 2, got {k}")
    return rf"""
WITH toks AS (
  SELECT doc_id,
         lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS ntext,
         string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS tk
  FROM documents
),
wins AS (
  SELECT doc_id,
         CASE WHEN ntext = '' OR len(tk) < {k} THEN []
              ELSE list_distinct([array_to_string(tk[i:i+{k - 1}], ' ')
                                  FOR i IN range(1, len(tk) - {k - 2})])
         END AS ws
  FROM toks
),
uw AS (SELECT doc_id, unnest(ws) AS w FROM wins),
shared AS (SELECT w FROM uw GROUP BY w HAVING count(DISTINCT doc_id) >= 2),
per_doc_shared AS (
  SELECT uw.doc_id, count(*) AS n_shared FROM uw JOIN shared USING (w) GROUP BY uw.doc_id
)
SELECT w1.doc_id,
       CAST(len(w1.ws) AS BIGINT) AS n_windows,
       CAST(coalesce(s.n_shared, 0) AS BIGINT) AS n_shared
FROM wins w1 LEFT JOIN per_doc_shared s USING (doc_id)
ORDER BY w1.doc_id
"""


DOC_DUPLICATE_SPANS_SQL = doc_duplicate_spans_sql(8)


# ---------------------------------------------------------------------------
# Fully SQL-oracle-checked MinHash+LSH (deterministic md5 shingle hashes)
# ---------------------------------------------------------------------------
#
# The production minhash (`minhash_dedup`) uses the fast siphash shingle mix,
# which SQL cannot reproduce — so it is verified by planted-pair tests only.
# This variant swaps in an md5-derived 28-bit shingle hash and a mod-(2^31-1)
# permutation family whose every step IS reproducible in DuckDB, so the
# WHOLE stack — shingling, signatures, banding, candidate pairs, estimated-
# jaccard verification, connected components — is hash-checked end-to-end
# against the SQL oracle. Because the oracle replicates the algorithm (not
# an idealized answer), the match is exact regardless of LSH recall.

_MHC_P = (1 << 31) - 1  # Mersenne prime; a*h+b < 2^58 stays int64-exact
_MHC_NPERM = 24  # 6 bands x 4 rows (small enough for the SQL side)
_MHC_BANDS = 6


def _mhc_constants() -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(123)
    a = (rng.integers(1, 1 << 30, _MHC_NPERM, dtype=np.int64)) | 1
    b = rng.integers(0, 1 << 30, _MHC_NPERM, dtype=np.int64)
    return a, b


def _gram_strings(text: str) -> list[str]:
    """Distinct word-3-gram strings, mirroring the oracle's grams CTE
    (empty doc → [''], <3 tokens → whole normalized text)."""
    nt = T.normalize_for_fingerprint(text)
    if nt == "":
        return [""]
    tk = nt.split(" ")
    if len(tk) < 3:
        return [nt]
    return list({" ".join(tk[i : i + 3]) for i in range(len(tk) - 2)})


def _md5_28(grams: list[str]) -> np.ndarray:
    import hashlib

    return np.array(
        [int(hashlib.md5(g.encode()).hexdigest()[:7], 16) for g in grams],
        dtype=np.int64,
    )


def minhash_dedup_checked(sf_dir: str, components: str = "driver") -> pd.DataFrame:
    """(doc_id, cluster_rep) over the perturbed-doubled corpus via the
    SQL-reproducible MinHash+LSH stack (see block comment above). Same
    distributed shape as ``minhash_dedup`` — bands → partitioned pair
    generation → partitioned signature joins → vectorized verify → CC."""
    a_c, b_c = _mhc_constants()

    def sig_batch(t: pa.Table) -> pa.Table:
        sigs = []
        for x in t["text"].to_pylist():
            h = _md5_28(_gram_strings(x))
            vals = (a_c[:, None] * h[None, :] + b_c[:, None]) % _MHC_P  # (24, n)
            sigs.append(vals.min(axis=1).tolist())
        return pa.table(
            {"doc_id": t["doc_id"], "sig": pa.array(sigs, pa.list_(pa.int64()))}
        )

    ds = _doubled(sf_dir, perturb=True)
    sigs = ds.map_batches(sig_batch, batch_format="pyarrow", batch_size=1024).materialize()

    # banding reuses the ONE band-hash kernel (same fold as production)
    cand = _candidate_pairs_ds(
        sigs.map_batches(
            lambda t: _band_rows(t, _MHC_BANDS, _MHC_NPERM // _MHC_BANDS),
            batch_format="pyarrow",
        )
    )
    joined = _attach_both_sigs(cand, sigs, "sig", pa.list_(pa.int64()))

    def verify(t: pa.Table) -> pa.Table:
        schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
        if t.num_rows == 0:
            return schema.empty_table()
        A = np.asarray(t["sig_a"].combine_chunks().flatten(), dtype=np.int64).reshape(
            -1, _MHC_NPERM
        )
        B = np.asarray(t["sig_b"].combine_chunks().flatten(), dtype=np.int64).reshape(
            -1, _MHC_NPERM
        )
        # integer threshold (matches*2 >= n_perm) — identical to HAVING
        keep = pa.array((A == B).sum(axis=1) * 2 >= _MHC_NPERM)
        return t.select(["a", "b"]).filter(keep).cast(schema)

    verified_ds = joined.map_batches(verify, batch_format="pyarrow")
    return _cluster_output(sigs, verified_ds, components)


def _mhc_sql() -> str:
    a_c, b_c = _mhc_constants()
    perm_rows = ", ".join(f"({j}, {int(a_c[j])}, {int(b_c[j])})" for j in range(_MHC_NPERM))
    return f"""
WITH RECURSIVE {_GRAMS_PREFIX_SQL},
perm(j, pa, pb) AS (VALUES {perm_rows}),
uw AS (SELECT doc_id, unnest(g) AS w FROM grams),
wh AS (
  SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 7)) AS BIGINT) AS h FROM uw
),
sigs AS (
  SELECT doc_id, p.j AS j, min((p.pa * h + p.pb) % {_MHC_P}) AS sig
  FROM wh CROSS JOIN perm p GROUP BY doc_id, p.j
),
bands AS (
  SELECT doc_id, j // {_MHC_NPERM // _MHC_BANDS} AS band,
         string_agg(CAST(sig AS VARCHAR), ',' ORDER BY j) AS bkey
  FROM sigs GROUP BY doc_id, j // {_MHC_NPERM // _MHC_BANDS}
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
),
ver AS (
  SELECT c.a, c.b
  FROM cand c
  JOIN sigs sa ON sa.doc_id = c.a
  JOIN sigs sb ON sb.doc_id = c.b AND sb.j = sa.j
  GROUP BY c.a, c.b
  HAVING sum(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END) * 2 >= {_MHC_NPERM}
),
edges2 AS (SELECT a, b FROM ver UNION ALL SELECT b, a FROM ver),
lab AS (
  SELECT doc_id AS node, doc_id AS lbl FROM doubled
  UNION
  SELECT e.b AS node, l.lbl FROM edges2 e JOIN lab l ON l.node = e.a
)
SELECT node AS doc_id, min(lbl) AS cluster_rep FROM lab GROUP BY node ORDER BY doc_id
"""


MINHASH_DEDUP_CHECKED_SQL = _mhc_sql()
