"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Corpus-grain dedup the reference never needed (it has no identity notion
beyond file names, SURVEY.md §2.8) but a 100 TB training-data pipeline does.
All variants follow the same scale shape:

  signature per row (map_batches, vectorized numpy)
    → explode to (band, band_hash, id) rows
    → groupby band bucket (the ONLY shuffle; bucket key is uniform by
      construction, so no skew/salting needed)
    → candidate pairs per bucket (map_groups)
    → verify (estimated or exact similarity)
    → connected components → representative = min id per cluster

Connected components run on the driver over the *verified pair list* —
orders of magnitude smaller than the corpus (documented assumption; the
scale path is iterative min-label propagation with groupby, same pairs
input). The testdata documents have no duplicates, so the dedup entries
plant them: each corpus is doubled with (exact or perturbed) copies at
``doc_id + DUP_OFFSET``.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

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

    Ray shape: fingerprint in map_batches → groupby(fingerprint) →
    map_groups(min doc_id). Every surviving row is the smallest id of its
    content group.
    """
    import hashlib

    def fp(t: pa.Table) -> pa.Table:
        h = [
            hashlib.md5(T.normalize_for_fingerprint(x).encode()).hexdigest()
            for x in t["text"].to_pylist()
        ]
        return pa.table({"doc_id": t["doc_id"], "fingerprint": pa.array(h, pa.string())})

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": [int(g["doc_id"].min())], "fingerprint": [g["fingerprint"].iloc[0]]}
        )

    out = (
        _doubled(sf_dir, perturb=False)
        .map_batches(fp, batch_format="pyarrow")
        .groupby("fingerprint")
        .map_groups(keep_min, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


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
    # per-position multipliers (first three match the historical k=3 mix)
    mults = [_MIX1, _MIX2, _MIX3] + [
        _MIX1 * np.uint64(2 * j + 1) for j in range(3, k)
    ]
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


def _candidate_pairs(band_ds) -> pd.DataFrame:
    """(band, band_hash, doc_id) rows → deduplicated candidate (a, b) pairs."""
    return (
        band_ds.map_batches(_add_partition_key, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(_partition_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
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
    """
    rows_per_band = n_perm // n_bands
    ds = _doubled(sf_dir, perturb=True)
    # signatures are tiny (n_docs × n_perm × 8B) and consumed twice (bands +
    # verification) → materialize once instead of re-running the sig DAG
    sigs = minhash_signatures(ds, n_perm).materialize()

    band_ds = sigs.map_batches(
        lambda t: _band_rows(t, n_bands, rows_per_band), batch_format="pyarrow"
    )
    cand = _candidate_pairs(band_ds)

    # verify with the signature table (broadcast; scale path = hash join)
    sig_map = {r["doc_id"]: np.asarray(r["sig"], dtype=np.uint64) for r in sigs.take_all()}
    verified = []
    for a, b in zip(cand["a"], cand["b"]):
        est = float(np.mean(sig_map[a] == sig_map[b]))
        if est >= threshold:
            verified.append((int(a), int(b)))

    all_ids = sorted(sig_map)
    if components == "distributed":
        # edge-heavy path: per-round min-reduction runs as Ray groupbys
        vp = pd.DataFrame(verified, columns=["a", "b"])
        return connected_components_distributed(vp, all_ids)
    comp = _connected_components(verified)
    out = pd.DataFrame(
        {"doc_id": all_ids, "cluster_rep": [comp.get(i, i) for i in all_ids]}
    )
    return out.reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _simhash64(texts: list[str]) -> np.ndarray:
    """64-bit simhash over word-unigram hashes (unweighted), vectorized."""
    out = np.empty(len(texts), dtype=np.uint64)
    bits = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = list(set(T.ws_tokens(T.normalize_for_fingerprint(t))))
        if not toks:
            out[i] = 0
            continue
        hs = pd.util.hash_array(np.asarray(toks, dtype=object), categorize=False)
        bitmat = ((hs[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int32)
        votes = bitmat.sum(axis=0) * 2 - len(hs)  # (+1/-1 votes)
        out[i] = np.uint64(((votes > 0).astype(np.uint64) << bits).sum())
    return out


def simhash_dedup(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
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

    cand = _candidate_pairs(sigs.map_batches(bands, batch_format="pyarrow"))
    hmap = {r["doc_id"]: int(r["simhash"]) for r in sigs.take_all()}
    verified = [
        (int(a), int(b))
        for a, b in zip(cand["a"], cand["b"])
        if bin(hmap[a] ^ hmap[b]).count("1") <= max_hamming
    ]
    comp = _connected_components(verified)
    all_ids = sorted(hmap)
    return pd.DataFrame(
        {"doc_id": all_ids, "cluster_rep": [comp.get(i, i) for i in all_ids]}
    ).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard on LSH candidates
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5) -> pd.DataFrame:
    """Near-dup PAIRS with exact word-3-gram Jaccard ≥ threshold.

    Candidates from MinHash bands (cheap); verification computes the exact
    Jaccard from shingle sets (broadcast shingle map; scale path = join).
    """
    n_perm, n_bands = 64, 16
    ds = _doubled(sf_dir, perturb=True).materialize()  # reused: bands + shingle verify
    sigs = minhash_signatures(ds, n_perm)
    band_ds = sigs.map_batches(
        lambda t: _band_rows(t, n_bands, n_perm // n_bands), batch_format="pyarrow"
    )
    cand = _candidate_pairs(band_ds)
    sh_map = {
        r["doc_id"]: set(_shingle_hashes(r["text"]).tolist()) for r in ds.take_all()
    }
    rows = []
    for a, b in zip(cand["a"], cand["b"]):
        sa, sb = sh_map[a], sh_map[b]
        j = len(sa & sb) / max(1, len(sa | sb))
        if j >= threshold:
            rows.append((int(a), int(b), round(j, 6)))
    out = pd.DataFrame(rows, columns=["a", "b", "jaccard"])
    return out.sort_values(["a", "b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Distributed connected components (scale path for cluster assignment)
# ---------------------------------------------------------------------------


def connected_components_distributed(pairs: pd.DataFrame, all_ids: list[int]) -> pd.DataFrame:
    """Min-label propagation over the candidate-pair graph as Ray Data
    groupby rounds, with FULL path compression between rounds.

    Scale claim, stated precisely: the per-EDGE work (the dominant cost —
    candidate pair lists dwarf the node count) runs as a distributed
    groupby-min each round; the per-NODE label map lives on the driver
    (O(nodes) ints — fine up to billions of docs on a big driver; beyond
    that, labels become a Dataset joined per round). Iterates to an exact
    fixpoint — full compression makes each round collapse entire chains,
    so rounds ≈ O(log diameter); a hard cap raises instead of silently
    returning partial clusters. Returns (doc_id, cluster_rep).
    """
    import ray.data as _rd
    from ray.data.aggregate import Min as _Min

    label = {i: i for i in all_ids}
    if pairs.empty:
        return pd.DataFrame({"doc_id": sorted(all_ids), "cluster_rep": sorted(all_ids)})
    edges = pairs[["a", "b"]].to_numpy()

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
        nodes = np.concatenate([edges[:, 0], edges[:, 1], np.array(all_ids)])
        labels = np.concatenate([lb, la, np.array([label[i] for i in all_ids])])
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
            return pd.DataFrame(
                {"doc_id": sorted(all_ids), "cluster_rep": [label[i] for i in sorted(all_ids)]}
            )
    raise RuntimeError("connected components did not converge in 64 rounds")
