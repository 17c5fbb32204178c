"""Mergeable sketches for distributed approximate aggregation.

HyperLogLog (Flajolet et al. 2007, public algorithm) from scratch in numpy:
fixed 2^p registers, vectorized accumulate (one hash pass + one
``np.maximum.at`` per batch), exact merge = elementwise register max —
the associative/commutative property that makes it a map-side combinable
distributed aggregate. Standard error ≈ 1.04/√m (~1.6% at p=12).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

HLL_P = 12
HLL_M = 1 << HLL_P


def hll_empty() -> np.ndarray:
    return np.zeros(HLL_M, dtype=np.uint8)


def hll_accumulate(regs: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Fold a value array into the register set (vectorized)."""
    if len(values) == 0:
        return regs
    h = pd.util.hash_array(np.ascontiguousarray(values), categorize=False).astype(np.uint64)
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = (h << np.uint64(HLL_P)) | np.uint64((1 << HLL_P) - 1)  # sentinel low bits
    # rank = leading zeros of the remaining 64-p bits + 1
    nbits = 64 - HLL_P
    rank = np.ones(len(h), dtype=np.uint8)
    cur = rest
    for shift in (32, 16, 8, 4, 2, 1):
        if shift >= nbits:
            continue
        mask = cur < (np.uint64(1) << np.uint64(64 - shift))
        rank[mask] += shift
        with np.errstate(over="ignore"):
            cur = np.where(mask, cur << np.uint64(shift), cur)
    rank = np.minimum(rank, nbits + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> int:
    """Bias-corrected estimate with the standard small-range correction."""
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting
    return int(round(est))


# ---------------------------------------------------------------------------
# Count-Min Sketch (Cormode & Muthukrishnan 2005, public algorithm)
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1 << 13  # 8192 counters per row; ε ≈ e/8192 of the stream mass
_CMS_SEEDS = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
    dtype=np.uint64,
)


def cms_empty() -> np.ndarray:
    return np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)


def _cms_rows(keys: np.ndarray) -> np.ndarray:
    """(depth, n) column indices for string/object keys — one base hash
    pass, per-row seed remix (deterministic across processes)."""
    h = pd.util.hash_array(keys, categorize=False).astype(np.uint64)
    with np.errstate(over="ignore"):
        mixed = h[None, :] * _CMS_SEEDS[:, None]
    return ((mixed >> np.uint64(17)) % np.uint64(CMS_WIDTH)).astype(np.int64)


def cms_accumulate(cms: np.ndarray, keys: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Fold (key, count) pairs into the sketch (vectorized np.add.at)."""
    if len(keys) == 0:
        return cms
    idx = _cms_rows(keys)
    for d in range(CMS_DEPTH):
        np.add.at(cms[d], idx[d], counts)
    return cms


def cms_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a + b  # counters are linear — merge is elementwise sum


def cms_estimate(cms: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Point estimates (never under the true count) for the given keys."""
    if len(keys) == 0:
        return np.zeros(0, dtype=np.int64)
    idx = _cms_rows(keys)
    est = cms[0, idx[0]]
    for d in range(1, CMS_DEPTH):
        est = np.minimum(est, cms[d, idx[d]])
    return est


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970) — mergeable membership sketch
# ---------------------------------------------------------------------------

BLOOM_M = 1 << 16  # bits per filter (8 KB packed) — fixed so partials OR-merge
BLOOM_K = 4  # double-hashed probe count → fp ≈ (1-e^{-kn/m})^k


def _bloom_probes(keys: np.ndarray) -> "tuple[np.ndarray, np.ndarray]":
    """(n, BLOOM_K) bit indices for uint64 keys via Kirsch–Mitzenmacher
    double hashing; h2 forced odd so probes cycle the whole table."""
    x = np.ascontiguousarray(keys, dtype=np.uint64)
    h1 = pd.util.hash_array(x, categorize=False).astype(np.uint64)
    h2 = pd.util.hash_array(h1, categorize=False).astype(np.uint64) | np.uint64(1)
    i = np.arange(BLOOM_K, dtype=np.uint64)
    idx = (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(BLOOM_M)
    return (idx >> np.uint64(3)).astype(np.int64), (idx & np.uint64(7)).astype(np.uint8)


def bloom_empty() -> np.ndarray:
    return np.zeros(BLOOM_M // 8, dtype=np.uint8)


def bloom_add(bits: np.ndarray, keys: np.ndarray) -> np.ndarray:
    if len(keys):
        byte_idx, bit_idx = _bloom_probes(keys)
        np.bitwise_or.at(bits, byte_idx.ravel(), (np.uint8(1) << bit_idx).ravel())
    return bits


def bloom_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a | b


def bloom_might_contain(bits: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership: True = maybe present, False = DEFINITELY absent."""
    if not len(keys):
        return np.zeros(0, dtype=bool)
    byte_idx, bit_idx = _bloom_probes(keys)
    hit = (bits[byte_idx] >> bit_idx) & np.uint8(1)
    return hit.all(axis=1).astype(bool)


# ---------------------------------------------------------------------------
# DDSketch (Masson, Rim, Lee — VLDB 2019, public algorithm): mergeable
# quantile sketch with a RELATIVE-error guarantee. Log-γ bucket index
# per value; merge = add bucket counts (associative/commutative, so it is
# map-side combinable and bit-deterministic at any parallelism). Negative
# values go to a mirrored store; zeros to a scalar counter.
# ---------------------------------------------------------------------------

DD_ALPHA = 0.005  # guaranteed |q̂ − q| ≤ α·|q| per returned quantile
_DD_GAMMA = (1.0 + DD_ALPHA) / (1.0 - DD_ALPHA)
_DD_LOG_GAMMA = np.log(_DD_GAMMA)


def dd_empty() -> dict:
    """{bucket_index: count} for positives / negatives + zero count."""
    return {"pos": {}, "neg": {}, "zero": 0}


def _dd_indices(v: np.ndarray) -> np.ndarray:
    return np.ceil(np.log(v) / _DD_LOG_GAMMA).astype(np.int64)


def dd_accumulate(sk: dict, values: np.ndarray) -> dict:
    """Fold a float array into the sketch (vectorized bincount per sign)."""
    v = np.asarray(values, dtype=np.float64)
    sk["zero"] += int((v == 0.0).sum())
    for key, arr in (("pos", v[v > 0]), ("neg", -v[v < 0])):
        if len(arr) == 0:
            continue
        idx = _dd_indices(arr)
        store = sk[key]
        for i, c in zip(*np.unique(idx, return_counts=True)):
            store[int(i)] = store.get(int(i), 0) + int(c)
    return sk


def dd_merge(a: dict, b: dict) -> dict:
    out = {"pos": dict(a["pos"]), "neg": dict(a["neg"]), "zero": a["zero"] + b["zero"]}
    for key in ("pos", "neg"):
        store = out[key]
        for i, c in b[key].items():
            store[i] = store.get(i, 0) + c
    return out


def dd_count(sk: dict) -> int:
    return sk["zero"] + sum(sk["pos"].values()) + sum(sk["neg"].values())


def dd_quantile(sk: dict, q: float) -> float:
    """Approximate q-quantile (rank = floor(q·(n−1)), lower semantics):
    walk negatives ascending (most-negative first), then zeros, then
    positives ascending; return the bucket's γ-midpoint value."""
    n = dd_count(sk)
    if n == 0:
        raise ValueError("dd_quantile on an empty sketch")
    rank = int(np.floor(q * (n - 1)))
    seen = 0
    for i in sorted(sk["neg"], reverse=True):  # −γ^i: big i = most negative
        seen += sk["neg"][i]
        if seen > rank:
            return -2.0 * _DD_GAMMA ** i / (_DD_GAMMA + 1.0)
    seen += sk["zero"]
    if sk["zero"] and seen > rank:
        return 0.0
    for i in sorted(sk["pos"]):
        seen += sk["pos"][i]
        if seen > rank:
            return 2.0 * _DD_GAMMA ** i / (_DD_GAMMA + 1.0)
    raise AssertionError("rank walk exhausted the sketch")  # unreachable


def dd_serialize(sk: dict) -> bytes:
    """Compact wire form for shuffle partials: int64 triples array."""
    rows = [(0, 0, sk["zero"])]
    rows += [(1, i, c) for i, c in sorted(sk["pos"].items())]
    rows += [(-1, i, c) for i, c in sorted(sk["neg"].items())]
    return np.array(rows, dtype=np.int64).tobytes()


def dd_deserialize(buf: bytes) -> dict:
    arr = np.frombuffer(buf, dtype=np.int64).reshape(-1, 3)
    sk = dd_empty()
    for sign, i, c in arr:
        if sign == 0:
            sk["zero"] = int(c)
        elif sign == 1:
            sk["pos"][int(i)] = int(c)
        else:
            sk["neg"][int(i)] = int(c)
    return sk
