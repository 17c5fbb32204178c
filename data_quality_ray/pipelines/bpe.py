"""Distributed BPE tokenizer training over the documents corpus.

The missing piece between "corpus" and "model": learn the byte-pair-encoding
merge table (Sennrich et al. 2016, public) that a tokenizer ships with.

Scale shape — the two-grain trick every distributed BPE uses:
- CORPUS grain (the 100-TB part) is touched ONCE: whitespace word counting
  with per-block Counter combiners (the doc_top_terms Zipf discipline),
  reduced by one groupby. Everything after runs at VOCABULARY grain
  (distinct words), which is bounded (≪ corpus) and safe to keep as a
  materialized Dataset between rounds.
- Each merge round is: map_batches pair-count partials over the vocab
  Dataset → tiny groupby(pair) sum → driver picks ONE argmax (deterministic
  tie-break: count desc, then pair lexicographic) → broadcast the merge and
  rewrite symbol lists in a map. K rounds = K small shuffles over the vocab
  table only; the corpus is never re-read.

Determinism: word counts are exact, ties lexicographic, so the learned
merge sequence is identical at any parallelism — pytest pins it against a
from-scratch single-process reference (``bpe_reference``).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Sum

from data_quality_ray.functions import text as T

END_OF_WORD = "</w>"  # classic end-of-word marker so merges respect word ends
N_MERGES = 16


def _pq(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


# ---------------------------------------------------------------------------
# corpus-grain pass: exact word counts
# ---------------------------------------------------------------------------


def _word_counts(sf_dir: str) -> "rd.Dataset":
    def explode(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for x in t["text"].to_pylist():
            c.update(T.ws_tokens((x or "").lower()))
        if not c:
            return pa.table({"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        ws, ns = zip(*c.items())
        return pa.table({"word": pa.array(list(ws), pa.string()), "n": pa.array(list(ns), pa.int64())})

    return (
        rd.read_parquet(_pq(sf_dir, "documents"), columns=["text"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
    )


# ---------------------------------------------------------------------------
# vocabulary-grain rounds: pair counting + merge rewriting (both vectorized
# over the flattened symbol buffer, no per-word Python loop)
# ---------------------------------------------------------------------------


def _flat_symbols(t: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """list<string> symbols column → (flat symbol array, word offsets, counts)."""
    col = t["symbols"].combine_chunks() if isinstance(t["symbols"], pa.ChunkedArray) else t["symbols"]
    flat = np.asarray(col.flatten().to_pylist(), dtype=object)
    offsets = col.offsets.to_numpy()
    return flat, offsets, t["n"].to_numpy()


def pair_count_partial(t: pa.Table) -> pa.Table:
    flat, offsets, counts = _flat_symbols(t)
    if len(flat) == 0:
        return pa.table({"pair": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    n_sym = np.diff(offsets)
    # adjacent positions within the same word: every i with i+1 < word end
    word_of = np.repeat(np.arange(len(n_sym)), n_sym)
    valid = np.flatnonzero(word_of[:-1] == word_of[1:]) if len(flat) > 1 else np.array([], dtype=np.int64)
    if len(valid) == 0:
        return pa.table({"pair": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    # pair key "left\x1fright" (unit separator never occurs in tokens; NUL
    # would be stripped by numpy fixed-width unicode); weight = word count
    left = flat[valid]
    right = flat[valid + 1]
    pairs = np.char.add(np.char.add(left.astype(str), "\x1f"), right.astype(str))
    w = counts[word_of[valid]]
    df = pd.DataFrame({"pair": pairs, "n": w}).groupby("pair", as_index=False)["n"].sum()
    return pa.table({"pair": pa.array(df["pair"], pa.string()), "n": pa.array(df["n"].to_numpy(), pa.int64())})


def _apply_merge(t: pa.Table, a: str, b: str) -> pa.Table:
    flat, offsets, counts = _flat_symbols(t)
    if len(flat) == 0:
        return t
    n_sym = np.diff(offsets)
    word_of = np.repeat(np.arange(len(n_sym)), n_sym)
    cand = np.zeros(len(flat), dtype=bool)
    if len(flat) > 1:
        cand[:-1] = (flat[:-1] == a) & (flat[1:] == b) & (word_of[:-1] == word_of[1:])
    idx = np.flatnonzero(cand)
    # leftmost-first greedy: drop candidates overlapping an accepted one
    keep = []
    last = -2
    for i in idx:  # bounded by match count, not vocab size
        if i > last + 1:
            keep.append(i)
            last = i
    if not keep:
        return t
    merged_at = np.array(keep, dtype=np.int64)
    flat = flat.copy()
    flat[merged_at] = a + b
    drop = np.zeros(len(flat), dtype=bool)
    drop[merged_at + 1] = True
    new_flat = flat[~drop]
    removed_per_word = np.bincount(word_of[merged_at + 1], minlength=len(n_sym))
    new_n_sym = n_sym - removed_per_word
    new_offsets = np.concatenate(([0], np.cumsum(new_n_sym)))
    sym_col = pa.ListArray.from_arrays(
        pa.array(new_offsets, pa.int32()), pa.array(new_flat.tolist(), pa.string())
    )
    return pa.table({"word": t["word"], "n": pa.array(counts, pa.int64()), "symbols": sym_col})


def train_bpe_merges(sf_dir: str, n_merges: int = N_MERGES) -> pd.DataFrame:
    """Learn the first ``n_merges`` BPE merges; returns (rank, left, right,
    pair_count) — the tokenizer's merge table, deterministic at any
    parallelism."""
    merges, _ = _train(sf_dir, n_merges)
    return merges


def _train(sf_dir: str, n_merges: int) -> "tuple[pd.DataFrame, rd.Dataset]":
    """Internal: returns (merge table, final vocab Dataset with merged
    symbol lists) so appliers can reuse the trained state."""

    def to_symbols(t: pa.Table) -> pa.Table:
        words = t["word"].to_pylist()
        syms = [list(w) + [END_OF_WORD] for w in words]
        return pa.table(
            {"word": t["word"], "n": t["n"],
             "symbols": pa.array(syms, pa.list_(pa.string()))}
        )

    # vocab-grain Dataset, bounded size — materialized between rounds so the
    # per-round lineage stays one map deep (documented scale contract)
    vocab = _word_counts(sf_dir).map_batches(to_symbols, batch_format="pyarrow").materialize()

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        # block partials merged on the driver: the pair table is bounded by
        # distinct-pairs × n_blocks (vocab grain, ≪ corpus), so a driver
        # reduce replaces a per-round shuffle — 16 rounds, 16 shuffles saved
        parts = vocab.map_batches(pair_count_partial, batch_format="pyarrow").to_pandas()
        if parts.empty:
            break
        pc_ds = parts.groupby("pair", as_index=False)["n"].sum()
        # deterministic argmax: count desc, then pair lexicographic
        pc_ds = pc_ds.sort_values(["n", "pair"], ascending=[False, True], kind="mergesort")
        best, cnt = pc_ds.iloc[0]["pair"], int(pc_ds.iloc[0]["n"])
        a, b = best.split("\x1f", 1)
        merges.append((rank, a, b, cnt))
        vocab = vocab.map_batches(
            lambda t, a=a, b=b: _apply_merge(t, a, b), batch_format="pyarrow"
        ).materialize()
    return (
        pd.DataFrame(merges, columns=["rank", "left", "right", "pair_count"]).astype(
            {"rank": "int64", "pair_count": "int64"}
        ),
        vocab,
    )


def bpe_token_counts(sf_dir: str, n_merges: int = N_MERGES) -> pd.DataFrame:
    """Apply the trained merges back to the corpus: per-document BPE token
    counts (doc_id, n_words, n_bpe_tokens) — the "how many tokens is my
    corpus" accounting every training run starts with.

    The trained vocab is ALREADY the full apply table: every distinct word's
    final symbol list. Broadcast {word: n_tokens} (vocab-grain, bounded)
    and the corpus pass is one Counter-lookup map — the corpus is read once
    for training and once for applying, never shuffled."""
    import ray

    _, vocab = _train(sf_dir, n_merges)
    wlen = {
        w: len(s)
        for w, s in zip(
            *(lambda df: (df["word"], df["symbols"]))(vocab.to_pandas())
        )
    }
    wref = ray.put(wlen)

    def count_tokens(t: pa.Table) -> pa.Table:
        wl = ray.get(wref)
        n_words = np.empty(t.num_rows, dtype=np.int64)
        n_tok = np.empty(t.num_rows, dtype=np.int64)
        for i, x in enumerate(t["text"].to_pylist()):
            toks = T.ws_tokens((x or "").lower())
            n_words[i] = len(toks)
            n_tok[i] = sum(wl[w] for w in toks)
        return pa.table(
            {"doc_id": t["doc_id"], "n_words": pa.array(n_words), "n_bpe_tokens": pa.array(n_tok)}
        )

    out = (
        rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "text"])
        .map_batches(count_tokens, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# single-process reference (the no-Ray parity gate)
# ---------------------------------------------------------------------------


def bpe_reference(texts: list[str], n_merges: int = N_MERGES) -> pd.DataFrame:
    """From-scratch sequential BPE with the same tie-break; used by tests to
    pin the distributed trainer's merge sequence exactly."""
    from collections import Counter

    wc: Counter = Counter()
    for x in texts:
        wc.update(T.ws_tokens((x or "").lower()))
    vocab = {w: list(w) + [END_OF_WORD] for w in wc}
    merges = []
    for rank in range(n_merges):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            n = wc[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += n
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append((rank, a, b, cnt))
        for w, syms in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return pd.DataFrame(merges, columns=["rank", "left", "right", "pair_count"]).astype(
        {"rank": "int64", "pair_count": "int64"}
    )
