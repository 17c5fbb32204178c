"""Benchmark n-gram decontamination over the documents corpus.

The standard LLM training-data hygiene step (GPT-3 appendix C / PaLM §6
style): given a BENCHMARK set of short eval items, flag every training
document that contains any benchmark word n-gram, so eval questions can be
removed from (or at least accounted for in) the training corpus. The
reference has no such operator (its scope is per-record scoring,
annotator_agreement/core.py); this is a graft-added first-class op.

Benchmark synthesis (deterministic, no external data): items are a fixed
token SLICE (tokens ``ITEM_OFF .. ITEM_OFF+ITEM_LEN``) of every document
whose ``doc_id % BENCH_MOD == 0`` — a stand-in for an external eval file
with the useful property that the slice's source document is guaranteed
contaminated, so the op always has non-trivial output at any sf.

Scale shape:
- The benchmark n-gram set is built DISTRIBUTED (map_batches over the
  benchmark rows only — a pruned row filter) and collected to the driver:
  real benchmark suites are tiny next to a 100-TB corpus (≤ millions of
  n-grams), the canonical broadcast-small-side case. It ships to workers
  once via ``ray.put``; were the set ever too large to broadcast, the same
  result is a hash-partitioned join of (gram → doc) rows against the
  benchmark grams — the machinery pipelines/dedup.py already uses.
- The corpus scan is one ``map_batches`` pass; each doc intersects its
  DISTINCT gram set against the broadcast frozenset (C-level set ops) and
  emits at most one row. No shuffle at all.

Oracle: every constant (n, mod, slice) parameterizes both the pipeline and
:func:`decontam_sql` — they can never drift apart (round-2 invariant).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from data_quality_ray.functions import text as T

NGRAM_N = 8  # PaLM-style 8-gram overlap
BENCH_MOD = 25  # doc_id % BENCH_MOD == 0 → contributes a benchmark item
ITEM_OFF = 2  # 0-based token offset of the item slice
ITEM_LEN = 16  # tokens per benchmark item


def _norm_tokens(text: str) -> list[str]:
    """lower → trim → whitespace-collapse → split (same normalization the
    jaccard/minhash family and its SQL use: dedup.py _GRAMS_PREFIX_SQL)."""
    return T.ws_tokens((text or "").lower())


def _doc_grams(tk: "list[str]", n: int) -> set[str]:
    return {" ".join(tk[i : i + n]) for i in range(len(tk) - n + 1)}


def benchmark_ngrams(
    docs: "rd.Dataset",
    n: int = NGRAM_N,
    bench_mod: int = BENCH_MOD,
    item_off: int = ITEM_OFF,
    item_len: int = ITEM_LEN,
) -> "set[str]":
    """Distinct n-grams of all benchmark items, built distributed.

    Only benchmark rows (``doc_id % bench_mod == 0``) are tokenized; the
    per-batch partial is already a DISTINCT set, so the driver union is
    bounded by the true benchmark gram count (small by definition)."""

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        keep = ids % bench_mod == 0
        grams: set[str] = set()
        for x in t.filter(pa.array(keep))["text"].to_pylist():
            tk = _norm_tokens(x)[item_off : item_off + item_len]
            if len(tk) >= n:
                grams |= _doc_grams(tk, n)
        return pa.table({"gram": pa.array(sorted(grams), pa.string())})

    parts = docs.map_batches(partial, batch_format="pyarrow").take_all()
    return {r["gram"] for r in parts}


def doc_decontaminate(sf_dir: str) -> pd.DataFrame:
    """(doc_id, n_hits) for every document sharing ≥1 word ``NGRAM_N``-gram
    with the benchmark set; ``n_hits`` = DISTINCT shared grams (int64)."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    bench = benchmark_ngrams(docs)
    bench_ref = ray.put(frozenset(bench))

    def scan(t: pa.Table) -> pa.Table:
        bset = ray.get(bench_ref)
        ids_out, hits_out = [], []
        ids = t["doc_id"].to_numpy()
        for i, x in enumerate(t["text"].to_pylist()):
            tk = _norm_tokens(x)
            if len(tk) < NGRAM_N:
                continue
            h = len(_doc_grams(tk, NGRAM_N) & bset)
            if h:
                ids_out.append(int(ids[i]))
                hits_out.append(h)
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "n_hits": pa.array(hits_out, pa.int64()),
            }
        )

    out = docs.map_batches(scan, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def decontam_sql(
    n: int = NGRAM_N,
    bench_mod: int = BENCH_MOD,
    item_off: int = ITEM_OFF,
    item_len: int = ITEM_LEN,
) -> str:
    # DuckDB list slices are 1-based inclusive: python tk[off:off+L] is
    # tk[off+1 : off+L]; gram btk[i:i+n-1] spans n tokens.
    lo, hi = item_off + 1, item_off + item_len
    return rf"""
WITH toks AS (
  SELECT doc_id,
         string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS tk
  FROM documents WHERE trim(text) != ''
),
bench_items AS (
  SELECT tk[{lo}:{hi}] AS btk FROM toks WHERE doc_id % {bench_mod} = 0
),
bench AS (
  SELECT DISTINCT unnest([array_to_string(btk[i:i+{n - 1}], ' ')
                          FOR i IN range(1, len(btk) - {n - 2})]) AS gram
  FROM bench_items WHERE len(btk) >= {n}
),
grams AS (
  SELECT doc_id,
         unnest(list_distinct([array_to_string(tk[i:i+{n - 1}], ' ')
                               FOR i IN range(1, len(tk) - {n - 2})])) AS gram
  FROM toks WHERE len(tk) >= {n}
)
SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM grams g JOIN bench b USING (gram)
GROUP BY g.doc_id
ORDER BY doc_id
"""


DOC_DECONTAMINATE_SQL = decontam_sql()
