"""Training-data operators over the ``documents`` table: text analysis,
fingerprinting, scrubbing and language-ID at corpus grain.

The documents table stands in for transcript-like text (FIXTURES.md §4);
these stages are the same kernels the clip pipeline uses, exposed as
standalone corpus operators with DuckDB oracles where SQL can express them.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from data_quality_ray import config
from data_quality_ray.functions import models
from data_quality_ray.functions import text as T


def _docs(sf_dir: str, columns=None) -> "rd.Dataset":
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


# ---------------------------------------------------------------------------
# Token / char statistics (whitespace + BPE-ish regex token counting)
# ---------------------------------------------------------------------------


def doc_token_stats(sf_dir: str) -> pd.DataFrame:
    """Per-document token counts: whitespace tokens, BPE-ish pieces, chars."""

    def stats(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n_ws = [len(T.ws_tokens(x)) for x in texts]
        n_bpe = [len(T.bpe_tokens(x)) for x in texts]
        n_chars = [len(x) for x in texts]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_ws_tokens": pa.array(n_ws, pa.int64()),
                "n_bpe_tokens": pa.array(n_bpe, pa.int64()),
                "n_chars_actual": pa.array(n_chars, pa.int64()),
            }
        )

    out = _docs(sf_dir, ["doc_id", "text"]).map_batches(stats, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


DOC_TOKEN_STATS_SQL = r"""
SELECT doc_id,
       len(regexp_extract_all(text, '\S+'))  AS n_ws_tokens,
       len(regexp_extract_all(text, '[A-Za-zÀ-ÿ]+|[0-9]+|[^\sA-Za-zÀ-ÿ0-9]+')) AS n_bpe_tokens,
       length(text) AS n_chars_actual
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Document fingerprint (normalized md5) — exact-dedup key
# ---------------------------------------------------------------------------


def doc_fingerprint(sf_dir: str) -> pd.DataFrame:
    """md5 fingerprint of the whitespace/case-normalized text."""
    import hashlib

    def fp(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        norm = [T.normalize_for_fingerprint(x) for x in texts]
        h = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in norm]
        return pa.table({"doc_id": t["doc_id"], "fingerprint": pa.array(h, pa.string())})

    out = _docs(sf_dir, ["doc_id", "text"]).map_batches(fp, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


DOC_FINGERPRINT_SQL = r"""
SELECT doc_id,
       md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Scrub at corpus grain (regex parity check incl. non-matches)
# ---------------------------------------------------------------------------


def doc_scrub(sf_dir: str) -> pd.DataFrame:
    from data_quality_ray.stages.scrub import scrub_batch

    def apply(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["doc_id", "transcript"])
        out = scrub_batch(t)
        return pa.table(
            {
                "doc_id": out["doc_id"],
                "text_scrubbed": out["transcript_scrubbed"],
                "had_pii": out["had_pii"],
                "had_tox": out["had_tox"],
            }
        )

    out = _docs(sf_dir, ["doc_id", "text"]).map_batches(apply, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_scrub_sql() -> str:
    scrub = T.scrub_sql_expr("text")
    email, phone, sid = (T.SCRUB_RULES[i][3] for i in range(3))
    tox = T.SCRUB_RULES[3][3]
    # had_tox must be evaluated on the POST-PII-scrub text, exactly like
    # scrub_one (a toxic substring inside an email/phone span is consumed
    # by the PII mask first and must not count)
    pii_scrubbed = "text"
    for _, _, mask, pat in T.SCRUB_RULES[:3]:
        pii_scrubbed = f"regexp_replace({pii_scrubbed}, '{pat}', '{mask}', 'g')"
    return f"""
SELECT doc_id,
       {scrub} AS text_scrubbed,
       (regexp_matches(text, '{email}') OR regexp_matches(text, '{phone}')
        OR regexp_matches(text, '{sid}'))                AS had_pii,
       regexp_matches({pii_scrubbed}, '(?i){tox}')       AS had_tox
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Quality flags at corpus grain (SQL-expressible subset)
# ---------------------------------------------------------------------------


def doc_quality_flags(sf_dir: str) -> pd.DataFrame:
    """Symbol-density + length flags per document (SQL-checkable rules)."""

    def flags(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        sym = T.symbol_counts(texts)
        n_chars = np.array([len(x) for x in texts], dtype=np.int64)
        # flag uses the same float expression as the SQL oracle
        # (sym > 0.40 * n), not sym/n > 0.40, to avoid boundary disagreement
        flag_sym = np.where(n_chars > 0, sym > config.SYM_MAX * n_chars, True)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "sym_chars": pa.array(sym, pa.int64()),
                "flag_sym": pa.array(flag_sym),
                "flag_short": pa.array(n_chars < 64),
            }
        )

    out = _docs(sf_dir, ["doc_id", "text"]).map_batches(flags, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


DOC_QUALITY_FLAGS_SQL = r"""
WITH m AS (
  SELECT doc_id,
         length(text) AS n,
         length(regexp_replace(text, '[0-9A-Za-zÀ-ÿ\s]', '', 'g'))
           + length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS sym_chars
  FROM documents
)
SELECT doc_id, sym_chars,
       CASE WHEN n > 0 THEN sym_chars > 0.40 * n ELSE TRUE END AS flag_sym,
       n < 64 AS flag_short
FROM m ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Language-ID over the corpus (model-based — rows-only driver check)
# ---------------------------------------------------------------------------


def doc_langid(sf_dir: str) -> pd.DataFrame:
    """Predicted language + confidence per document (hashed-trigram NB),
    run as the documented stateful actor-pool stage (stages/langid.py)."""
    from data_quality_ray.stages.langid import LangIdStage

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(
            LangIdStage,
            fn_constructor_kwargs={"column": "text"},
            batch_format="pyarrow",
            concurrency=config.actor_pool_bounds(),
        )
        .select_columns(["doc_id", "lang", "lang_conf"])
        .to_pandas()
    )
    out["lang_conf"] = out["lang_conf"].round(4)
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_ppl(sf_dir: str) -> pd.DataFrame:
    """LM perplexity per document (rows-only check)."""

    def ppl(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "ppl": pa.array(np.round(models.ppl_scores(t["text"]), 4), pa.float64()),
            }
        )

    out = _docs(sf_dir, ["doc_id", "text"]).map_batches(ppl, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Token explode → salted count → top-k terms (flat-map + skewed aggregate)
# ---------------------------------------------------------------------------


def doc_top_terms(sf_dir: str, k: int = 25) -> pd.DataFrame:
    """Top-k most frequent whitespace tokens across the corpus.

    Flat-map shape (output rows ≫ input rows): each batch explodes to one
    row per token with a PER-BATCH combiner (token partial counts), so the
    shuffle moves one row per distinct token per batch, not one per token
    occurrence — the natural-language Zipf skew ('the' everywhere) is
    flattened by the combine before it can hot-spot a reducer.
    Ties broken lexicographically.
    """
    from ray.data.aggregate import Sum as _Sum

    def explode_count(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for x in t["text"].to_pylist():
            c.update(T.ws_tokens((x or "").lower()))
        if not c:
            return pa.table({"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        toks, ns = zip(*c.items())
        return pa.table({"token": pa.array(list(toks), pa.string()), "n": pa.array(list(ns), pa.int64())})

    agg = (
        _docs(sf_dir, ["text"])
        .map_batches(explode_count, batch_format="pyarrow")
        .groupby("token")
        .aggregate(_Sum("n", alias_name="n"))
    )
    top = agg.sort(["n", "token"], descending=[True, False]).limit(k).to_pandas()
    return top[["token", "n"]].reset_index(drop=True)


DOC_TOP_TERMS_SQL = r"""
SELECT token, count(*) AS n
FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
      FROM documents WHERE trim(text) != '')
GROUP BY token
ORDER BY n DESC, token
LIMIT 25
"""


# ---------------------------------------------------------------------------
# Length histogram (bucketed aggregate)
# ---------------------------------------------------------------------------


def doc_length_histogram(sf_dir: str, bucket_chars: int = 64) -> pd.DataFrame:
    """Histogram of document lengths in fixed-width buckets."""
    from ray.data.aggregate import Sum as _Sum

    def bucketize(t: pa.Table) -> pa.Table:
        import pandas as _pd

        n = np.asarray([len(x) for x in t["text"].to_pylist()], dtype=np.int64)
        df = _pd.DataFrame({"bucket_lo": (n // bucket_chars) * bucket_chars})
        g = df.groupby("bucket_lo", as_index=False).size().rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        _docs(sf_dir, ["text"])
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket_lo")
        .aggregate(_Sum("n", alias_name="n_docs"))
        .to_pandas()
    )
    return out.sort_values("bucket_lo").reset_index(drop=True)


DOC_LENGTH_HISTOGRAM_SQL = """
SELECT (length(text) // 64) * 64 AS bucket_lo, count(*) AS n_docs
FROM documents GROUP BY 1 ORDER BY bucket_lo
"""


# ---------------------------------------------------------------------------
# Distributed n-gram LM training (mergeable-sketch shape)
# ---------------------------------------------------------------------------


def train_char_lm_counts(sf_dir: str, table_bits: int = 16) -> pd.DataFrame:
    """Train a hashed char-trigram count table over the corpus, distributed.

    The 'sketch' pattern: each batch emits ONE partial count table
    (fixed-size dense vector — mergeable by addition), a tiny groupby-free
    reduction sums them on the driver. The result is exactly the model
    artifact NgramLM consumes. Returns the nonzero (bucket, count) rows.
    """
    size = 1 << table_bits

    def partial(t: pa.Table) -> pa.Table:
        from data_quality_ray.functions.models import _trigram_ids_bytes

        counts = np.zeros(size, dtype=np.int64)
        for x in t["text"].to_pylist():
            b = np.frombuffer((" " + (x or "").lower() + " ").encode(), dtype=np.uint8)
            ids = _trigram_ids_bytes(b) % size  # fold the 2^16 id space into this table
            if len(ids):
                counts += np.bincount(ids, minlength=size)
        return pa.table({"counts": pa.array([counts.tolist()], pa.list_(pa.int64()))})

    parts = _docs(sf_dir, ["text"]).map_batches(partial, batch_format="pyarrow").to_pandas()
    total = np.zeros(size, dtype=np.int64)
    for row in parts["counts"]:
        total += np.asarray(row, dtype=np.int64)
    nz = np.nonzero(total)[0]
    return pd.DataFrame({"bucket": nz.astype(np.int64), "count": total[nz]})


# The trigram id is pure byte arithmetic over the UTF-8 encoding
# (((b0*31 + b1)*31 + b2) % 65536, functions/models.py:_trigram_ids_bytes),
# so the TRAINED MODEL ARTIFACT itself is SQL-oracle-checkable: DuckDB
# re-derives every byte via hex(encode(...)) pairs.
#
# Scope note: Python str.lower() applies FULL Unicode case mapping while
# DuckDB lower() applies the simple mapping — they differ only on a handful
# of codepoints (e.g. U+0130 'İ' → 'i̇' vs 'i'). The corpora contain none of
# these, so the hash match is exact here; a corpus that does contain them
# needs an ICU-collated oracle (or ASCII-scoped lowering on both sides).
TRAIN_CHAR_LM_COUNTS_SQL = r"""
WITH enc AS (
  SELECT hex(encode(' ' || lower(text) || ' ')) AS hx,
         octet_length(encode(' ' || lower(text) || ' ')) AS nb
  FROM documents
),
tg AS (
  SELECT unnest([
      ((CAST(('0x' || substr(hx, 2*i - 1, 2)) AS BIGINT) * 31
        + CAST(('0x' || substr(hx, 2*i + 1, 2)) AS BIGINT)) * 31
        + CAST(('0x' || substr(hx, 2*i + 3, 2)) AS BIGINT)) % 65536
      FOR i IN range(1, nb - 1)]) AS bucket
  FROM enc WHERE nb >= 3
)
SELECT bucket, CAST(count(*) AS BIGINT) AS count
FROM tg GROUP BY bucket ORDER BY bucket
"""


def doc_top_terms_cms(sf_dir: str, k: int = 25, candidates_per_block: int = 200) -> pd.DataFrame:
    """Approximate heavy hitters via a Count-Min Sketch — the bounded-state
    alternative to ``doc_top_terms`` for streams whose distinct-token count
    dwarfs memory.

    Per block: ONE (depth × width) counter partial (256 KB, linear-merge)
    plus its local top candidate tokens — block size of state, independent
    of vocabulary. Two-level reduce (hash-partitioned merge, then ≤8
    partials on the driver); final counts are sketch point estimates
    (never under the truth) for the candidate union. Rows-only by design —
    the exact counterpart ``doc_top_terms`` is the SQL-checked one.
    """
    from data_quality_ray.functions import sketches as sk

    out_schema = pa.schema([("cms", pa.binary()), ("cand", pa.list_(pa.string()))])

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: "Counter[str]" = Counter()
        for x in t["text"].to_pylist():
            c.update(T.ws_tokens((x or "").lower()))
        if not c:
            return out_schema.empty_table()
        toks = np.asarray(list(c.keys()), dtype=object)
        ns = np.asarray(list(c.values()), dtype=np.int64)
        cms = sk.cms_accumulate(sk.cms_empty(), toks, ns)
        top = toks[np.argsort(-ns, kind="stable")[:candidates_per_block]]
        return pa.table(
            {
                "cms": pa.array([cms.tobytes()], pa.binary()),
                "cand": pa.array([[str(x) for x in top]], pa.list_(pa.string())),
            }
        )

    def add_pkey(t: pa.Table) -> pa.Table:
        import hashlib as _hl

        pk = [
            int(_hl.blake2b(b, digest_size=2).hexdigest(), 16) % 8
            for b in t["cms"].to_pylist()
        ]
        return t.append_column("pkey", pa.array(pk, pa.int64()))

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        acc = sk.cms_empty()
        cand: set[str] = set()
        for buf, cl in zip(g["cms"], g["cand"]):
            acc = sk.cms_merge(acc, np.frombuffer(buf, dtype=np.int64).reshape(acc.shape))
            cand.update(cl)
        return pd.DataFrame({"cms": [acc.tobytes()], "cand": [sorted(cand)]})

    parts = (
        _docs(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(add_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(merge_group, batch_format="pandas")
        .to_pandas()
    )
    acc = sk.cms_empty()
    cand: set[str] = set()
    for buf, cl in zip(parts["cms"], parts["cand"]):
        acc = sk.cms_merge(acc, np.frombuffer(buf, dtype=np.int64).reshape(acc.shape))
        cand.update(cl)
    toks = np.asarray(sorted(cand), dtype=object)
    est = sk.cms_estimate(acc, toks)
    order = np.lexsort((toks, -est))[:k]
    return pd.DataFrame(
        {"token": toks[order].astype(str), "n_est": est[order].astype(np.int64)}
    ).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Composed text-corpus flagship: the clip pipeline's shape over documents
# ---------------------------------------------------------------------------


def annotate_documents(ds: "rd.Dataset") -> "rd.Dataset":
    """Document-corpus annotation DAG — the text twin of the clip flagship
    (``pipelines.quality.annotate``), sharing its kernels end-to-end:

        scrub (PII/toxicity rewrite) → langid actor pool → perplexity +
        heuristic rules (symbol density, length, repetition) →
        decision (same agreement kernel / buckets) → hash split

    Emits the same lineage-contract columns as the clip DAG (lang, split,
    keep, ppl, quality_score, bucket, transcript_scrubbed) keyed by
    doc_id, so the checkpointed runner applies unchanged.
    """
    from data_quality_ray.stages.decision import decision_batch
    from data_quality_ray.stages.langid import LangIdStage
    from data_quality_ray.stages.scrub import scrub_batch
    from data_quality_ray.stages.split import split_batch

    pool = config.actor_pool_bounds()

    def prep(t: pa.Table) -> pa.Table:
        # text → transcript: the clip kernels' input contract
        return pa.table({"doc_id": t["doc_id"], "transcript": t["text"]})

    ds = ds.map_batches(prep, batch_format="pyarrow")
    ds = ds.map_batches(scrub_batch, batch_format="pyarrow")
    ds = ds.map_batches(
        LangIdStage,
        fn_constructor_kwargs={"column": "transcript_scrubbed"},
        batch_format="pyarrow",
        concurrency=pool,
    )

    def ppl_rules(t: pa.Table) -> pa.Table:
        # SAME rule kernels as stages/rules.py (repetition_ratio handles
        # short texts identically to the clip DAG); only the length rule
        # differs by construction — documents have no duration, so "len"
        # is a plain minimum character count
        texts = t["transcript_scrubbed"].to_pylist()
        ppl = np.asarray(models.ppl_scores(t["transcript_scrubbed"]), dtype=np.float64)
        rep = T.repetition_ratio(texts)
        sym = T.symbol_density(texts)
        n_chars = T.char_lengths(texts)
        flag_rep = rep > config.REP_MAX
        flag_sym = sym > config.SYM_MAX
        flag_len = n_chars < 64
        flags: list[list[str]] = []
        for i in range(t.num_rows):
            f = []
            if flag_rep[i]:
                f.append("rep")
            if flag_sym[i]:
                f.append("sym")
            if flag_len[i]:
                f.append("len")
            flags.append(f)
        return (
            t.append_column("ppl", pa.array(ppl, pa.float64()))
            .append_column("rule_flags", pa.array(flags, pa.list_(pa.string())))
            .append_column("decode_ok", pa.array(np.ones(t.num_rows, dtype=bool)))
        )

    ds = ds.map_batches(ppl_rules, batch_format="pyarrow")
    ds = ds.map_batches(decision_batch, batch_format="pyarrow")
    return ds.map_batches(
        split_batch, fn_kwargs={"key": "doc_id"}, batch_format="pyarrow"
    )


DOC_OUTPUT_COLUMNS = [
    "doc_id", "transcript_scrubbed", "had_pii", "had_tox", "lang",
    "lang_conf", "ppl", "quality_score", "keep", "bucket", "split",
]


def run_document_pipeline(
    input_dir: str,
    out_dir: str,
    *,
    n_partitions: int = 4,
    resume: bool = True,
    kept_only: bool = False,
) -> dict:
    """Checkpointed, resumable document-corpus quality pipeline — the
    text-table counterpart of ``quality.run_checkpointed`` (same atomic
    per-partition commit + lineage engine, parameterized by the document
    DAG)."""
    from data_quality_ray.pipelines.quality import run_checkpointed

    return run_checkpointed(
        input_dir,
        out_dir,
        n_partitions=n_partitions,
        resume=resume,
        kept_only=kept_only,
        annotate_fn=annotate_documents,
        output_columns=DOC_OUTPUT_COLUMNS,
        id_column="doc_id",
    )


def document_pipeline(sf_dir: str) -> pd.DataFrame:
    """Query-shaped entry: full document annotation (rows-only — langid
    and perplexity are model stages; the SQL-reachable pieces are
    separately green as doc_scrub / doc_quality_flags / doc_split)."""
    out = (
        annotate_documents(_docs(sf_dir, ["doc_id", "text"]))
        .select_columns(["doc_id", "lang", "split", "keep", "bucket", "quality_score"])
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)



# ---------------------------------------------------------------------------
# Distributed linear-model training via exact sufficient statistics
# ---------------------------------------------------------------------------

# Long-format term names for the normal-equation sums of the linear model
# n_chars ~ b0 + b1 * n_ws_tokens (the chars-per-token fit — a corpus-level
# quality signal; residual outliers are symbol-/boilerplate-heavy docs).
_REG_TERMS = ["n", "sum_ws", "sum_ws_ws", "sum_y", "sum_ws_y", "sum_y_y"]


def train_quality_reg_stats(sf_dir: str) -> pd.DataFrame:
    """Exact sufficient statistics (X'X, X'y, y'y) for the linear model
    predicting char count from whitespace-token count — distributed model
    training as map-side integer partial sums + one tiny reduce, the same
    mergeable-sketch shape as ``train_char_lm_counts``.

    Both counts are integers (the same regexp-derived values the
    ``doc_token_stats`` oracle checks), so every sum is exact and
    order-independent — the full training artifact is SQL-hash-checkable.
    Bound: per-doc products ≤ ~1e8 (chars ≤ 1e4); int64 partial sums are
    exact to ~9e10 docs per cross term, far beyond any one corpus shard;
    DuckDB's HUGEINT promotion never diverges inside that bound.
    """

    def partial(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        ws = np.array([len(T.ws_tokens(x)) for x in texts], dtype=np.int64)
        y = np.array([len(x) for x in texts], dtype=np.int64)
        sums = [
            len(texts), ws.sum(), (ws * ws).sum(),
            y.sum(), (ws * y).sum(), (y * y).sum(),
        ]
        return pa.table(
            {k: pa.array([int(v)], pa.int64()) for k, v in zip(_REG_TERMS, sums)}
        )

    ds = _docs(sf_dir, ["text"]).map_batches(partial, batch_format="pyarrow")
    totals = ds.sum(on=_REG_TERMS)  # distributed reduce of 6 scalars
    out = pd.DataFrame(
        {"term": _REG_TERMS, "value": [int(totals[f"sum({k})"]) for k in _REG_TERMS]}
    )
    return out.sort_values("term").reset_index(drop=True)


def quality_regression_coeffs(sf_dir: str) -> "tuple[np.ndarray, float]":
    """(coefficients [b0, b1], R²) solved from the distributed sufficient
    stats — the driver-side step is a 2×2 solve, independent of corpus
    size."""
    df = train_quality_reg_stats(sf_dir)
    s = {k: float(v) for k, v in zip(df["term"], df["value"])}
    xtx = np.array(
        [[s["n"], s["sum_ws"]], [s["sum_ws"], s["sum_ws_ws"]]], dtype=np.float64
    )
    xty = np.array([s["sum_y"], s["sum_ws_y"]], dtype=np.float64)
    beta = np.linalg.solve(xtx, xty)
    ss_tot = s["sum_y_y"] - s["sum_y"] ** 2 / s["n"]
    ss_res = s["sum_y_y"] - beta @ xty
    return beta, 1.0 - ss_res / ss_tot


def doc_reg_by_lang(sf_dir: str) -> pd.DataFrame:
    """Per-LANGUAGE linear fit chars ~ b0 + b1·ws_tokens — grouped
    distributed model training: each batch emits per-lang integer
    sufficient-stat partials (map-side combine at language grain), ONE
    tiny ``groupby(lang).aggregate(Sum×5)`` merges them, and the 2×2
    closed form runs once per language on exact integers. Both sides
    evaluate the identical double expression, so b0/b1 hash-match the
    oracle at any parallelism (the per-group extension of
    ``train_quality_reg_stats``; same ≤1e8-per-doc-product int64 bound)."""
    from ray.data.aggregate import Sum as _Sum

    def partial(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        ws = np.array([len(T.ws_tokens(x)) for x in texts], dtype=np.int64)
        y = np.array([len(x) for x in texts], dtype=np.int64)
        df = pd.DataFrame(
            {"lang": t["lang"].to_pylist(), "n": 1, "sx": ws, "sxx": ws * ws,
             "sy": y, "sxy": ws * y}
        )
        g = df.groupby("lang", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    s = (
        _docs(sf_dir, ["lang", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            _Sum("n", alias_name="n"),
            _Sum("sx", alias_name="sx"),
            _Sum("sxx", alias_name="sxx"),
            _Sum("sy", alias_name="sy"),
            _Sum("sxy", alias_name="sxy"),
        )
        .to_pandas()
    )
    n = s["n"].to_numpy().astype(np.float64)
    sx = s["sx"].to_numpy().astype(np.float64)
    sxx = s["sxx"].to_numpy().astype(np.float64)
    sy = s["sy"].to_numpy().astype(np.float64)
    sxy = s["sxy"].to_numpy().astype(np.float64)
    denom = n * sxx - sx * sx
    if (denom == 0).any():
        bad = s["lang"].to_numpy()[denom == 0]
        raise ValueError(
            f"doc_reg_by_lang: degenerate group(s) {bad.tolist()} — every doc "
            "has the same token count, slope undefined (explicit guard; "
            "numpy inf/nan would diverge from DuckDB's division semantics)"
        )
    b1 = (n * sxy - sx * sy) / denom
    b0 = (sy - b1 * sx) / n
    out = pd.DataFrame(
        {"lang": s["lang"], "n_docs": s["n"].astype(np.int64), "b1": b1, "b0": b0}
    )
    return out.sort_values("lang").reset_index(drop=True)


DOC_REG_BY_LANG_SQL = r"""
WITH f AS (
  SELECT lang,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS ws,
         CAST(length(text) AS BIGINT) AS y
  FROM documents
),
s AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(CAST(count(*) AS BIGINT) AS DOUBLE) AS n,
         CAST(CAST(sum(ws) AS BIGINT) AS DOUBLE) AS sx,
         CAST(CAST(sum(ws * ws) AS BIGINT) AS DOUBLE) AS sxx,
         CAST(CAST(sum(y) AS BIGINT) AS DOUBLE) AS sy,
         CAST(CAST(sum(ws * y) AS BIGINT) AS DOUBLE) AS sxy
  FROM f GROUP BY lang
)
SELECT lang, n_docs,
       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b1,
       (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS b0
FROM s ORDER BY lang
"""


def doc_shuffle_shards(sf_dir: str, n_shards: int = 8) -> pd.DataFrame:
    """Deterministic global pseudo-shuffle into training shards — the
    export-ordering step of a training pipeline (content-keyed, so the
    shard assignment AND the within-shard order are identical at any
    parallelism, unlike ``random_shuffle``): shard = md5-prefix % n_shards,
    within-shard position = rank by (md5 hex, doc_id).

    Scale shape: positions come from a TWO-PHASE distributed rank, never a
    global sort or a shard-sized group. The first 2 hex digits define 256
    sub-buckets that are PREFIX blocks of the md5 order, so (1) a tiny
    ``groupby(sub).Count`` gives every sub-bucket's size (≤256 rows to the
    driver), (2) ascending-sub cumsums per shard are the global offsets,
    and (3) one bounded 256-way ``groupby(sub)`` ranks locally and adds
    the broadcast offset. Pair a non-default ``n_shards`` with
    ``doc_shuffle_shards_sql(n_shards)``."""
    import hashlib

    from ray.data.aggregate import Count as _Count

    def assign(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        hx = [hashlib.md5(str(int(i)).encode()).hexdigest() for i in ids]
        sub = np.array([int(h[:2], 16) for h in hx], dtype=np.int32)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "hx": pa.array(hx, pa.string()),
                "sub": pa.array(sub),
                "shard": pa.array((sub % n_shards).astype(np.int64)),
            }
        )

    src = _docs(sf_dir, ["doc_id"]).map_batches(assign, batch_format="pyarrow")
    counts = (
        src.groupby("sub").aggregate(_Count(alias_name="n")).to_pandas()
        .sort_values("sub")
    )
    offsets: dict[int, int] = {}
    seen_per_shard = {s: 0 for s in range(n_shards)}
    for sub, n in zip(counts["sub"], counts["n"]):
        sh = int(sub) % n_shards
        offsets[int(sub)] = seen_per_shard[sh]
        seen_per_shard[sh] += int(n)
    oref = ray.put(offsets)

    def rank_sub(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(oref)[int(g["sub"].iloc[0])]
        g = g.sort_values(["hx", "doc_id"], kind="mergesort")
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "shard": g["shard"].to_numpy(),
                "pos": off + np.arange(len(g), dtype=np.int64),
            }
        )

    out = (
        src.groupby("sub")
        .map_groups(rank_sub, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_shuffle_shards_sql(n_shards: int = 8) -> str:
    return f"""
WITH h AS (
  SELECT doc_id,
         md5(CAST(doc_id AS VARCHAR)) AS hx,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS BIGINT)
           % {n_shards} AS shard
  FROM documents
)
SELECT doc_id, CAST(shard AS BIGINT) AS shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY hx, doc_id) - 1
            AS BIGINT) AS pos
FROM h ORDER BY doc_id
"""


DOC_SHUFFLE_SHARDS_SQL = doc_shuffle_shards_sql()


TRAIN_QUALITY_REG_STATS_SQL = r"""
WITH f AS (
  SELECT len(regexp_extract_all(text, '\S+')) AS ws,
         length(text) AS y
  FROM documents
),
s AS (
  SELECT count(*) AS v_n,
         CAST(sum(ws) AS BIGINT) AS v_sum_ws,
         CAST(sum(ws * ws) AS BIGINT) AS v_sum_ws_ws,
         CAST(sum(y) AS BIGINT) AS v_sum_y,
         CAST(sum(ws * y) AS BIGINT) AS v_sum_ws_y,
         CAST(sum(y * y) AS BIGINT) AS v_sum_y_y
  FROM f
)
SELECT t.term, CASE t.term
    WHEN 'n' THEN v_n                 WHEN 'sum_ws' THEN v_sum_ws
    WHEN 'sum_ws_ws' THEN v_sum_ws_ws WHEN 'sum_y' THEN v_sum_y
    WHEN 'sum_ws_y' THEN v_sum_ws_y   ELSE v_sum_y_y END AS value
FROM s, (VALUES ('n'), ('sum_ws'), ('sum_ws_ws'), ('sum_y'), ('sum_ws_y'),
               ('sum_y_y')) AS t(term)
ORDER BY t.term
"""


# ---------------------------------------------------------------------------
# TF-IDF top terms + inverted index (corpus indexing / relevance surface —
# the retrieval-side counterpart of doc_top_terms, with exact SQL oracles)
# ---------------------------------------------------------------------------

_TF_SCHEMA = pa.schema([("doc_id", pa.int64()), ("term", pa.string()), ("tf", pa.int64())])


def _doc_term_tf(sf_dir: str) -> "rd.Dataset":
    """Distinct (doc_id, term, tf) rows — one per document-level term.

    Per-batch Counter keeps the output at document-vocabulary grain (far
    below token grain for natural text), so the downstream term/doc
    shuffles move pre-aggregated rows only."""

    def explode(t: pa.Table) -> pa.Table:
        from collections import Counter

        ids_out, terms_out, tf_out = [], [], []
        ids = t["doc_id"].to_numpy()
        for i, x in enumerate(t["text"].to_pylist()):
            c = Counter(T.ws_tokens((x or "").lower()))
            if not c:
                continue
            ids_out.extend([int(ids[i])] * len(c))
            terms_out.extend(c.keys())
            tf_out.extend(c.values())
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "term": pa.array(terms_out, pa.string()),
                "tf": pa.array(tf_out, pa.int64()),
            }
        ).cast(_TF_SCHEMA)

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(explode, batch_format="pyarrow")


def doc_tfidf_top_terms(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Per-document top-``k`` terms by tf·idf with LINEAR idf = N/df.

    The linear-idf score ``tf · N / df`` keeps the pipeline/oracle contract
    EXACT: tf·N is exact int64, and a single IEEE double division is
    correctly rounded, so numpy and DuckDB produce bit-identical scores
    (a log idf would hinge on cross-library ``ln`` ulps — see the
    fixed-point rule in pipelines/relational.py). Output columns are all
    integers/strings: (doc_id, term, tf, df).

    Shape: distinct (doc,term,tf) explode → ``groupby(hash(term) & 63)``
    with the per-term df computed by ONE vectorized ``transform("size")``
    inside the shard (every term's rows co-locate in its shard, so the
    in-shard count IS the global df) → ``groupby(doc_id & 63)`` with the
    per-doc top-``k`` done by one in-shard sort + cumcount. Two shuffles,
    BOTH on bounded 64-way partition keys — never one Ray UDF call per
    distinct term/doc (the CLAUDE.md measured scale-killer). Pair a
    non-default ``k`` with ``doc_tfidf_top_terms_sql(k)``."""
    n_pkeys = 64
    n_docs = _docs(sf_dir, ["doc_id"]).count()

    def term_pkey(t: pa.Table) -> pa.Table:
        terms = t["term"].to_numpy(zero_copy_only=False)
        pk = (pd.util.hash_array(terms) % np.uint64(n_pkeys)).astype(np.int32)
        return t.append_column("pkey", pa.array(pk, pa.int32()))

    def df_shard(g: pd.DataFrame) -> pd.DataFrame:
        # tf rows are distinct per (doc, term): rows-per-term == document freq
        out = g[["doc_id", "term", "tf"]].copy()
        out["df"] = (
            g.groupby("term", sort=False)["doc_id"].transform("size").to_numpy(np.int64)
        )
        return out

    def doc_pkey(t: pa.Table) -> pa.Table:
        pk = (t["doc_id"].to_numpy() & (n_pkeys - 1)).astype(np.int32)
        return t.append_column("pkey2", pa.array(pk, pa.int32()))

    def topk_shard(g: pd.DataFrame) -> pd.DataFrame:
        score = (g["tf"].to_numpy() * np.int64(n_docs)).astype(np.float64) / g[
            "df"
        ].to_numpy().astype(np.float64)
        g = g.assign(score=score).sort_values(
            ["doc_id", "score", "term"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        g = g[g.groupby("doc_id", sort=False).cumcount() < k]
        return g[["doc_id", "term", "tf", "df"]]

    out = (
        _doc_term_tf(sf_dir)
        .map_batches(term_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(df_shard, batch_format="pandas")
        .map_batches(doc_pkey, batch_format="pyarrow")
        .groupby("pkey2")
        .map_groups(topk_shard, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["doc_id", "term"]).reset_index(drop=True)


def doc_tfidf_top_terms_sql(k: int = 3) -> str:
    return rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
  FROM documents
  WHERE len(trim(text)) > 0
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, term
),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
ranked AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY CAST(tf.tf * n.n AS DOUBLE) / df.df DESC, tf.term ASC
         ) AS rk
  FROM tf JOIN df USING (term), n
)
SELECT doc_id, term, tf, df FROM ranked WHERE rk <= {k}
ORDER BY doc_id, term
"""


DOC_TFIDF_TOP_TERMS_SQL = doc_tfidf_top_terms_sql()


def term_postings(sf_dir: str, min_df: int = 2, sample: int = 20) -> pd.DataFrame:
    """Inverted index: per term its document frequency and the first
    ``sample`` posting doc_ids (ascending, comma-joined) — terms with
    df ≥ ``min_df``.

    Postings are encoded as a string so the driver's column hash stays
    scalar (list columns don't survive the numpy equality compare).
    Shape: distinct (doc,term) explode → ``groupby(hash(term) & 63)``;
    every term's rows co-locate in its shard, so ONE vectorized in-shard
    pass (sort + transform-size + cumcount truncation + C-level string
    agg) yields the vocabulary-grain result — never one Ray UDF call per
    distinct term (the CLAUDE.md measured scale-killer). The
    df-cap/truncation bounds hot-term postings inside the shard. Pair
    non-default params with ``term_postings_sql(min_df, sample)``."""
    n_pkeys = 64

    def term_pkey(t: pa.Table) -> pa.Table:
        terms = t["term"].to_numpy(zero_copy_only=False)
        pk = (pd.util.hash_array(terms) % np.uint64(n_pkeys)).astype(np.int32)
        return t.append_column("pkey", pa.array(pk, pa.int32()))

    def index_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["term", "doc_id"], kind="mergesort")
        by_term = g.groupby("term", sort=False)
        df = by_term["doc_id"].transform("size").to_numpy(np.int64)
        keep = (df >= min_df) & (by_term.cumcount().to_numpy() < sample)
        g = g.assign(df=df)[keep]
        out = (
            g.assign(id_str=g["doc_id"].astype(str))
            .groupby(["term", "df"], sort=False)["id_str"]
            .agg(",".join)
            .reset_index()
            .rename(columns={"id_str": "postings"})
        )
        return out[["term", "df", "postings"]]

    out = (
        _doc_term_tf(sf_dir)
        .map_batches(term_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(index_shard, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("term").reset_index(drop=True)


def term_postings_sql(min_df: int = 2, sample: int = 20) -> str:
    return rf"""
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
  FROM documents
  WHERE len(trim(text)) > 0
)
SELECT term,
       CAST(count(*) AS BIGINT) AS df,
       array_to_string(list_slice(list(doc_id ORDER BY doc_id), 1, {sample}), ',')
         AS postings
FROM toks
GROUP BY term
HAVING count(*) >= {min_df}
ORDER BY term
"""


TERM_POSTINGS_SQL = term_postings_sql()


# ---------------------------------------------------------------------------
# Gopher-style intra-document repetition stats (dup n-grams, top-token mass)
# ---------------------------------------------------------------------------


def doc_repetition_stats(sf_dir: str) -> pd.DataFrame:
    """Per-document repetition signals (Rae et al. 2021 "Gopher" rules,
    word-grain): token count, word-2-gram count, DUPLICATE 2-gram
    occurrences (total minus distinct), and the occurrence count of the
    most frequent token. All int64 so the DuckDB oracle hash-matches
    exactly; the ratio thresholds a filter would apply (e.g. dup_2grams /
    n_2grams > 0.2) are a trivial driver- or SQL-side predicate on these.

    Shape: one map_batches pass, no shuffle; per-doc Counter/set work is
    C-level over the same normalized tokens the dedup family uses."""
    from collections import Counter

    def rep(t: pa.Table) -> pa.Table:
        ids_out, nt, n2, d2, tt = [], [], [], [], []
        for i, x in zip(t["doc_id"].to_numpy(), t["text"].to_pylist()):
            tk = T.ws_tokens((x or "").lower())
            if not tk:
                continue
            g = list(zip(tk, tk[1:]))
            ids_out.append(int(i))
            nt.append(len(tk))
            n2.append(len(g))
            d2.append(len(g) - len(set(g)))
            tt.append(max(Counter(tk).values()))
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "n_tokens": pa.array(nt, pa.int64()),
                "n_2grams": pa.array(n2, pa.int64()),
                "dup_2grams": pa.array(d2, pa.int64()),
                "top_token_n": pa.array(tt, pa.int64()),
            }
        )

    out = _docs(sf_dir, ["doc_id", "text"]).map_batches(rep, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


DOC_REPETITION_STATS_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS tk
  FROM documents WHERE trim(text) != ''
),
tc AS (
  SELECT doc_id, max(c) AS top_token_n FROM (
    SELECT doc_id, token, count(*) AS c
    FROM (SELECT doc_id, unnest(tk) AS token FROM toks)
    GROUP BY doc_id, token)
  GROUP BY doc_id
),
base AS (
  SELECT doc_id,
         CAST(len(tk) AS BIGINT) AS n_tokens,
         CAST(len([tk[i] || ' ' || tk[i+1] FOR i IN range(1, len(tk))]) AS BIGINT)
           AS n_2grams,
         CAST(len([tk[i] || ' ' || tk[i+1] FOR i IN range(1, len(tk))])
              - len(list_distinct([tk[i] || ' ' || tk[i+1] FOR i IN range(1, len(tk))]))
              AS BIGINT) AS dup_2grams
  FROM toks
)
SELECT b.doc_id, b.n_tokens, b.n_2grams, b.dup_2grams,
       CAST(tc.top_token_n AS BIGINT) AS top_token_n
FROM base b JOIN tc USING (doc_id)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Sequence packing (GPT-style concat-and-chunk) — round 5
# ---------------------------------------------------------------------------

PACK_SEQ_LEN = 256


def doc_pack_sequences(sf_dir: str, seq_len: int = PACK_SEQ_LEN) -> pd.DataFrame:
    """Concat-and-chunk sequence packing: concatenate every document's
    whitespace tokens in doc_id order and cut fixed ``seq_len``-token
    training sequences; return each doc's placement — (doc_id, n_tokens,
    start_token, first_seq, last_seq). The packing step every LLM
    pretraining pipeline runs after tokenization.

    Scale shape: a DISTRIBUTED EXCLUSIVE SCAN, never a global sort or a
    single-process cumsum. Docs are bucketed into 256 equal-width doc_id
    ranges — PREFIX blocks of the pack order — so (1) one tiny
    ``groupby(sub).Sum`` gives per-bucket token totals (≤256 rows to the
    driver), (2) their exclusive prefix sums are the bucket base offsets,
    and (3) one bounded 256-way ``groupby(sub)`` cumsums locally and adds
    the broadcast base (the doc_shuffle_shards two-phase-rank machinery,
    generalized from counts to weighted sums). Pair a non-default
    ``seq_len`` with ``doc_pack_sequences_sql(seq_len)``."""
    from ray.data.aggregate import Max as _Max
    from ray.data.aggregate import Min as _Min
    from ray.data.aggregate import Sum as _Sum

    ids_only = _docs(sf_dir, ["doc_id"])
    bounds = ids_only.aggregate(_Min("doc_id"), _Max("doc_id"))
    mn, mx = int(bounds["min(doc_id)"]), int(bounds["max(doc_id)"])
    span = max(mx - mn + 1, 1)

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        n = np.array(
            [len(T.ws_tokens(x)) for x in t["text"].to_pylist()], dtype=np.int64
        )
        sub = ((ids - mn) * 256 // span).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
                "sub": pa.array(sub, pa.int64()),
            }
        )

    # materialize the TINY (doc_id, n_tokens, sub) intermediate — 3 int64
    # columns — so the tokenize pass runs once, not once per consumer
    src = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .materialize()
    )
    totals = (
        src.groupby("sub").aggregate(_Sum("n_tokens", alias_name="tok")).to_pandas()
        .sort_values("sub")
    )
    base: dict[int, int] = {}
    running = 0
    for sub, tok in zip(totals["sub"], totals["tok"]):
        base[int(sub)] = running
        running += int(tok)
    bref = ray.put(base)

    def place(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(bref)[int(g["sub"].iloc[0])]
        g = g.sort_values("doc_id", kind="mergesort")
        n = g["n_tokens"].to_numpy()
        start = off + np.concatenate([[0], np.cumsum(n)[:-1]])
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "n_tokens": n,
                "start_token": start,
                "first_seq": start // seq_len,
                "last_seq": (start + np.maximum(n, 1) - 1) // seq_len,
            }
        )

    out = (
        src.groupby("sub")  # bounded key: 256 prefix-range buckets
        .map_groups(place, batch_format="pandas")
        .to_pandas()
        .astype("int64")
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_pack_sequences_sql(seq_len: int = PACK_SEQ_LEN) -> str:
    """DuckDB replica of :func:`doc_pack_sequences`: exclusive window
    cumsum over doc_id order, identical chunk arithmetic."""
    return rf"""
WITH f AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
  FROM documents
), s AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_token
  FROM f
)
SELECT doc_id, n_tokens, start_token,
       start_token // {seq_len} AS first_seq,
       (start_token + greatest(n_tokens, 1) - 1) // {seq_len} AS last_seq
FROM s ORDER BY doc_id
"""
