"""Driver-conformance rehearsal: every ``oracle_sql()`` entry is executed in
DuckDB against the testdata views and compared value-by-value with the Ray
result — the same check CORRECTNESS_r{N}.json records, run at sf0.001 for
speed (the driver runs sf0.01)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


SQL_CHECKED = sorted(entrymod.oracle_sql())


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(name, con, ray_session):
    ray_fn = entrymod.queries()[name]
    got = ray_fn(SF_DIR)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = con.execute(entrymod.oracle_sql()[name]).df()
    g, w = _normalize(got), _normalize(want)
    assert list(g.columns) == list(w.columns), f"{name}: columns {list(g.columns)} vs {list(w.columns)}"
    assert len(g) == len(w), f"{name}: rows {len(g)} vs {len(w)}"
    for c in g.columns:
        if pd.api.types.is_float_dtype(g[c]):
            assert np.allclose(g[c].to_numpy(), w[c].to_numpy(), rtol=0, atol=1e-9), (
                f"{name}: float col {c} differs"
            )
        else:
            same = (g[c].to_numpy() == w[c].to_numpy())
            assert same.all(), f"{name}: col {c} differs at {np.nonzero(~same)[0][:5]}"


def test_rows_only_queries_run(ray_session):
    """EVERY query without a SQL oracle — including the __ray_entry__
    wrapper glue (quality_*, spectrogram/window) and entry() itself — must
    run and return a non-empty result."""
    qs = entrymod.queries()
    rows_only = sorted(set(qs) - set(entrymod.oracle_sql()))
    for name in rows_only:
        out = qs[name](SF_DIR)
        if not isinstance(out, pd.DataFrame):
            out = out.to_pandas()
        assert len(out) > 0 and len(out.columns) >= 2, name
    ds = entrymod.entry()
    assert ds.count() > 0


def test_train_char_lm_counts_matches_local(ray_session):
    """Distributed trigram counting == single-process counting."""
    import pyarrow.parquet as pq

    from data_quality_ray.functions.models import _trigram_ids_bytes

    got = entrymod.queries()["train_char_lm_counts"](SF_DIR)
    texts = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])["text"].to_pylist()
    total = np.zeros(1 << 16, dtype=np.int64)
    for x in texts:
        b = np.frombuffer((" " + x.lower() + " ").encode(), dtype=np.uint8)
        ids = _trigram_ids_bytes(b)
        total += np.bincount(ids, minlength=1 << 16)
    nz = np.nonzero(total)[0]
    assert (got["bucket"].to_numpy() == nz).all()
    assert (got["count"].to_numpy() == total[nz]).all()


def test_document_pipeline_matches_sequential_composition(ray_session):
    """Text-flagship parity gate (the document twin of the clip F1 gate):
    the distributed document DAG must agree with a single-process
    sequential composition of the SAME kernels on every decision column."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_quality_ray.functions import models
    from data_quality_ray.functions import text as T
    from data_quality_ray import config
    from data_quality_ray.pipelines.documents import document_pipeline
    from data_quality_ray.stages.decision import decision_batch
    from data_quality_ray.stages.langid import langid_batch
    from data_quality_ray.stages.scrub import scrub_batch
    from data_quality_ray.stages.split import split_batch

    sf = "/root/testdata/sf0.001"
    src = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])

    # sequential oracle: same kernels, one process, no Ray
    t = pa.table({"doc_id": src["doc_id"], "transcript": src["text"]})
    t = scrub_batch(t)
    t = langid_batch(t)
    texts = t["transcript_scrubbed"].to_pylist()
    ppl = np.asarray(models.ppl_scores(t["transcript_scrubbed"]), dtype=np.float64)
    rep = T.repetition_ratio(texts)
    sym = T.symbol_density(texts)
    n_chars = T.char_lengths(texts)
    flags = [
        [f for f, hit in (("rep", rep[i] > config.REP_MAX),
                          ("sym", sym[i] > config.SYM_MAX),
                          ("len", n_chars[i] < 64)) if hit]
        for i in range(t.num_rows)
    ]
    t = (
        t.append_column("ppl", pa.array(ppl, pa.float64()))
        .append_column("rule_flags", pa.array(flags, pa.list_(pa.string())))
        .append_column("decode_ok", pa.array(np.ones(t.num_rows, dtype=bool)))
    )
    t = split_batch(decision_batch(t), key="doc_id")
    oracle = (
        t.select(["doc_id", "lang", "split", "keep", "bucket", "quality_score"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    got = document_pipeline(sf)
    pd.testing.assert_frame_equal(got, oracle)
