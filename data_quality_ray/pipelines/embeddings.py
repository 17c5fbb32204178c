"""Similarity search over the ``embeddings`` table (list<float> column).

- :func:`ann_brute_force` — exact cosine top-k: per-batch numpy matmul
  against a broadcast query matrix (``ray.put`` once), per-batch partial
  top-k, tiny driver-side merge. The baseline the scale paths are judged
  against; DuckDB oracle via ``list_cosine_similarity``.
- :func:`ann_lsh` — random-hyperplane LSH over a STORED bucket-partitioned
  index (:func:`build_lsh_index`): the scale path; the query reads only
  probed (table, code) partitions, recall measured against brute force in
  tests.
- :func:`embedding_near_dup` — cosine near-duplicate pairs over a corpus
  with planted perturbed copies, LSH-bucketed.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

N_QUERIES = 10
TOP_K = 5
DUP_OFFSET = 1_000_000


def _emb(sf_dir: str) -> "rd.Dataset":
    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])


def _batch_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = t["vec_id"].to_numpy()
    flat = t["embedding"].combine_chunks()
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    arr = np.asarray(flat.values, dtype=np.float64).reshape(len(ids), -1)
    return ids, arr


def _query_ids(sf_dir: str) -> np.ndarray:
    """The N_QUERIES lowest vec_ids, found WITHOUT materializing the table.

    Fast path: parquet row-group STATISTICS — visit row groups in ascending
    min(vec_id) order, reading ONLY the ``vec_id`` column of each, and stop
    as soon as the next group's min cannot beat the Nth-smallest candidate
    (exact by the stats contract). O(row groups visited) driver work, no
    Ray job, no vector bytes. Falls back to a distributed per-block min-N
    scan when stats are missing."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet"))
    md = pf.metadata
    rg0 = md.row_group(0)
    col_idx = next(
        i for i in range(rg0.num_columns)
        if rg0.column(i).path_in_schema.split(".")[0] == "vec_id"
    )
    mins = []
    for r in range(md.num_row_groups):
        st = md.row_group(r).column(col_idx).statistics
        if st is None or not st.has_min_max:
            mins = None
            break
        mins.append((st.min, r))
    if mins is not None:
        best = np.array([], dtype=np.int64)
        for rg_min, r in sorted(mins):
            if len(best) >= N_QUERIES and rg_min > best[-1]:
                break
            ids = pf.read_row_group(r, columns=["vec_id"])["vec_id"].to_numpy()
            best = np.sort(np.concatenate([best, ids]))[:N_QUERIES]
        return best

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id"])

    def block_min_n(t: pa.Table) -> pa.Table:
        ids = np.sort(t["vec_id"].to_numpy())[:N_QUERIES]
        return pa.table({"vec_id": pa.array(ids, pa.int64())})

    parts = ds.map_batches(block_min_n, batch_format="pyarrow").to_pandas()
    return np.sort(parts["vec_id"].to_numpy())[:N_QUERIES]


def _emb_dim(sf_dir: str) -> int:
    """Embedding dimensionality from parquet metadata — O(1), no table scan.

    ``fixed_size_list`` carries the dim in the schema; a plain
    ``list<float>`` does not, so fall back to decoding a SINGLE row from
    the first row group.
    """
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet"))
    typ = pf.schema_arrow.field("embedding").type
    if pa.types.is_fixed_size_list(typ):
        return typ.list_size
    batch = next(pf.iter_batches(batch_size=1, columns=["embedding"]))
    return len(batch["embedding"][0])


def _load_queries(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic query set: the N_QUERIES lowest vec_ids.

    Reads ONLY the N_QUERIES query rows by id filter (row-group-pruned
    predicate pushdown) — never the whole vector table on the driver.
    """
    import pyarrow.parquet as pq

    qids = _query_ids(sf_dir)
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", [int(v) for v in qids])],
    )
    df = t.to_pandas().sort_values("vec_id").head(N_QUERIES)
    q = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return df["vec_id"].to_numpy(), q


def ann_brute_force(sf_dir: str, k: int = TOP_K) -> pd.DataFrame:
    """Exact cosine top-k of every query against the whole table.

    Shape: broadcast normalized query matrix → map_batches computes the
    (batch × queries) similarity matrix and keeps each query's LOCAL top-k
    (k rows per query per batch leave the stage) → driver merges partials
    (n_blocks × q × k rows — tiny). Ties broken by vec_id ascending.
    Returns (query_id, rank, vec_id) — integer-only for oracle stability.
    """
    qids, qmat = _load_queries(sf_dir)
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    q_ref = ray.put((qids, qn))

    def partial_topk(t: pa.Table) -> pa.Table:
        qids_, qn_ = ray.get(q_ref)
        ids, mat = _batch_matrix(t)
        matn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        sims = matn @ qn_.T  # (batch, q)
        out_q, out_v, out_s = [], [], []
        kk = min(k, len(ids))
        for j in range(len(qids_)):
            s = sims[:, j]
            # top-k with deterministic vec_id tie-break
            order = np.lexsort((ids, -s))[:kk]
            out_q.extend([int(qids_[j])] * kk)
            out_v.extend(ids[order].tolist())
            out_s.extend(s[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    parts = _emb(sf_dir).map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    out_rows = []
    for qid, g in parts.groupby("query_id"):
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        for rank, (_, r) in enumerate(g.iterrows(), start=1):
            out_rows.append((int(qid), rank, int(r["vec_id"])))
    out = pd.DataFrame(out_rows, columns=["query_id", "rank", "vec_id"])
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


ANN_BRUTE_FORCE_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  ORDER BY vec_id LIMIT {N_QUERIES}
), scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qe, e.embedding) AS sim
  FROM q CROSS JOIN embeddings e
), ranked AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
  FROM scored
)
SELECT query_id, rank, vec_id FROM ranked
WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path)
# ---------------------------------------------------------------------------


class _Hyperplanes:
    """n_tables × n_bits random hyperplanes (seeded), shared by index+query."""

    def __init__(self, dim: int, n_tables: int = 8, n_bits: int = 8, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_tables, n_bits, dim))
        self.n_tables, self.n_bits = n_tables, n_bits

    def codes(self, mat: np.ndarray) -> np.ndarray:
        """(n, n_tables) uint32 bucket codes."""
        n = mat.shape[0]
        out = np.empty((n, self.n_tables), dtype=np.uint32)
        for t in range(self.n_tables):
            bits = (mat @ self.planes[t].T) > 0  # (n, n_bits)
            out[:, t] = (bits.astype(np.uint32) << np.arange(self.n_bits, dtype=np.uint32)).sum(axis=1)
        return out


def build_lsh_index(
    sf_dir: str, index_dir: str, n_tables: int = 16, n_bits: int = 6, seed: int = 11
) -> _Hyperplanes:
    """Write the STORED multi-table LSH index: each vector's row is
    replicated once per hash table and written with
    ``partition_cols=["tbl", "code"]``, so a query later reads ONLY the
    files of its own (table, code) buckets — the IVF partition-pruning
    shape. Returns the (seeded, reproducible) hyperplanes shared by the
    build and query paths.

    The ×n_tables row replication is the classic multi-table LSH
    space-for-time trade-off (each table IS an index copy); when index
    bytes dominate, the key-only alternative — (tbl, code, vec_id)
    postings + bucketed vector re-attach joins — is the shape
    :func:`embedding_near_dup` already demonstrates. ``tbl``/``code``
    are duplicated as physical ``tbl_id``/``code_id`` columns so the
    per-row bucket survives a path-pruned read (same trick as IVF's
    ``cell_id``)."""
    hp = _Hyperplanes(_emb_dim(sf_dir), n_tables=n_tables, n_bits=n_bits, seed=seed)
    href = ray.put(hp)

    def post(t: pa.Table) -> pa.Table:
        hp_ = ray.get(href)
        ids, mat = _batch_matrix(t)
        matn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        codes = hp_.codes(matn)  # (n, n_tables) uint32
        parts = []
        for tb in range(hp_.n_tables):
            c = codes[:, tb].astype(np.int32)
            parts.append(
                pa.table(
                    {
                        "vec_id": t["vec_id"],
                        "embedding": t["embedding"],
                        "tbl_id": pa.array(np.full(len(ids), tb, np.int32)),
                        "code_id": pa.array(c),
                        "tbl": pa.array(np.full(len(ids), tb, np.int32)),
                        "code": pa.array(c),
                    }
                )
            )
        return pa.concat_tables(parts)

    _emb(sf_dir).map_batches(post, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["tbl", "code"]
    )
    return hp


def probed_bucket_paths(index_dir: str, buckets: "list[tuple[int, int]]") -> list[str]:
    """Parquet file paths of the probed (table, code) buckets (hive layout)
    — the explicit partition pruning of the LSH query path; never lists
    unprobed buckets."""
    import glob as _glob

    out = []
    for tb, code in buckets:
        out.extend(
            sorted(
                _glob.glob(
                    os.path.join(index_dir, f"tbl={int(tb)}", f"code={int(code)}", "*.parquet")
                )
            )
        )
    return out


def ann_lsh(
    sf_dir: str, k: int = TOP_K, n_tables: int = 16, n_bits: int = 6
) -> pd.DataFrame:
    """Approximate top-k over the STORED bucket-partitioned LSH index:
    candidates = vectors sharing any (table, code) bucket with the query
    (16 tables × 6 hyperplane bits ≈ 75% recall@5 on random gaussians),
    scored exactly within buckets, then top-k.

    Scale shape: codes are computed ONCE at index build
    (:func:`build_lsh_index`); the query path is a partition-PRUNED
    ``read_parquet`` of only the q·n_tables probed buckets — bytes read
    scale with bucket occupancy (test-asserted like IVF's), never a full
    corpus scan per query batch. A vector reached through several tables
    is deduped at the tiny driver merge."""
    import shutil
    import tempfile

    qids, qmat = _load_queries(sf_dir)
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)

    index_dir = tempfile.mkdtemp(prefix="lsh_idx_")
    try:
        hp = build_lsh_index(sf_dir, index_dir, n_tables=n_tables, n_bits=n_bits)
        qcodes = hp.codes(qn)  # (q, n_tables)
        buckets = sorted(
            {(tb, int(qcodes[j, tb])) for j in range(len(qids)) for tb in range(hp.n_tables)}
        )
        ref = ray.put((qids, qn, qcodes))

        def partial(t: pa.Table) -> pa.Table:
            qids_, qn_, qcodes_ = ray.get(ref)
            ids, mat = _batch_matrix(t)
            matn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
            tbl = t["tbl_id"].to_numpy().astype(np.int64)
            code = t["code_id"].to_numpy().astype(np.int64)
            out_q, out_v, out_s = [], [], []
            for j in range(len(qids_)):
                cand = qcodes_[j][tbl] == code  # row's bucket probed by query j
                if not cand.any():
                    continue
                s = matn[cand] @ qn_[j]
                cids = ids[cand]
                kk = min(k, len(cids))
                order = np.lexsort((cids, -s))[:kk]
                out_q.extend([int(qids_[j])] * kk)
                out_v.extend(cids[order].tolist())
                out_s.extend(s[order].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_v, pa.int64()),
                    "sim": pa.array(out_s, pa.float64()),
                }
            )

        paths = probed_bucket_paths(index_dir, buckets)
        if not paths:  # every probed bucket empty (tiny corpus / high n_bits)
            parts = pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype="int64"),
                    "vec_id": pd.Series([], dtype="int64"),
                    "sim": pd.Series([], dtype="float64"),
                }
            )
        else:
            parts = (
                rd.read_parquet(paths)  # partition-pruned: only probed buckets
                .map_batches(partial, batch_format="pyarrow")
                .to_pandas()
            )
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)
    # a vector found via several tables appears once per table: dedup before
    # ranking (scores are identical — same exact cosine)
    parts = parts.drop_duplicates(["query_id", "vec_id"])
    out_rows = []
    for qid, g in parts.groupby("query_id"):
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        for rank, (_, r) in enumerate(g.iterrows(), start=1):
            out_rows.append((int(qid), rank, int(r["vec_id"])))
    out = pd.DataFrame(out_rows, columns=["query_id", "rank", "vec_id"])
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Embedding near-duplicate pairs (planted perturbed copies)
# ---------------------------------------------------------------------------


def _noisy_copy(t: pa.Table) -> pa.Table:
    """Perturbed copies (vec_id + DUP_OFFSET, σ=0.01 noise) — the planted
    near-dup fixture shared by embedding_near_dup and semantic_dedup.

    Per-ROW seeded noise: a row's draw is a pure function of its vec_id,
    independent of batch/block boundaries (determinism contract — identical
    output at any cluster size)."""
    ids, mat = _batch_matrix(t)
    noise = np.stack(
        [np.random.default_rng(int(v) + 977).standard_normal(mat.shape[1]) for v in ids]
    ) if len(ids) else np.zeros_like(mat)
    noisy = mat + 0.01 * noise
    return pa.table(
        {
            "vec_id": pa.array(ids + DUP_OFFSET, pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32).tolist() for row in noisy],
                pa.list_(pa.float32()),
            ),
        }
    )


def embedding_near_dup(sf_dir: str, threshold: float = 0.98) -> pd.DataFrame:
    """Cosine near-dup pairs on a corpus doubled with slightly-noised copies
    (vec_id + DUP_OFFSET, noise σ=0.01). Returns (a, b) pairs with
    cosine ≥ threshold, a < b.

    Shuffle discipline: the LSH bucket explode carries ONLY (table, code,
    vec_id) — ~20 B/row, never the vector (the round-1 version replicated
    the full embedding ×n_tables through the groupby). Candidate pairs are
    re-joined to the single-copy embedding table with the same
    bucket-partitioned joins the dedup family uses, then cosine is
    verified vectorized per batch.
    """
    import functools

    from data_quality_ray.pipelines.dedup import (  # shared pair machinery
        _attach_both_sigs,
        _candidate_pairs_ds,
    )

    base = _emb(sf_dir)
    ds = base.union(base.map_batches(_noisy_copy, batch_format="pyarrow"))
    # one keyed copy of the vectors, reused by buckets + both verify joins
    keyed = ds.map_batches(
        lambda t: pa.table({"doc_id": t["vec_id"], "embedding": t["embedding"]}),
        batch_format="pyarrow",
    ).materialize()

    dim = _emb_dim(sf_dir)  # schema metadata / single-row probe — no table read
    hp = _Hyperplanes(dim, n_tables=6, n_bits=10)

    def to_buckets(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        flat = t["embedding"].combine_chunks()
        mat = np.asarray(flat.flatten(), dtype=np.float64).reshape(len(ids), -1)
        matn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        codes = hp.codes(matn)
        n, T_ = codes.shape
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(T_, dtype=np.int32), n)),
                "band_hash": pa.array(codes.T.reshape(-1).astype(np.uint64), pa.uint64()),
                "doc_id": pa.array(np.tile(ids, T_), pa.int64()),
            }
        )

    def verify(t: pa.Table, threshold: float) -> pa.Table:
        schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
        if t.num_rows == 0:
            return schema.empty_table()
        A = np.asarray(t["sig_a"].combine_chunks().flatten(), dtype=np.float64).reshape(
            t.num_rows, -1
        )
        B = np.asarray(t["sig_b"].combine_chunks().flatten(), dtype=np.float64).reshape(
            t.num_rows, -1
        )
        An = A / np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-30)
        Bn = B / np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-30)
        keep = pa.array(np.einsum("ij,ij->i", An, Bn) >= threshold)
        return t.select(["a", "b"]).filter(keep).cast(schema)

    cand = _candidate_pairs_ds(keyed.map_batches(to_buckets, batch_format="pyarrow"))
    joined = _attach_both_sigs(cand, keyed, "embedding", pa.list_(pa.float32()))
    pairs = (
        joined.map_batches(
            functools.partial(verify, threshold=threshold), batch_format="pyarrow"
        )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    return pairs


# ---------------------------------------------------------------------------
# IVF-style ANN (coarse k-means partitions, probe nearest cells)
# ---------------------------------------------------------------------------


def _kmeans_fit(sample: np.ndarray, k: int, iters: int = 10, seed: int = 3) -> np.ndarray:
    """Tiny deterministic Lloyd's k-means on a driver-side sample — the
    coarse quantizer an IVF index trains offline. Returns (k, dim) centroids."""
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=k, replace=False)].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                centroids[c] = sample[m].mean(axis=0)
    return centroids


IVF_SAMPLE_SIZE = 256


def build_ivf_index(
    sf_dir: str,
    index_dir: str,
    n_cells: int = 16,
    sample_size: int = IVF_SAMPLE_SIZE,
    centroids: "np.ndarray | None" = None,
) -> np.ndarray:
    """Train the coarse quantizer on a DISTRIBUTED random sample and write
    the cell-partitioned stored index. Returns the normalized centroids.

    - quantizer training: ``ds.random_sample(frac, seed)`` → the sample
      (bounded, ≪ corpus) is the only vector data the driver ever holds —
      never the full table. Pass ``centroids`` (already normalized) to skip
      the fit — the medoid-quantizer path of :func:`ann_ivf_checked`.
    - index: every vector is assigned its nearest cell (vectorized argmax
      per batch) and written with ``partition_cols=["cell"]``, so a query
      later reads ONLY its probed cells' files (partition pruning).
    """
    ds = _emb(sf_dir)
    if centroids is not None:
        cn = centroids
    else:
        n = ds.count()
        frac = min(1.0, sample_size / max(n, 1))
        sample_df = ds.random_sample(frac, seed=3).to_pandas()
        sample = np.stack(sample_df["embedding"].to_numpy()).astype(np.float64)
        sample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-30)
        km = _kmeans_fit(sample, min(n_cells, len(sample)))
        cn = km / np.maximum(np.linalg.norm(km, axis=1, keepdims=True), 1e-30)
    cref = ray.put(cn)

    def assign(t: pa.Table) -> pa.Table:
        cn_ = ray.get(cref)
        ids, mat = _batch_matrix(t)
        matn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        cells = (matn @ cn_.T).argmax(axis=1).astype(np.int32)
        # cell is BOTH the partition key (directory pruning) and a physical
        # column (cell_id) so the query path keeps the per-row cell after a
        # path-pruned read
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "embedding": t["embedding"],
                "cell_id": pa.array(cells),
                "cell": pa.array(cells),
            }
        )

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["cell"]
    )
    return cn


def probed_cell_paths(index_dir: str, cells: "list[int]") -> list[str]:
    """Parquet file paths of the probed cells (hive layout) — the explicit
    partition pruning of the IVF query path; never lists unprobed cells."""
    import glob as _glob

    out = []
    for c in cells:
        out.extend(
            sorted(_glob.glob(os.path.join(index_dir, f"cell={int(c)}", "*.parquet")))
        )
    return out


def _ivf_scan(
    index_dir: str, qids: np.ndarray, qn: np.ndarray, q_cells: np.ndarray, k: int
) -> pd.DataFrame:
    """The IVF query stage shared by :func:`ann_ivf` and
    :func:`ann_ivf_checked`: partition-pruned read of the probed cells'
    files, per-batch exact cosine partial top-k, tiny driver merge.
    Returns (query_id, rank, vec_id)."""
    ref = ray.put((qids, qn, q_cells))
    probe_union = [int(c) for c in np.unique(q_cells)]

    def partial(t: pa.Table) -> pa.Table:
        qids_, qn_, q_cells_ = ray.get(ref)
        ids, mat = _batch_matrix(t)
        matn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        cells = t["cell_id"].to_numpy().astype(np.int64)
        out_q, out_v, out_s = [], [], []
        for j in range(len(qids_)):
            cand = np.isin(cells, q_cells_[j])
            if not cand.any():
                continue
            s = matn[cand] @ qn_[j]
            cids = ids[cand]
            kk = min(k, len(cids))
            order = np.lexsort((cids, -s))[:kk]
            out_q.extend([int(qids_[j])] * kk)
            out_v.extend(cids[order].tolist())
            out_s.extend(s[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    paths = probed_cell_paths(index_dir, probe_union)
    if not paths:  # every probed cell empty
        parts = pd.DataFrame(
            {
                "query_id": pd.Series([], dtype="int64"),
                "vec_id": pd.Series([], dtype="int64"),
                "sim": pd.Series([], dtype="float64"),
            }
        )
    else:
        parts = (
            rd.read_parquet(paths)  # partition-pruned: only probed cells
            .map_batches(partial, batch_format="pyarrow")
            .to_pandas()
        )
    rows = []
    for qid, g in parts.groupby("query_id"):
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        for rank, (_, r) in enumerate(g.iterrows(), start=1):
            rows.append((int(qid), rank, int(r["vec_id"])))
    return (
        pd.DataFrame(rows, columns=["query_id", "rank", "vec_id"])
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def ann_ivf(sf_dir: str, k: int = TOP_K, n_cells: int = 16, n_probe: int = 4) -> pd.DataFrame:
    """IVF ANN over the stored cell-partitioned index.

    Scale shape: the quantizer is fit on a distributed random sample
    (:func:`build_ivf_index`), the index is parquet partitioned by cell,
    and the query path reads ONLY the probed cells (a partition-pruned
    ``read_parquet`` filter — n_probe·q / n_cells of the data, not a full
    scan). Exact cosine within probed cells; recall vs brute force is
    test-gated.
    """
    import shutil
    import tempfile

    qids, qmat = _load_queries(sf_dir)
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)

    index_dir = tempfile.mkdtemp(prefix="ivf_idx_")
    try:
        cn = build_ivf_index(sf_dir, index_dir, n_cells=n_cells)
        q_cells = np.argsort(-(qn @ cn.T), axis=1)[:, :n_probe]  # (q, n_probe)
        return _ivf_scan(index_dir, qids, qn, q_cells, k)
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)


# ---------------------------------------------------------------------------
# SemDeDup-style semantic deduplication (cluster → within-cluster prune)
# ---------------------------------------------------------------------------


# SemDeDup cell sizing: target rows per k-means cell (the paper's k grows
# with corpus size, keeping the O(m²/k) within-cell pairwise step bounded);
# sample/cell caps bound the driver-side quantizer fit at any corpus size.
SEMDEDUP_ROWS_PER_CELL = 2_048
SEMDEDUP_MAX_SAMPLE = 65_536


def semantic_dedup(
    sf_dir: str,
    threshold: float = 0.92,
    n_cells: int | None = None,
    chunk_rows: int = 1_024,
) -> pd.DataFrame:
    """Semantic dedup à la SemDeDup (Abbas et al. 2023): k-means-cluster the
    embedding space, then WITHIN each cluster drop all but one member of
    every cosine-≥-threshold duplicate group (lowest vec_id survives).

    Corpus = embeddings ∪ planted noisy copies (:func:`_noisy_copy`), so the
    op always has real work: each copy must be dropped in favor of its
    source. Returns (vec_id, cluster_rep, keep) for every row, sorted.

    Scale shape: ``n_cells`` defaults to ~rows/2k (min 16) so a cell stays
    a bounded pandas group at ANY corpus size — the paper's k scales with
    data; a fixed k would make every cell corpus/k, i.e. whole-dataset-
    scale materialization. The quantizer is fit on a bounded distributed
    sample (≥8 points per centroid, capped at SEMDEDUP_MAX_SAMPLE — past
    that cap cells grow past the 2k target and a two-level quantizer is
    the documented next step); assignment is a vectorized broadcast-
    centroid map; the only shuffle is ONE groupby(cell). The within-cell
    similarity matmul runs in row CHUNKS so peak memory is chunk×m, not
    m×m, even for skew-fattened cells. Cross-cluster duplicates are
    invisible by construction — that recall loss is the documented
    trade-off of the method itself (pinned by the forced-many-cells
    recall test), and the LSH path (:func:`embedding_near_dup`) is the
    alternative when pair recall matters more than cost.
    """
    base = _emb(sf_dir)
    ds = base.union(base.map_batches(_noisy_copy, batch_format="pyarrow"))

    n = ds.count()
    if n_cells is None:
        n_cells = max(16, -(-n // SEMDEDUP_ROWS_PER_CELL))
    sample_size = min(max(IVF_SAMPLE_SIZE, 8 * n_cells), SEMDEDUP_MAX_SAMPLE)
    frac = min(1.0, sample_size / max(n, 1))
    # content-keyed sample (Fibonacci hash of vec_id), NOT random_sample:
    # the quantizer — and therefore every merge decision — is identical at
    # any parallelism / block order, like every other sampler in this repo
    lim = np.uint64(int(frac * float(1 << 24)))

    def pick(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy().astype(np.uint64)
        h = (ids * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)  # top 24 bits
        return t.filter(pa.array(h < lim))

    sample_df = (
        ds.map_batches(pick, batch_format="pyarrow")
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    sample = np.stack(sample_df["embedding"].to_numpy()).astype(np.float64)
    sample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-30)
    cn = _kmeans_fit(sample, min(n_cells, len(sample)))
    cn = cn / np.maximum(np.linalg.norm(cn, axis=1, keepdims=True), 1e-30)
    cref = ray.put(cn)

    def assign(t: pa.Table) -> pa.Table:
        cn_ = ray.get(cref)
        ids, mat = _batch_matrix(t)
        matn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        cells = (matn @ cn_.T).argmax(axis=1).astype(np.int32)
        return t.append_column("cell", pa.array(cells))

    chunk = max(1, chunk_rows)  # similarity matmul rows per slab: peak mem chunk×m

    def dedup_group(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy(dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        mat = np.stack(g["embedding"].to_numpy()[order]).astype(np.float64)
        matn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        m = len(ids)
        # union-find over the ≥-threshold adjacency (ids ascending, so the
        # root of each component is its lowest vec_id)
        parent = np.arange(m)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for lo in range(0, m, chunk):
            hi = min(lo + chunk, m)
            sims = matn[lo:hi] @ matn.T  # (hi−lo) × m slab
            ii, jj = np.nonzero(sims >= threshold)
            above = jj > ii + lo  # strict upper triangle in global indices
            for a, b in zip((ii[above] + lo).tolist(), jj[above].tolist()):
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        roots = np.array([find(i) for i in range(m)])
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster_rep": ids[roots],
                "keep": roots == np.arange(m),
            }
        )

    out = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(dedup_group, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("vec_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# SQL-checkable variants (round 5): medoid-quantizer IVF + nearest-earlier-rep
# SemDeDup. Both replicate their ENTIRE algorithm in generated DuckDB SQL
# (the minhash_dedup_checked pattern): the quantizer is content-keyed medoid
# selection (K lowest md5(vec_id)) instead of k-means, so cell assignment,
# probe order and the final ranking are all expressible as SQL — giving the
# driver a value-hash oracle for the ANN/semantic family, whose production
# paths (ann_ivf, semantic_dedup) stay k-means-based and rows-only.
# Constants feed BOTH the Ray path and the SQL generator — never hand-edit
# one side (CLAUDE.md round-2 invariant).
# ---------------------------------------------------------------------------

ANN_CHECKED_CELLS = 8
ANN_CHECKED_PROBE = 3
SEM_CHECKED_TAU = 0.92
SEM_CHECKED_SHIFT = 0.1


def _medoid_seeds(sf_dir: str, n_seeds: int) -> tuple[np.ndarray, np.ndarray]:
    """The n_seeds vectors with lowest (md5(vec_id), vec_id) — a
    content-keyed medoid quantizer, identical at any parallelism and
    replicable in SQL. Distributed bottom-K: each block emits its local
    bottom n_seeds (ids only), the driver merges ≤ blocks·n_seeds rows,
    then ONLY the seed rows are fetched by id filter (row-group-pruned).
    Returns (seed_ids in md5-rank order, seed matrix float64)."""
    import hashlib

    import pyarrow.parquet as pq

    def block_min(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy()
        hx = [hashlib.md5(str(int(i)).encode()).hexdigest() for i in ids]
        order = sorted(range(len(ids)), key=lambda j: (hx[j], int(ids[j])))[:n_seeds]
        return pa.table(
            {
                "vec_id": pa.array([int(ids[j]) for j in order], pa.int64()),
                "hx": pa.array([hx[j] for j in order], pa.string()),
            }
        )

    parts = (
        rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id"])
        .map_batches(block_min, batch_format="pyarrow")
        .to_pandas()
    )
    top = parts.sort_values(["hx", "vec_id"]).head(n_seeds)
    seed_ids = [int(v) for v in top["vec_id"]]
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", seed_ids)],
    )
    df = t.to_pandas().set_index("vec_id").loc[seed_ids]  # md5-rank order
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return np.asarray(seed_ids, dtype=np.int64), mat


def ann_ivf_checked(
    sf_dir: str,
    k: int = TOP_K,
    n_cells: int = ANN_CHECKED_CELLS,
    n_probe: int = ANN_CHECKED_PROBE,
) -> pd.DataFrame:
    """IVF ANN whose coarse quantizer is the content-keyed medoid set
    (:func:`_medoid_seeds`) instead of k-means — bit-deterministic AND
    fully SQL-replicable (``ann_ivf_checked_sql()``), so the driver can
    value-hash the whole stored-index → probe → rank path. Same scale
    shape as :func:`ann_ivf`: cell-partitioned stored index, partition-
    pruned probed read, exact cosine within cells. The medoid quantizer
    trades cell balance for checkability; the production quantizer stays
    k-means (:func:`ann_ivf`)."""
    import shutil
    import tempfile

    qids, qmat = _load_queries(sf_dir)
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    _, smat = _medoid_seeds(sf_dir, n_cells)
    sn = smat / np.maximum(np.linalg.norm(smat, axis=1, keepdims=True), 1e-30)

    index_dir = tempfile.mkdtemp(prefix="ivfc_idx_")
    try:
        build_ivf_index(sf_dir, index_dir, centroids=sn)
        # stable argsort: probe-order ties break by seed rank, like the SQL
        q_cells = np.argsort(-(qn @ sn.T), axis=1, kind="stable")[:, :n_probe]
        return _ivf_scan(index_dir, qids, qn, q_cells, k)
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)


def ann_ivf_checked_sql(
    k: int = TOP_K,
    n_cells: int = ANN_CHECKED_CELLS,
    n_probe: int = ANN_CHECKED_PROBE,
) -> str:
    """Full-stack DuckDB replica of :func:`ann_ivf_checked` — medoid seeds,
    nearest-seed cell assignment, probe-order, within-probe exact ranking."""
    return f"""
WITH seeds AS (
  SELECT vec_id AS svid, embedding AS se,
         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS srank
  FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT {n_cells}
), cells AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, s.srank AS cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY list_cosine_similarity(e.embedding, s.se) DESC,
                                       s.srank) AS rn
    FROM embeddings e CROSS JOIN seeds s
  ) WHERE rn = 1
), q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  ORDER BY vec_id LIMIT {N_QUERIES}
), probes AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, s.srank AS cell,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY list_cosine_similarity(q.qe, s.se) DESC,
                                       s.srank) AS rn
    FROM q CROSS JOIN seeds s
  ) WHERE rn <= {n_probe}
), scored AS (
  SELECT p.query_id, c.vec_id, list_cosine_similarity(q.qe, e.embedding) AS sim
  FROM probes p
  JOIN q ON q.query_id = p.query_id
  JOIN cells c ON c.cell = p.cell
  JOIN embeddings e ON e.vec_id = c.vec_id
), ranked AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
  FROM scored
)
SELECT query_id, rank, vec_id FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
"""


def _shifted_copy(t: pa.Table) -> pa.Table:
    """SQL-constructible planted near-dup: vec_id + DUP_OFFSET, first
    component shifted by SEM_CHECKED_SHIFT (float64 — exactly
    ``[embedding[1] + 0.1] || embedding[2:]`` in DuckDB). cosine(copy,
    source) ≈ 0.995 on unit-ish vectors — far above τ; random pairs stay
    far below — no knife edges at the threshold."""
    ids, mat = _batch_matrix(t)
    mat = mat.copy()
    if mat.shape[0]:
        mat[:, 0] += SEM_CHECKED_SHIFT
    return pa.table(
        {
            "vec_id": pa.array(ids + DUP_OFFSET, pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in mat], pa.list_(pa.float64())
            ),
        }
    )


def semantic_dedup_checked(
    sf_dir: str,
    threshold: float = SEM_CHECKED_TAU,
    n_cells: int = ANN_CHECKED_CELLS,
    chunk_rows: int = 1_024,
) -> pd.DataFrame:
    """SemDeDup variant that the driver can value-hash end-to-end: medoid
    cells (content-keyed, SQL-replicable) and the NEAREST-EARLIER-REP rule
    — rep(v) = min{u < v in v's cell : cos(u,v) ≥ τ}, else v — instead of
    the production path's union-find (transitive) grouping, which SQL
    cannot express without recursion. Corpus = embeddings ∪ shifted copies
    (:func:`_shifted_copy`). Returns (vec_id, rep_id, keep), sorted.

    Scale shape mirrors :func:`semantic_dedup`: broadcast seed matrix,
    vectorized cell assignment, ONE bounded ``groupby(cell)`` with chunked
    within-cell matmuls (peak memory chunk×m). ``n_cells`` is fixed so the
    generated oracle SQL is static; production sizing (cells ~ rows/2k)
    lives in :func:`semantic_dedup`."""
    import pyarrow.compute as pc

    _, smat = _medoid_seeds(sf_dir, n_cells)
    sn = smat / np.maximum(np.linalg.norm(smat, axis=1, keepdims=True), 1e-30)
    cref = ray.put(sn)

    def to64(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "embedding": pc.cast(t["embedding"], pa.list_(pa.float64())),
            }
        )

    base = _emb(sf_dir)
    ds = base.map_batches(to64, batch_format="pyarrow").union(
        base.map_batches(_shifted_copy, batch_format="pyarrow")
    )

    def assign(t: pa.Table) -> pa.Table:
        sn_ = ray.get(cref)
        ids, mat = _batch_matrix(t)
        matn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        cells = (matn @ sn_.T).argmax(axis=1).astype(np.int32)
        return t.append_column("cell", pa.array(cells))

    chunk = max(1, chunk_rows)
    imax = np.iinfo(np.int64).max

    def dedup_group(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy(dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        mat = np.stack(g["embedding"].to_numpy()[order]).astype(np.float64)
        matn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        m = len(ids)
        rep = ids.copy()
        jj = np.arange(m)[None, :]
        for lo in range(0, m, chunk):
            hi = min(lo + chunk, m)
            sims = matn[lo:hi] @ matn.T  # (hi−lo) × m slab
            valid = (sims >= threshold) & (jj < np.arange(lo, hi)[:, None])
            cand = np.where(valid, ids[None, :], imax)
            mn = cand.min(axis=1)
            has = mn < imax
            rep[lo:hi][has] = mn[has]
        return pd.DataFrame(
            {"vec_id": ids, "rep_id": rep, "keep": rep == ids}
        )

    out = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("cell")  # bounded key: n_cells cells
        .map_groups(dedup_group, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("vec_id").reset_index(drop=True)


def semantic_dedup_checked_sql(
    threshold: float = SEM_CHECKED_TAU,
    n_cells: int = ANN_CHECKED_CELLS,
    shift: float = SEM_CHECKED_SHIFT,
) -> str:
    """Full-stack DuckDB replica of :func:`semantic_dedup_checked` —
    shifted-copy corpus, medoid cells, nearest-earlier-rep within cells."""
    return f"""
WITH corpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  UNION ALL
  SELECT vec_id + {DUP_OFFSET},
         list_concat([embedding[1] + {shift}], CAST(embedding[2:] AS DOUBLE[]))
  FROM embeddings
), seeds AS (
  SELECT embedding AS se,
         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS srank
  FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT {n_cells}
), cells AS (
  SELECT vec_id, e, cell FROM (
    SELECT c.vec_id, c.e, s.srank AS cell,
           row_number() OVER (PARTITION BY c.vec_id
                              ORDER BY list_cosine_similarity(c.e, CAST(s.se AS DOUBLE[])) DESC,
                                       s.srank) AS rn
    FROM corpus c CROSS JOIN seeds s
  ) WHERE rn = 1
), reps AS (
  SELECT a.vec_id AS v, min(b.vec_id) AS rep
  FROM cells a JOIN cells b ON a.cell = b.cell AND b.vec_id < a.vec_id
  WHERE list_cosine_similarity(a.e, b.e) >= {threshold}
  GROUP BY a.vec_id
)
SELECT c.vec_id, coalesce(r.rep, c.vec_id) AS rep_id, (r.rep IS NULL) AS keep
FROM cells c LEFT JOIN reps r ON r.v = c.vec_id
ORDER BY c.vec_id
"""
