"""Dedup family + similarity search: planted duplicates must be found."""

import numpy as np
import pandas as pd
import pytest

from data_quality_ray.pipelines import dedup, embeddings

SF_DIR = "/root/testdata/sf0.001"
N_DOCS = 500


@pytest.fixture(scope="module")
def _ray(ray_session):
    return ray_session


def test_exact_dedup_halves_doubled_corpus(_ray):
    out = dedup.exact_dedup(SF_DIR)
    # every duplicate pair collapses to the original id
    assert len(out) == N_DOCS
    assert (out["doc_id"] < dedup.DUP_OFFSET).all()


def _same_cluster_rate(out: pd.DataFrame) -> float:
    """Fraction of planted copies clustered together with their original.

    NOTE: the driver's documents table itself contains genuine near-dups
    (e.g. doc 8 vs doc 12 have word-3-gram jaccard 0.97), so cluster reps
    are not always the original's own id — the correct invariant is
    *same cluster*, not *rep == original id*.
    """
    rep = dict(zip(out["doc_id"], out["cluster_rep"]))
    hits = [
        rep[i + dedup.DUP_OFFSET] == rep[i]
        for i in out[out["doc_id"] < dedup.DUP_OFFSET]["doc_id"]
    ]
    return float(np.mean(hits))


@pytest.fixture(scope="module")
def minhash_result(_ray):
    """One distributed minhash run shared by the assertions below."""
    return dedup.minhash_dedup(SF_DIR)


@pytest.fixture(scope="module")
def brute_force_result(_ray):
    return embeddings.ann_brute_force(SF_DIR)


def test_minhash_dedup_finds_planted_near_dups(minhash_result):
    out = minhash_result
    assert len(out) == 2 * N_DOCS
    rate = _same_cluster_rate(out)
    assert rate >= 0.95, f"only {rate:.2%} of planted near-dups found"


def test_minhash_merges_are_genuinely_similar(minhash_result):
    """Any two ORIGINAL docs sharing a cluster must have high exact jaccard
    (no false positives from the LSH/banding)."""
    import pyarrow.parquet as pq

    out = minhash_result
    texts = (
        pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        .to_pandas()
        .set_index("doc_id")["text"]
    )
    orig = out[out["doc_id"] < dedup.DUP_OFFSET]
    merged = orig[orig["cluster_rep"] != orig["doc_id"]].head(50)
    for _, r in merged.iterrows():
        a = set(dedup._shingle_hashes(texts.loc[int(r["doc_id"])]).tolist())
        b_id = int(r["cluster_rep"]) % dedup.DUP_OFFSET
        b = set(dedup._shingle_hashes(texts.loc[b_id]).tolist())
        j = len(a & b) / len(a | b)
        assert j >= 0.4, f"docs {r['doc_id']} and {b_id} merged at jaccard {j:.2f}"


def test_simhash_dedup_clusters_consistent(_ray):
    out = dedup.simhash_dedup(SF_DIR)
    rate = _same_cluster_rate(out)
    # simhash radius ≤3 is deliberately conservative; the -2-token
    # perturbation flips more bits for ~half the docs (measured median 0,
    # p90 7) — require the conservative half plus verified merges only
    assert rate >= 0.4, f"simhash same-cluster rate {rate:.2%}"


def test_ngram_jaccard_pairs(_ray):
    out = dedup.ngram_jaccard_pairs(SF_DIR)
    assert set(out.columns) == {"a", "b", "jaccard"}
    planted = out[(out["b"] - out["a"]) == dedup.DUP_OFFSET]
    assert len(planted) >= 0.9 * N_DOCS
    assert (out["jaccard"] >= 0.5).all()


def test_ann_lsh_recall_vs_brute_force(brute_force_result):
    exact = brute_force_result
    approx = embeddings.ann_lsh(SF_DIR)
    recall_num = 0
    recall_den = 0
    for qid in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        recall_num += len(e & a)
        recall_den += len(e)
    recall = recall_num / recall_den
    assert recall >= 0.5, f"LSH recall@5 {recall:.2f}"
    # rank 1 must be the query itself in both (self-similarity = 1)
    r1 = exact[exact["rank"] == 1]
    assert (r1["vec_id"].values == r1["query_id"].values).all()


def test_embedding_near_dup_finds_planted_copies(_ray):
    pairs = embeddings.embedding_near_dup(SF_DIR)
    planted = pairs[(pairs["b"] - pairs["a"]) == embeddings.DUP_OFFSET]
    frac = len(planted) / N_DOCS
    assert frac >= 0.9, f"only {frac:.2%} of planted near-dup embeddings found"


def test_ann_ivf_recall_vs_brute_force(brute_force_result):
    exact = brute_force_result
    approx = embeddings.ann_ivf(SF_DIR)
    num = den = 0
    for qid in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        num += len(e & a)
        den += len(e)
    recall = num / den
    assert recall >= 0.6, f"IVF recall@5 {recall:.2f}"
    r1 = approx[approx["rank"] == 1]
    # the query vector itself is always in a probed cell (its own)
    assert (r1["vec_id"].values == r1["query_id"].values).all()


def test_distributed_components_match_union_find(_ray):
    """The groupby min-label propagation (scale path) must produce exactly
    the same clusters as driver union-find on the same verified pairs."""
    import pandas as pd

    pairs = pd.DataFrame({"a": [1, 2, 10, 11, 30], "b": [2, 3, 11, 12, 31]})
    all_ids = list(range(1, 4)) + list(range(10, 13)) + [30, 31, 99]
    via_uf = dedup._connected_components([tuple(r) for r in pairs.to_numpy()])
    expected = {i: via_uf.get(i, i) for i in all_ids}
    got = dedup.connected_components_distributed(pairs, all_ids)
    assert dict(zip(got["doc_id"], got["cluster_rep"])) == expected


def test_distributed_components_long_chain(_ray):
    """Convergence on a long path graph (the case a fixed round cap broke)."""
    import pandas as pd

    n = 1200
    pairs = pd.DataFrame({"a": range(n - 1), "b": range(1, n)})
    out = dedup.connected_components_distributed(pairs, list(range(n)))
    assert out["cluster_rep"].nunique() == 1
    assert (out["cluster_rep"] == 0).all()


def test_minhash_dedup_distributed_components_match(_ray, minhash_result):
    via_dist = dedup.minhash_dedup(SF_DIR, components="distributed")
    assert via_dist.equals(minhash_result)


def test_minhash_dedup_dataset_components_match(_ray, minhash_result):
    """Forced e2e run of the fully dataset-native CC mode (labels in a
    Dataset, co-partitioned join rounds, no driver pair list) — must be
    value-identical to the union-find default on the planted corpus."""
    via_ds = dedup.minhash_dedup(SF_DIR, components="dataset")
    assert via_ds.equals(minhash_result)


def test_cc_labels_dataset_matches_union_find(_ray):
    """Unit equivalence of the dataset-native label propagation vs driver
    union-find on a graph with chains, a clique, and an isolated edge."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    pairs = pd.DataFrame(
        {
            "a": [1, 2, 3, 10, 10, 11, 30, 50, 51, 52],
            "b": [2, 3, 4, 11, 12, 12, 31, 51, 52, 53],
        }
    )
    expected = dedup._connected_components([tuple(r) for r in pairs.to_numpy()])
    edges = rd.from_arrow(
        pa.table({"a": pa.array(pairs["a"], pa.int64()), "b": pa.array(pairs["b"], pa.int64())})
    )
    got = dedup._cc_labels_dataset(edges).to_pandas()
    assert dict(zip(got["node"], got["label"])) == expected


def test_cc_labels_dataset_empty_edges(_ray):
    import pyarrow as pa
    import ray.data as rd

    empty = rd.from_arrow(pa.schema([("a", pa.int64()), ("b", pa.int64())]).empty_table())
    assert dedup._cc_labels_dataset(empty).count() == 0


def test_ann_lsh_pruned_read_skips_unprobed_buckets(_ray, monkeypatch):
    """The stored-index LSH query path must physically read ONLY probed
    (table, code) buckets' files — the IVF pruning contract."""
    import glob
    import os

    captured = {}
    orig = embeddings.probed_bucket_paths

    def spy(index_dir, buckets):
        paths = orig(index_dir, buckets)
        all_files = set(glob.glob(os.path.join(index_dir, "tbl=*", "code=*", "*.parquet")))
        captured["n_all"] = len(all_files)
        captured["n_probed"] = len(paths)
        assert set(paths) <= all_files
        return paths

    monkeypatch.setattr(embeddings, "probed_bucket_paths", spy)
    out = embeddings.ann_lsh(SF_DIR)
    assert len(out) > 0
    assert 0 < captured["n_probed"] < captured["n_all"], "query did not skip unprobed buckets"


def test_lsh_index_partition_pruning(_ray, tmp_path):
    """The stored LSH index is (tbl, code)-partitioned, holds n_tables rows
    per vector, and a bucket-path read prunes to the named buckets."""
    import glob
    import os

    import ray.data as rd

    idx = str(tmp_path / "lsh")
    hp = embeddings.build_lsh_index(SF_DIR, idx, n_tables=4, n_bits=4)
    tbls = sorted(glob.glob(os.path.join(idx, "tbl=*")))
    assert len(tbls) == 4, "index not partitioned by table"
    full = rd.read_parquet(idx).count()
    assert full == 4 * N_DOCS  # one posting per vector per table
    some = embeddings.probed_bucket_paths(idx, [(0, 0), (0, 1), (1, 3)])
    assert some and all("/tbl=0/code=0/" in p or "/tbl=0/code=1/" in p
                        or "/tbl=1/code=3/" in p for p in some)
    sub = rd.read_parquet(some).count()
    assert 0 < sub < full, "pruned read did not prune"
    # hyperplanes are seeded: a rebuild probes identical buckets
    hp2 = embeddings.build_lsh_index(SF_DIR, str(tmp_path / "lsh2"), n_tables=4, n_bits=4)
    assert np.array_equal(hp.planes, hp2.planes)


def test_ann_ivf_pruned_read_skips_unprobed_cells(_ray, monkeypatch):
    """The IVF query path must physically read ONLY probed cells' files —
    asserts the constructed path list excludes unprobed partitions."""
    import glob
    import os

    captured = {}
    orig = embeddings.probed_cell_paths

    def spy(index_dir, cells):
        paths = orig(index_dir, cells)
        all_files = set(glob.glob(os.path.join(index_dir, "cell=*", "*.parquet")))
        captured["n_all"] = len(all_files)
        captured["n_probed"] = len(paths)
        assert set(paths) <= all_files
        return paths

    monkeypatch.setattr(embeddings, "probed_cell_paths", spy)
    out = embeddings.ann_ivf(SF_DIR, n_cells=16, n_probe=1)
    assert len(out) > 0
    assert 0 < captured["n_probed"] < captured["n_all"], "query did not skip unprobed cells"


def test_ivf_index_partition_pruning(_ray, tmp_path):
    """The stored IVF index is cell-partitioned and the query path's pruned
    read only touches probed cells' directories."""
    import glob
    import os

    import ray.data as rd

    idx = str(tmp_path / "ivf")
    embeddings.build_ivf_index(SF_DIR, idx, n_cells=8)
    cells = sorted(glob.glob(os.path.join(idx, "cell=*")))
    assert len(cells) >= 2, "index not partitioned by cell"
    probe = embeddings.probed_cell_paths(idx, [0, 1])
    assert all("/cell=0/" in p or "/cell=1/" in p for p in probe)
    sub = rd.read_parquet(probe).count()
    full = rd.read_parquet(idx).count()
    assert full == N_DOCS
    assert 0 < sub < full, "pruned read did not prune"


def test_doc_duplicate_spans_planted(_ray):
    """Substring-window dedup: the corpus's genuine near-dup docs must show
    shared windows; fully-unique docs must not."""
    out = dedup.doc_duplicate_spans(SF_DIR)
    assert len(out) == N_DOCS
    assert (out["n_shared"] <= out["n_windows"]).all()
    assert (out["n_shared"] > 0).sum() >= 10  # planted near-dups share spans
    assert (out["n_shared"] == 0).sum() >= 100  # most docs are unique


def test_minhash_checked_variant_finds_planted(_ray):
    """The SQL-reproducible minhash variant clusters like the production
    one: planted near-dups land with their originals."""
    out = dedup.minhash_dedup_checked(SF_DIR)
    assert len(out) == 2 * N_DOCS
    rate = _same_cluster_rate(out)
    assert rate >= 0.95, f"only {rate:.2%} of planted near-dups found"


def test_clip_audio_near_dup_finds_transcodes(_ray, clips_dir_1k):
    """Content-level audio dedup: transcoded copies (different codec, same
    waveform) must pair with their originals — byte hashing never could."""
    from data_quality_ray.pipelines import multimodal_dedup as md

    pairs = md.clip_audio_near_dup(clips_dir_1k, limit=400)
    planted = pairs[(pairs["b"] - pairs["a"]) == dedup.DUP_OFFSET]
    assert len(planted) >= 0.9 * 400 * 0.9  # ≥90% of decodable planted pairs


def test_image_near_dup_clusters_noised_copies(_ray):
    from data_quality_ray.pipelines import multimodal_dedup as md

    out = md.image_near_dup(n_images=200)
    rep = dict(zip(out["doc_id"], out["cluster_rep"]))
    orig = [i for i in rep if i < dedup.DUP_OFFSET]
    hits = [rep[i + dedup.DUP_OFFSET] == rep[i] for i in orig if i + dedup.DUP_OFFSET in rep]
    assert len(hits) > 100
    assert float(np.mean(hits)) >= 0.8, f"only {np.mean(hits):.0%} noised copies clustered"


def test_video_near_dup_clusters_noised_copies(_ray):
    from data_quality_ray.pipelines import multimodal_dedup as md

    out = md.video_near_dup(n_videos=60)
    rep = dict(zip(out["doc_id"], out["cluster_rep"]))
    orig = [i for i in rep if i < dedup.DUP_OFFSET]
    hits = [rep[i + dedup.DUP_OFFSET] == rep[i] for i in orig]
    assert len(hits) == 60
    assert float(np.mean(hits)) >= 0.8, f"only {np.mean(hits):.0%} noised videos clustered"


def test_cluster_output_modes_equivalent_across_ops(_ray):
    """Every near-dup operator that routes through ``_cluster_output`` must
    give identical clusters under the dataset-native CC mode (the 100-TB
    path) as under driver union-find. simhash and jaccard exercise the text
    family; image exercises the multimodal callers of the shared helper."""
    from data_quality_ray.pipelines import multimodal_dedup as md

    for fn, kwargs in [
        (dedup.simhash_dedup, {"sf_dir": SF_DIR}),
        (dedup.jaccard_cluster_reps, {"sf_dir": SF_DIR}),
        (md.image_near_dup, {"n_images": 120}),
    ]:
        base = fn(**kwargs)
        via_ds = fn(**kwargs, components="dataset")
        assert via_ds.equals(base), f"{fn.__name__}: dataset CC diverged"


def test_cluster_output_rejects_unknown_mode(_ray):
    with pytest.raises(ValueError, match="unknown components mode"):
        dedup.simhash_dedup(SF_DIR, components="bogus")


def test_semantic_dedup_auto_cells_and_chunking(_ray):
    """Cell count derives from corpus size; the chunked similarity matmul
    must be value-identical to the one-slab path (forced chunk_rows=37
    makes the 1000-row corpus run ~27 slabs)."""
    # 1000 rows → auto n_cells = max(16, ceil(1000/2048)) = 16
    base = embeddings.semantic_dedup(SF_DIR)
    chunked = embeddings.semantic_dedup(SF_DIR, chunk_rows=37)
    assert chunked.equals(base), "chunked matmul diverged from one-slab path"


def test_semantic_dedup_many_cells_pins_recall_tradeoff(_ray):
    """With n_cells pushed far past rows/2k (64 cells for 1000 rows), some
    source→copy neighborhoods straddle a cell boundary: SemDeDup's
    documented recall loss. The output must stay structurally sound —
    every row present, reps are kept rows, unmerged copies self-rep —
    and the within-cell merges it does find must still be right."""
    out = embeddings.semantic_dedup(SF_DIR, n_cells=64)
    assert len(out) == 2 * N_DOCS and out["vec_id"].is_unique
    rep = dict(zip(out["vec_id"], out["cluster_rep"]))
    keep = dict(zip(out["vec_id"], out["keep"]))
    for vid, r in rep.items():
        assert keep[r], f"cluster_rep {r} of {vid} is not a kept row"
        assert rep[r] == r, f"cluster_rep {r} is not its own rep"
    copies = out[out["vec_id"] >= embeddings.DUP_OFFSET]
    merged = copies[copies["cluster_rep"] == copies["vec_id"] - embeddings.DUP_OFFSET]
    unmerged = copies[copies["cluster_rep"] == copies["vec_id"]]
    # every copy either merged to its source (same cell) or became its own
    # rep (cell-boundary miss) — never merged to an unrelated vector
    # (random gaussians never reach cosine 0.92)
    assert len(merged) + len(unmerged) == N_DOCS
    assert not merged["keep"].any() and unmerged["keep"].all()
    # the quantizer is deterministic (seeded sample + seeded k-means), so
    # same-cell copies must still merge: the split can't erase everything
    assert len(merged) > 0


def test_semantic_dedup_drops_planted_copies(_ray):
    out = embeddings.semantic_dedup(SF_DIR)
    assert len(out) == 2 * N_DOCS and out["vec_id"].is_unique
    copies = out[out["vec_id"] >= embeddings.DUP_OFFSET]
    # a noisy copy is cosine ≈ 0.999 to its source: when both land in the
    # same k-means cell (the common case) the copy must lose to the source
    merged = copies[copies["cluster_rep"] == copies["vec_id"] - embeddings.DUP_OFFSET]
    frac = len(merged) / N_DOCS
    assert frac >= 0.9, f"only {frac:.2%} of planted copies deduped to their source"
    assert not merged["keep"].any()
    # sources of merged pairs survive
    src = out[out["vec_id"].isin(merged["vec_id"] - embeddings.DUP_OFFSET)]
    assert src["keep"].all()
    # non-duplicate originals are their own representative
    originals = out[out["vec_id"] < embeddings.DUP_OFFSET]
    self_rep = originals[originals["cluster_rep"] == originals["vec_id"]]
    assert len(self_rep) == N_DOCS  # random gaussians never collide at 0.92


def test_ann_ivf_checked_matches_its_sql_replica(_ray):
    """The medoid-quantizer IVF must value-match its generated DuckDB
    replica (the driver-oracle contract) AND keep useful recall vs brute
    force (3/8 probes of a content-keyed medoid quantizer ≈ 0.6 recall@5
    on random gaussians — the documented checkability trade-off)."""
    import duckdb

    got = embeddings.ann_ivf_checked(SF_DIR)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    exp = con.execute(embeddings.ann_ivf_checked_sql()).df()
    assert got.reset_index(drop=True).astype("int64").equals(exp.astype("int64"))

    bf = embeddings.ann_brute_force(SF_DIR)
    bs = set(map(tuple, bf[["query_id", "vec_id"]].to_numpy()))
    ivs = set(map(tuple, got[["query_id", "vec_id"]].to_numpy()))
    assert len(bs & ivs) / len(bs) >= 0.5


def test_semantic_dedup_checked_matches_sql_and_planted_truth(_ray):
    """Nearest-earlier-rep SemDeDup: value-identical to its DuckDB replica,
    and the SQL-constructible planted copies (first component +0.1) resolve
    to their source whenever both land in the same medoid cell (≥85%;
    cell-boundary misses keep themselves, never merge to a stranger)."""
    import duckdb

    out = embeddings.semantic_dedup_checked(SF_DIR)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    exp = con.execute(embeddings.semantic_dedup_checked_sql()).df()
    assert np.array_equal(out["vec_id"].to_numpy(), exp["vec_id"].to_numpy())
    assert np.array_equal(out["rep_id"].to_numpy(), exp["rep_id"].to_numpy())
    assert np.array_equal(out["keep"].to_numpy(), exp["keep"].to_numpy())

    assert len(out) == 2 * N_DOCS and out["vec_id"].is_unique
    copies = out[out["vec_id"] >= embeddings.DUP_OFFSET]
    merged = copies[copies["rep_id"] == copies["vec_id"] - embeddings.DUP_OFFSET]
    unmerged = copies[copies["rep_id"] == copies["vec_id"]]
    assert len(merged) + len(unmerged) == N_DOCS  # never a stranger rep
    assert len(merged) / N_DOCS >= 0.85
    assert not merged["keep"].any() and unmerged["keep"].all()
    originals = out[out["vec_id"] < embeddings.DUP_OFFSET]
    assert (originals["rep_id"] == originals["vec_id"]).all()
