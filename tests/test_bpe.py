"""Distributed BPE trainer vs the from-scratch sequential reference."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def tiny_corpus(tmp_path_factory):
    """Deterministic ~80-doc corpus with heavy pair structure and ties."""
    rng = np.random.default_rng(13)
    vocab = ["lower", "newest", "widest", "low", "new", "wide", "est", "er", "spark", "ray"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(5, 30)))
        for _ in range(80)
    ]
    d = tmp_path_factory.mktemp("bpe_corpus")
    pd.DataFrame(
        {"doc_id": np.arange(len(texts)), "text": texts,
         "lang": "en", "source": "synth", "n_chars": [len(t) for t in texts]}
    ).to_parquet(d / "documents.parquet")
    return str(d), texts


def test_bpe_matches_sequential_reference(ray_session, tiny_corpus):
    from data_quality_ray.pipelines import bpe

    sf_dir, texts = tiny_corpus
    got = bpe.train_bpe_merges(sf_dir, n_merges=12)
    want = bpe.bpe_reference(texts, n_merges=12)
    pd.testing.assert_frame_equal(got, want)
    assert len(got) == 12
    # merges are learned greedily: counts never increase
    assert (np.diff(got["pair_count"].to_numpy()) <= 0).all()


def test_bpe_merge_apply_handles_overlaps():
    """Greedy leftmost merging: 'aaaa' with pair (a,a) → 'aa','aa' not 3×."""
    import pyarrow as pa

    from data_quality_ray.pipelines.bpe import _apply_merge

    t = pa.table(
        {"word": pa.array(["aaaa"]), "n": pa.array([1], pa.int64()),
         "symbols": pa.array([["a", "a", "a", "a", "</w>"]], pa.list_(pa.string()))}
    )
    out = _apply_merge(t, "a", "a")
    assert out["symbols"].to_pylist() == [["aa", "aa", "</w>"]]


def test_bpe_reference_tie_break_lexicographic():
    from data_quality_ray.pipelines.bpe import bpe_reference

    # all four pairs tie at count 2; lexicographic min is (a, </w>)
    m = bpe_reference(["ab ba", "ab ba"], n_merges=1)
    assert (m.iloc[0]["left"], m.iloc[0]["right"]) == ("a", "</w>")
    assert int(m.iloc[0]["pair_count"]) == 2


def test_bpe_token_counts_matches_reference_apply(ray_session, tiny_corpus):
    from collections import Counter

    from data_quality_ray.functions import text as T
    from data_quality_ray.pipelines import bpe

    sf_dir, texts = tiny_corpus
    got = bpe.bpe_token_counts(sf_dir, n_merges=8)
    # sequential apply of the reference merge sequence
    wc = Counter()
    for x in texts:
        wc.update(T.ws_tokens(x.lower()))
    vocab = {w: list(w) + [bpe.END_OF_WORD] for w in wc}
    for _, r in bpe.bpe_reference(texts, n_merges=8).iterrows():
        a, b = r["left"], r["right"]
        for w, s in vocab.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            vocab[w] = out
    want = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts)),
            "n_words": [len(T.ws_tokens(x.lower())) for x in texts],
            "n_bpe_tokens": [
                sum(len(vocab[w]) for w in T.ws_tokens(x.lower())) for x in texts
            ],
        }
    ).astype("int64")
    pd.testing.assert_frame_equal(got, want)
    # merges strictly reduce token counts vs raw chars+marker
    assert (got["n_bpe_tokens"] < want["n_words"] * 30).all()
