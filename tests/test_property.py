"""Property-based tests (hypothesis) for the pure kernels whose edge cases
are hard to enumerate by hand: image codec round-trips, the batch-wide
jaccard verifier, batch simhash vs its per-doc definition, HLL merge, and
the prefix-filter candidate bound. No Ray session needed — everything here
is a pure function."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from data_quality_ray.functions import image_codecs as ic
from data_quality_ray.functions import sketches as sk
from data_quality_ray.functions import text as T
from data_quality_ray.pipelines import dedup

SET = settings(max_examples=25, deadline=None)


@SET
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_bmp_roundtrip_any_shape(h, w, seed):
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(ic.decode_png(ic.encode_png(img)), img)
    assert np.array_equal(ic.decode_bmp(ic.encode_bmp(img)), img)


@SET
@given(
    data=st.lists(
        st.tuples(
            st.sets(st.integers(0, 50), min_size=1, max_size=40),
            st.sets(st.integers(0, 50), min_size=1, max_size=40),
        ),
        min_size=1,
        max_size=12,
    ),
    threshold=st.sampled_from([0.3, 0.5, 0.8]),
)
def test_verify_jaccard_batch_matches_set_arithmetic(data, threshold):
    """The lexsort duplicate-count verifier == plain python set jaccard."""
    a_ids = np.arange(len(data), dtype=np.int64)
    b_ids = a_ids + 1000
    t = pa.table(
        {
            "a": pa.array(a_ids),
            "b": pa.array(b_ids),
            "sig_a": pa.array(
                [sorted(np.uint64(x) for x in sa) for sa, _ in data],
                pa.list_(pa.uint64()),
            ),
            "sig_b": pa.array(
                [sorted(np.uint64(x) for x in sb) for _, sb in data],
                pa.list_(pa.uint64()),
            ),
        }
    )
    out = dedup._verify_jaccard_batch(t, threshold)
    got = dict(zip(out["a"].to_pylist(), out["jaccard"].to_pylist()))
    for i, (sa, sb) in enumerate(data):
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            assert got[int(a_ids[i])] == j
        else:
            assert int(a_ids[i]) not in got


@SET
@given(texts=st.lists(st.text(max_size=60), min_size=1, max_size=10))
def test_simhash_batch_equals_per_doc(texts):
    batch = dedup._simhash64(texts)
    for i, t in enumerate(texts):
        single = dedup._simhash64([t])[0]
        assert batch[i] == single


@SET
@given(
    vals=st.lists(st.integers(-(2**40), 2**40), min_size=0, max_size=400),
    cut=st.integers(0, 400),
)
def test_hll_merge_equals_single_pass(vals, cut):
    arr = np.asarray(vals, dtype=np.int64)
    cut = min(cut, len(arr))
    one = sk.hll_accumulate(sk.hll_empty(), arr)
    two = sk.hll_merge(
        sk.hll_accumulate(sk.hll_empty(), arr[:cut]),
        sk.hll_accumulate(sk.hll_empty(), arr[cut:]),
    )
    assert np.array_equal(one, two)


@SET
@given(
    sets=st.lists(
        st.sets(st.integers(0, 200), min_size=1, max_size=50),
        min_size=2,
        max_size=8,
    ),
    threshold=st.sampled_from([0.3, 0.5, 0.7, 1.0]),
)
def test_prefix_filter_bound_is_exact(sets, threshold):
    """Every pair with J ≥ t must share a prefix shingle (the AllPairs
    bound `_prefix_rows` relies on) — checked directly on the arrays."""
    arrs = [np.array(sorted(s), dtype=np.uint64) for s in sets]
    for i in range(len(arrs)):
        for j in range(i + 1, len(arrs)):
            sa, sb = set(arrs[i].tolist()), set(arrs[j].tolist())
            jac = len(sa & sb) / len(sa | sb)
            if jac < threshold:
                continue
            def prefix(a):
                p = int(np.clip(len(a) - int(np.ceil(threshold * len(a))) + 1, 1, len(a)))
                return set(a[:p].tolist())
            assert prefix(arrs[i]) & prefix(arrs[j]), (
                f"pair with J={jac:.2f} ≥ {threshold} shares no prefix shingle"
            )


@SET
@given(text=st.text(max_size=120))
def test_gram_strings_match_shingle_semantics(text):
    """The SQL-mirroring gram strings and the hash shingles agree on the
    document-identity cases (empty / <3 tokens)."""
    grams = dedup._gram_strings(text)
    assert len(grams) >= 1
    nt = T.normalize_for_fingerprint(text)
    toks = nt.split(" ") if nt else []
    if nt == "":
        assert grams == [""]
    elif len(toks) < 3:
        assert grams == [nt]
    else:
        assert len(grams) == len({" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)})
