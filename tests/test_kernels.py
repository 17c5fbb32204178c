"""Unit tests for the scoring kernels: scrub, rules, langid, perplexity,
decision — the SURVEY.md §2 operator checklist at unit grain."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from data_quality_ray import config
from data_quality_ray.functions import models
from data_quality_ray.functions import text as T
from data_quality_ray.stages.decision import decision_batch
from data_quality_ray.synth.corpora import WORDS


# ---------------------------------------------------------------------------
# scrub
# ---------------------------------------------------------------------------


def test_scrub_masks_each_pattern():
    s, pii, tox = T.scrub_one("mail alice@example.com now")
    assert s == "mail <EMAIL> now" and pii and not tox
    s, pii, tox = T.scrub_one("call +1 555-123-4567 ok")
    assert s == "call <PHONE> ok" and pii
    s, pii, tox = T.scrub_one("ssn 123-45-6789 end")
    assert s == "ssn <ID> end" and pii
    s, pii, tox = T.scrub_one("you total Smeghead there")
    assert s == "you total <TOX> there" and tox and not pii


def test_scrub_non_match_untouched():
    for t in ("hello world", "version 1.2.3", "a-b-c", "x 12-34 y"):
        s, pii, tox = T.scrub_one(t)
        assert s == t and not pii and not tox


def test_scrub_longest_first_alternation():
    # "frakking" must not be partially masked as "<TOX>ing"
    s, _, _ = T.scrub_one("stop frakking around")
    assert s == "stop <TOX> around"


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_scrub_idempotent(t):
    once, _, _ = T.scrub_one(t)
    twice, _, _ = T.scrub_one(once)
    assert once == twice


# ---------------------------------------------------------------------------
# rules
# ---------------------------------------------------------------------------


def test_repetition_ratio_separates():
    clean = "the quick brown fox jumps over the lazy dog near town"
    looped = "buy now buy now buy now buy now buy now buy now"
    r = T.repetition_ratio([clean, looped])
    assert r[0] < config.REP_MAX < r[1]


def test_symbol_density_separates():
    r = T.symbol_density(["plain words only here", "@#$% ^&* !!?? %%++ $$"])
    assert r[0] < config.SYM_MAX < r[1]


# ---------------------------------------------------------------------------
# langid / perplexity
# ---------------------------------------------------------------------------


def _col(texts):
    return pa.chunked_array([pa.array(texts, pa.string())])


def test_langid_identifies_each_language():
    texts = [" ".join(WORDS[lang][:20]) for lang in sorted(WORDS)]
    lang, conf, _ = models.langid_scores(_col(texts))
    assert list(lang) == sorted(WORDS)
    assert (conf > config.LANG_CONF_MIN).all()


def test_langid_low_conf_on_junk():
    _, conf, _ = models.langid_scores(_col(["zrk vxq jzw qkx wvz xfj gzq pzk"]))
    assert conf[0] < config.LANG_CONF_MIN


def test_ppl_monotonic_garbage_vs_clean():
    clean = " ".join(WORDS["en"][:15])
    garbage = "xq9@kz#v7$wp2&mj5*qq8z"
    ppl = models.ppl_scores(_col([clean, garbage]))
    assert ppl[0] < config.PPL_MAX < ppl[1]


def test_langid_empty_and_null():
    arr = pa.chunked_array([pa.array(["", None, "ab"], pa.string())])
    lang, conf, _ = models.langid_scores(arr)
    assert conf[0] == 0.0 and conf[1] == 0.0
    assert lang[0] == "und" and lang[1] == "und"


# ---------------------------------------------------------------------------
# decision (measure.py:23-30 discrete mapping analogue)
# ---------------------------------------------------------------------------


def _decision_input(decode_ok, lang_conf, ppl, had_tox, flags):
    return pa.table(
        {
            "decode_ok": pa.array(decode_ok),
            "lang_conf": pa.array(lang_conf, pa.float32()),
            "ppl": pa.array(ppl, pa.float64()),
            "had_tox": pa.array(had_tox),
            "rule_flags": pa.array(flags, pa.list_(pa.string())),
        }
    )


def test_decision_discrete_score_set():
    t = _decision_input(
        decode_ok=[False, True, True, True, True],
        lang_conf=[1.0, 1.0, 0.1, 0.1, 1.0],
        ppl=[10.0, 10.0, 10.0, 1e6, 10.0],
        had_tox=[False, False, False, False, True],
        flags=[[], [], [], [], ["rep", "sym"]],
    )
    out = decision_batch(t)
    assert out["quality_score"].to_pylist() == [0.0, 1.0, 0.5, 0.2, 0.2]
    assert out["keep"].to_pylist() == [False, True, False, False, False]
    assert out["bucket"].to_pylist() == ["bad", "good", "mid", "bad", "bad"]
    assert out["n_defects"].to_pylist() == [0, 0, 1, 2, 3]


@settings(max_examples=100, deadline=None)
@given(
    st.booleans(),
    st.floats(0, 1),
    st.floats(1, 1e7),
    st.booleans(),
    st.lists(st.sampled_from(["rep", "sym", "len", "dur"]), max_size=4, unique=True),
)
def test_decision_score_always_in_discrete_set(ok, conf, ppl, tox, flags):
    out = decision_batch(_decision_input([ok], [conf], [ppl], [tox], [flags]))
    assert out["quality_score"].to_pylist()[0] in (0.0, 0.2, 0.5, 1.0)
    assert out["keep"].to_pylist()[0] == (out["quality_score"].to_pylist()[0] == 1.0)


# ---------------------------------------------------------------------------
# bloom filter
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_low_fp():
    from data_quality_ray.functions.hashing import BloomFilter

    rng = np.random.default_rng(1)
    members = rng.choice(10_000_000, 5_000, replace=False).astype(np.int64)
    bloom = BloomFilter(n_bits=1 << 16, n_hashes=5)
    bloom.add(members)
    assert bloom.contains(members).all()  # never a false negative
    non = np.setdiff1d(rng.choice(10_000_000, 50_000, replace=False), members)[:20_000]
    fp = bloom.contains(non.astype(np.int64)).mean()
    assert fp < 0.05, f"false-positive rate {fp:.3f}"


class TestBloomFilter:
    def test_membership_and_merge(self):
        import numpy as np

        from data_quality_ray.functions.sketches import (
            bloom_add,
            bloom_empty,
            bloom_merge,
            bloom_might_contain,
        )

        rng = np.random.default_rng(5)
        a_keys = rng.integers(0, 2**63, 500, dtype=np.int64).astype(np.uint64)
        b_keys = rng.integers(0, 2**63, 500, dtype=np.int64).astype(np.uint64)
        other = rng.integers(0, 2**63, 10000, dtype=np.int64).astype(np.uint64)
        a = bloom_add(bloom_empty(), a_keys)
        b = bloom_add(bloom_empty(), b_keys)
        # no false negatives, merge is union
        assert bloom_might_contain(a, a_keys).all()
        m = bloom_merge(a, b)
        assert bloom_might_contain(m, a_keys).all()
        assert bloom_might_contain(m, b_keys).all()
        # false-positive rate near theory: (1-e^{-kn/m})^k, n=1000,k=4,m=65536
        fp = bloom_might_contain(m, other).mean()
        assert fp < 0.01, fp
