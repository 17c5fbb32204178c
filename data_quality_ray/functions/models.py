"""Hashed char-trigram language-ID and n-gram LM perplexity models.

From-scratch, numpy-vectorized stand-ins for fastText langid and a KenLM-style
n-gram LM (the north rule demands from-scratch, and neither lib is in the
sandbox). Both use the same feature space: UTF-8 byte trigrams hashed into a
fixed table (the fastText hashing-trick idea, public knowledge), so scoring a
batch is a pure numpy gather+reduceat over Arrow string buffers — no Python
per-row loop in the hot path.

Reference-role mapping (SURVEY.md §2.3): langid plays the categorical
label-assignment role (eeg_datasets.py:40's vocabulary); the perplexity score
plays the normalized spectral-"badness" role of eeg_features.py:49-71 (a
relative, normalized energy — here negative mean log-prob per trigram).

Models are trained deterministically at first use from the built-in corpora
(synth/corpora.py) and cached per process; actor stages call ``get_*_model()``
in ``__init__`` so training happens once per worker (T1 pattern,
eeg_features.py:82-87).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from data_quality_ray.synth.corpora import LANGS, WORDS

TABLE_BITS = 16
TABLE_SIZE = 1 << TABLE_BITS
_PAD = 0x20  # space byte pads word boundaries


def _trigram_ids_bytes(data: np.ndarray) -> np.ndarray:
    """Hash every byte trigram of a uint8 array into [0, TABLE_SIZE)."""
    if len(data) < 3:
        return np.empty(0, dtype=np.int64)
    d = data.astype(np.int64)
    return ((d[:-2] * 31 + d[1:-1]) * 31 + d[2:]) % TABLE_SIZE


def _text_trigram_ids(text: str) -> np.ndarray:
    b = np.frombuffer((" " + text.lower() + " ").encode("utf-8"), dtype=np.uint8)
    return _trigram_ids_bytes(b)


def _counts_for_corpus(text: str) -> np.ndarray:
    ids = _text_trigram_ids(text)
    return np.bincount(ids, minlength=TABLE_SIZE).astype(np.float64)


class LangIdModel:
    """Multinomial NB over hashed char trigrams; argmax lang + posterior."""

    def __init__(self, corpora: dict[str, str], alpha: float = 0.5):
        self.langs = tuple(sorted(corpora))
        logp = np.empty((len(self.langs), TABLE_SIZE), dtype=np.float64)
        for i, lang in enumerate(self.langs):
            c = _counts_for_corpus(corpora[lang]) + alpha
            logp[i] = np.log(c / c.sum())
        self.logp = logp  # (L, TABLE_SIZE)

    def score_rows(
        self, data: np.ndarray, offsets: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Score rows of an Arrow-layout byte buffer — fully vectorized.

        One gather + one masked ``np.add.reduceat`` over the whole batch
        buffer scores every row at once (no per-row python loop): trigram
        ids are computed over the concatenated buffer, positions whose
        trigram crosses a row boundary are weight-zeroed, and per-row sums
        come from reduceat at the row offsets.

        Returns (lang_idx int32, conf float32, mean_logp float32) per row;
        rows shorter than 3 bytes get lang_idx=-1, conf=0, mean_logp=-inf.
        """
        n = len(offsets) - 1
        lang_idx = np.full(n, -1, dtype=np.int32)
        conf = np.zeros(n, dtype=np.float32)
        mean_lp = np.full(n, -np.inf, dtype=np.float32)
        N = len(data)
        if N < 3 or n == 0:
            return lang_idx, conf, mean_lp
        all_ids = _trigram_ids_bytes(data)  # length N-2, crossing ids included
        sel = self.logp[:, all_ids]  # (L, N-2)
        w = np.ones(N - 2, dtype=np.float64)
        for off in (2, 1):  # the last `off` positions before each boundary cross it
            idx = offsets[1:] - off
            idx = idx[(idx >= 0) & (idx < N - 2)]
            w[idx] = 0.0
        padded = np.zeros((sel.shape[0], N), dtype=np.float64)
        padded[:, : N - 2] = sel * w
        starts = np.minimum(offsets[:-1], N - 1)
        sums = np.add.reduceat(padded, starts, axis=1)  # (L, n)
        counts = np.maximum((offsets[1:] - offsets[:-1]) - 2, 0)
        valid = counts > 0
        if not valid.any():
            return lang_idx, conf, mean_lp
        s = sums[:, valid] / counts[valid]  # (L, n_valid) per-trigram means
        best = np.argmax(s, axis=0)
        s_best = s[best, np.arange(s.shape[1])]
        z = np.exp((s - s_best[None, :]) * 8.0).sum(axis=0)
        lang_idx[valid] = best.astype(np.int32)
        conf[valid] = (1.0 / z).astype(np.float32)
        mean_lp[valid] = s_best.astype(np.float32)
        return lang_idx, conf, mean_lp


class NgramLM:
    """Interpolated char bigram/trigram LM (KenLM-style role): ppl per row."""

    def __init__(self, corpus: str, alpha: float = 0.1, lam: float = 0.7):
        tri = _counts_for_corpus(corpus) + alpha
        self.logp3 = np.log(tri / tri.sum())
        b = np.frombuffer((" " + corpus.lower() + " ").encode(), dtype=np.uint8)
        d = b.astype(np.int64)
        bi_ids = (d[:-1] * 31 + d[1:]) % TABLE_SIZE
        bi = np.bincount(bi_ids, minlength=TABLE_SIZE).astype(np.float64) + alpha
        self.logp2 = np.log(bi / bi.sum())
        self.lam = lam

    def ppl_rows(self, data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        """Perplexity per row — vectorized (same reduceat scheme as langid)."""
        n = len(offsets) - 1
        out = np.full(n, np.inf, dtype=np.float64)
        N = len(data)
        if N < 3 or n == 0:
            return out
        d = data.astype(np.int64)
        tri_all = _trigram_ids_bytes(data)
        bi_all = (d[:-1] * 31 + d[1:]) % TABLE_SIZE
        lp = self.lam * self.logp3[tri_all] + (1 - self.lam) * self.logp2[bi_all[: N - 2]]
        w = np.ones(N - 2, dtype=np.float64)
        for off in (2, 1):
            idx = offsets[1:] - off
            idx = idx[(idx >= 0) & (idx < N - 2)]
            w[idx] = 0.0
        padded = np.zeros(N, dtype=np.float64)
        padded[: N - 2] = lp * w
        starts = np.minimum(offsets[:-1], N - 1)
        sums = np.add.reduceat(padded, starts)
        counts = np.maximum((offsets[1:] - offsets[:-1]) - 2, 0)
        valid = counts > 0
        out[valid] = np.exp(-sums[valid] / counts[valid])
        return np.minimum(out, np.float64(1e9))


def _training_text(lang: str) -> str:
    # words joined with spaces, twice, so boundary trigrams are well covered
    ws = WORDS[lang]
    return " ".join(ws + ws[::-1])


@lru_cache(maxsize=1)
def get_langid_model() -> LangIdModel:
    return LangIdModel({lang: _training_text(lang) for lang in LANGS})


@lru_cache(maxsize=1)
def get_lm() -> NgramLM:
    return NgramLM(" ".join(_training_text(lang) for lang in LANGS))


# ---------------------------------------------------------------------------
# Arrow adapters
# ---------------------------------------------------------------------------


def string_parts(arr: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """(data uint8, offsets) of a lowercased, space-padded string column.

    Pads each row with a leading/trailing space (word-boundary context) by
    going through a python list — costs one pass; the scoring itself stays
    numpy. Null rows become empty strings.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type):
        # blocks are far below 2GB — safe to narrow for the int32-offset path
        arr = arr.cast(pa.string())
    lowered = pc.utf8_lower(arr)
    padded = pc.binary_join_element_wise(
        pa.scalar(" "), pc.fill_null(lowered, ""), pa.scalar(" "), ""
    )
    comb = padded.combine_chunks() if isinstance(padded, pa.ChunkedArray) else padded
    offs = np.frombuffer(comb.buffers()[1], dtype=np.int32)[
        comb.offset : comb.offset + len(comb) + 1
    ].astype(np.int64)
    data = np.frombuffer(comb.buffers()[2], dtype=np.uint8)
    return data, offs


def langid_scores(arr: pa.Array | pa.ChunkedArray):
    """(lang string array, conf float32, mean_logp float32) for a column."""
    model = get_langid_model()
    data, offs = string_parts(arr)
    idx, conf, mlp = model.score_rows(data, offs)
    langs = np.array(model.langs + ("und",))
    lang = langs[np.where(idx >= 0, idx, len(model.langs))]
    return lang, conf, mlp


def ppl_scores(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    data, offs = string_parts(arr)
    return get_lm().ppl_rows(data, offs)
