"""Heuristic rule filters — stateless per-batch featurizer + flag emitter.

Graft analogue of the artifact counter (eeg_features.py:18-40): each rule is
a cheap per-record detector emitting a named flag; the flag list (plus the
langid/ppl defects and decode failure) feeds the discrete score in the
decision stage. Rules are computed on the *scrubbed* transcript — the
repair-then-assess order of the reference (nan_to_num before featurization,
eeg_datasets.py:162-164 → :190-202).

Rules (thresholds in config.py):
  rep  — repetition ratio (looped text)
  sym  — symbol/digit density
  len  — transcript length vs duration-implied speech length (CHARS_PER_SEC)
  dur  — decoded audio duration vs declared dur_ms consistency
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from data_quality_ray import config
from data_quality_ray.functions import text as T
from data_quality_ray.synth.clips import CHARS_PER_SEC


def rules_batch(batch: pa.Table) -> pa.Table:
    texts = batch["transcript_scrubbed"].to_pylist()
    n = len(texts)
    rep = T.repetition_ratio(texts)
    sym = T.symbol_density(texts)
    chars = T.char_lengths(texts).astype(np.float64)
    dur_s = batch["dur_ms"].to_numpy().astype(np.float64) / 1000.0
    expected_chars = np.maximum(dur_s * CHARS_PER_SEC, 1.0)
    len_ratio = chars / expected_chars

    decode_ok = batch["decode_ok"].to_numpy(zero_copy_only=False)
    n_samples = batch["n_samples"].to_numpy().astype(np.float64)
    sr = batch["sr_hz"].to_numpy().astype(np.float64)
    dur_err = np.abs(n_samples / sr - dur_s) / np.maximum(dur_s, 1e-9)

    flag_rep = rep > config.REP_MAX
    flag_sym = sym > config.SYM_MAX
    flag_len = (len_ratio < config.LEN_RATIO_MIN) | (len_ratio > config.LEN_RATIO_MAX)
    flag_dur = decode_ok & (dur_err > config.DUR_TOL)

    flags: list[list[str]] = []
    for i in range(n):
        f = []
        if flag_rep[i]:
            f.append("rep")
        if flag_sym[i]:
            f.append("sym")
        if flag_len[i]:
            f.append("len")
        if flag_dur[i]:
            f.append("dur")
        flags.append(f)

    return (
        batch.append_column("rep_ratio", pa.array(rep, pa.float64()))
        .append_column("sym_density", pa.array(sym, pa.float64()))
        .append_column("len_ratio", pa.array(len_ratio, pa.float64()))
        .append_column("rule_flags", pa.array(flags, pa.list_(pa.string())))
    )
