"""Pipeline thresholds and tuning knobs — one place, shared by stages+oracle.

Score semantics mirror the reference's discrete agreement→score mapping
(measure.py:23-30: 0 defects → 1.0, 1 defect → 0.5, more → 0.2, invalid
record → 0.0) and its bucket thresholds (runme.py:29-31: >0.75 good,
<0.25 bad). Rule thresholds were calibrated on the synthetic corpus so each
planted defect class separates from clean text with wide margin (see
tests/test_rules.py).
"""

# defect thresholds (computed on the scrubbed transcript)
LANG_CONF_MIN = 0.70   # langid posterior below this → "lang" defect
PPL_MAX = 25_000.0     # LM perplexity above this → "ppl" defect
REP_MAX = 0.55         # repetition ratio (1 - distinct/total tokens) above → "rep"
SYM_MAX = 0.40         # symbol+digit char fraction above → "sym"
LEN_RATIO_MIN = 0.25   # chars per expected-chars (speech-rate link) outside
LEN_RATIO_MAX = 3.00   # [min, max] → "len"
DUR_TOL = 0.25         # |decoded_sec − dur_ms/1000| / (dur_ms/1000) above → "dur"

# discrete score set (measure.py:23-30 analogue)
SCORE_INVALID = 0.0
SCORE_PERFECT = 1.0
SCORE_ONE_DEFECT = 0.5
SCORE_MANY_DEFECTS = 0.2

# bucket thresholds (runme.py:29-31)
BUCKET_GOOD_MIN = 0.75
BUCKET_BAD_MAX = 0.25

# execution knobs
CLIP_BATCH_SIZE = 1024        # rows per batch for audio-carrying stages
TEXT_BATCH_SIZE = 4096        # rows per batch for text-only stages
STATS_SALT = 16               # salt fan-out for skewed per-language groupby


def actor_pool_bounds() -> tuple[int, int]:
    """Actor pool (min, max) for the langid / perplexity stages.

    The pools carry only the light text stages (scrub fuses into langid;
    see pipelines/quality.py stage-order comment) — the heavy decode runs
    as tasks after the pools. min=1 so two pools can never pin a small
    session's CPUs at startup (fixed-size pools deadlock a 4-CPU session);
    max = a quarter of the machine each, leaving the bulk for the decode
    task stage and the reader.
    """
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    except Exception:
        cpus = 4
    return (1, max(2, cpus // 4))
