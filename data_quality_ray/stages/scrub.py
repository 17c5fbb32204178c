"""PII / toxicity scrub stage — in-place transcript rewrite.

North-rule requirement; reference analogue is the payload-repair role of
``clean_data`` (eeg_datasets.py:162-164): the record is repaired, not
dropped. Rules are totally ordered and RE2-compatible so the DuckDB oracle
reproduces the rewrite byte-for-byte (functions/text.py SCRUB_RULES).
Idempotent: scrub(scrub(x)) == scrub(x) (property-tested).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from data_quality_ray.functions.text import scrub_one


class ScrubStage:
    """Callable class so compiled regexes are process-cached.

    Patterns are module-level compiled already; the class exists to match the
    stateful-stage protocol (actor pool) and to hold any future large pattern
    tables loaded once per worker.
    """

    def __init__(self) -> None:
        from data_quality_ray.functions.text import ANY_SCRUB_RE, SCRUB_RULES  # compile once

        self._rules = SCRUB_RULES
        self._any = ANY_SCRUB_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["transcript"].to_pylist()
        n = len(texts)
        out = [""] * n
        pii = np.zeros(n, dtype=bool)
        tox = np.zeros(n, dtype=bool)
        any_search = self._any.search
        for i, t in enumerate(texts):
            t = t or ""
            # clean rows (the common case) skip the ordered 4-pass rewrite;
            # no ANY_SCRUB_RE match ⇔ no individual rule matches
            if any_search(t) is None:
                out[i] = t
            else:
                out[i], pii[i], tox[i] = scrub_one(t)
        return (
            batch.append_column("transcript_scrubbed", pa.array(out, pa.string()))
            .append_column("had_pii", pa.array(pii))
            .append_column("had_tox", pa.array(tox))
        )


def scrub_batch(batch: pa.Table) -> pa.Table:
    """Stateless function form (used by the oracle and small pipelines)."""
    return ScrubStage()(batch)
