"""Rehearse the driver's correctness gate locally.

Runs ``entry()`` plus every ``queries()`` entry at the given sf(s),
compares each against its ``oracle_sql()`` in DuckDB exactly (the
CORRECTNESS_r{N} check), and requires rows-only queries to return rows.
Owns a local Ray session (the real driver inits Ray itself before
importing __ray_entry__). With no args it rehearses BOTH sf0.001 and
sf0.01 in the one cold session (the round-3 gate) and flags any query
slower than the 60 s per-query budget.

Usage:  python tools/driver_rehearsal.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


PER_QUERY_BUDGET_S = 60.0


def rehearse_sf(em, sf_dir: str) -> tuple[list[str], list[str]]:
    """Run every query at one sf; returns (fails, over_budget)."""
    import duckdb
    import numpy as np
    import pandas as pd

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, sqls = em.queries(), em.oracle_sql()
    fails: list[str] = []
    slow: list[str] = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            out = fn(sf_dir)
            if not isinstance(out, pd.DataFrame):
                out = out.to_pandas() if hasattr(out, "to_pandas") else out
            status = "rows-only"
            if name in sqls:
                want = con.execute(sqls[name]).df()
                g = out[sorted(out.columns)].sort_values(sorted(out.columns)).reset_index(drop=True)
                w = want[sorted(want.columns)].sort_values(sorted(want.columns)).reset_index(drop=True)
                ok = list(g.columns) == list(w.columns) and len(g) == len(w) and all(
                    (g[c].to_numpy() == w[c].to_numpy()).all()
                    if g[c].dtype.kind != "f"
                    else np.array_equal(g[c].to_numpy(), w[c].to_numpy())
                    for c in g.columns
                )
                status = "SQL-OK" if ok else "SQL-MISMATCH"
                if not ok:
                    fails.append(name)
            elif len(out) == 0:
                status = "EMPTY"
                fails.append(name)
            dt = time.time() - t0
            if dt > PER_QUERY_BUDGET_S:
                slow.append(f"{name} ({dt:.0f}s)")
            print(f"  {name:28s} rows={len(out):6d} {status} ({dt:.1f}s)")
        except Exception as e:  # noqa: BLE001 — rehearsal must report, not die
            fails.append(name)
            print(f"  {name:28s} ERROR {type(e).__name__}: {e}")
    print(
        f"[{os.path.basename(sf_dir)}] {len(qs)} queries, {len(sqls)} SQL-matched; "
        f"fails: {fails or 'none'}; over-budget: {slow or 'none'}"
    )
    return fails, slow


def main() -> int:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

    import ray

    from data_quality_ray.session import init_local_session

    init_local_session()

    import __ray_entry__ as em

    t0 = time.time()
    n = em.entry().count()
    print(f"entry(): rows={n} ({time.time() - t0:.1f}s)")

    all_fails: list[str] = []
    for sf_dir in sf_dirs:
        print(f"=== {sf_dir} ===")
        fails, slow = rehearse_sf(em, sf_dir)
        all_fails += [f"{os.path.basename(sf_dir)}:{f}" for f in fails]
        all_fails += [f"{os.path.basename(sf_dir)}:SLOW:{s}" for s in slow]
    print(f"TOTAL fails: {all_fails or 'none'}")
    ray.shutdown()
    return 1 if all_fails else 0


if __name__ == "__main__":
    sys.exit(main())
