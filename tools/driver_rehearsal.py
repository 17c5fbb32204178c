"""Rehearse the driver's correctness gate locally.

Runs ``entry()`` plus every ``queries()`` entry at the given sf, compares
each against its ``oracle_sql()`` in DuckDB exactly (the CORRECTNESS_r{N}
check), and requires rows-only queries to return rows. Owns a local Ray
session (the real driver inits Ray itself before importing __ray_entry__).

Usage:  python tools/driver_rehearsal.py [/root/testdata/sf0.01]
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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import ray

    from data_quality_ray.session import init_local_session

    init_local_session()

    import duckdb
    import numpy as np
    import pandas as pd

    import __ray_entry__ as em

    t0 = time.time()
    n = em.entry().count()
    print(f"entry(): rows={n} ({time.time() - t0:.1f}s)")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, sqls = em.queries(), em.oracle_sql()
    fails: list[str] = []
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
            print(f"  {name:28s} rows={len(out):6d} {status} ({time.time() - t0:.1f}s)")
        except Exception as e:  # noqa: BLE001 — rehearsal must report, not die
            fails.append(name)
            print(f"  {name:28s} ERROR {type(e).__name__}: {e}")
    print(f"{len(qs)} queries, {len(sqls)} SQL-matched; fails: {fails or 'none'}")
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
