"""Extended relational surface (round 2): semi-structured extraction,
calendar truncation, exact median, lead/lag windows, rollup, set ops and a
range join — every query DuckDB-oracle-checked with the same exactness
discipline as pipelines/relational.py (integer fixed-point for money/values,
RE2-compatible regexes, identical column names/aliases on both sides).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from data_quality_ray.pipelines.relational import ts_us


def _pq(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


# ---------------------------------------------------------------------------
# Semi-structured extraction: JSON props → typed column → aggregate
# ---------------------------------------------------------------------------


def events_props_extract(sf_dir: str) -> pd.DataFrame:
    """Extract the integer ``k`` from the JSON ``props`` column (vectorized
    ``pc.extract_regex`` — RE2, same pattern DuckDB runs) and aggregate it
    per event type. The extraction is a pure map; the aggregate is the
    usual map-side-combinable groupby."""

    def extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["props"], r'"k": (?P<k>\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table({"event_type": t["event_type"], "k": k})

    out = (
        rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "props"])
        .map_batches(extract, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("k", alias_name="k_sum"), Count(alias_name="n_events"))
        .to_pandas()
    )
    return out[["event_type", "k_sum", "n_events"]].sort_values(
        "event_type"
    ).reset_index(drop=True)


EVENTS_PROPS_EXTRACT_SQL = r"""
SELECT event_type,
       CAST(sum(TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS BIGINT) AS k_sum,
       count(*) AS n_events
FROM events GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Calendar truncation + exact distinct count: weekly active users
# ---------------------------------------------------------------------------


def events_weekly_users(sf_dir: str) -> pd.DataFrame:
    """Distinct users per Monday-started week.

    Week truncation is integer day arithmetic (epoch day 0 = Thursday, so
    Monday-trunc = day − ((day+3) mod 7) — identical to DuckDB's
    ``date_trunc('week')``); the distinct count is the scale-shaped
    TWO-PHASE groupby: (week, user) dedupe first, then count per week —
    never a driver-side set."""

    def week(t: pa.Table) -> pa.Table:
        day = ts_us(t["ts"]).to_numpy() // 86_400_000_000
        wk = day - ((day + 3) % 7)
        return pa.table(
            {"week_day": pa.array(wk, pa.int64()), "user_id": t["user_id"]}
        )

    out = (
        rd.read_parquet(_pq(sf_dir, "events"), columns=["ts", "user_id"])
        .map_batches(week, batch_format="pyarrow")
        .groupby(["week_day", "user_id"])
        .aggregate(Count(alias_name="c"))
        .groupby("week_day")
        .aggregate(Count(alias_name="n_users"))
        .to_pandas()
    )
    return out[["week_day", "n_users"]].sort_values("week_day").reset_index(drop=True)


EVENTS_WEEKLY_USERS_SQL = """
SELECT CAST(datediff('day', DATE '1970-01-01', CAST(date_trunc('week', ts) AS DATE)) AS BIGINT)
         AS week_day,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1 ORDER BY week_day
"""


# ---------------------------------------------------------------------------
# Exact median (order statistic) per group
# ---------------------------------------------------------------------------


MEDIAN_INGROUP_LIMIT = 5_000_000  # events rows; above this, histogram refine


def _median_from_sorted_pair(v1: float, v2: float, odd: bool) -> float:
    return v1 if odd else (v1 + v2) / 2.0


def _events_to_e6(t: pa.Table) -> pa.Table:
    e6 = pc.cast(
        pc.round(pc.multiply(t["value"], pa.scalar(1_000_000.0)), round_mode="half_up"),
        pa.int64(),
    )
    return pa.table({"event_type": t["event_type"], "value_e6": e6})


def events_value_median(sf_dir: str, *, force_distributed: bool = False) -> pd.DataFrame:
    """Exact per-type median of value (1e-6 fixed point), behind a SIZE
    GATE like the as-of join:

    - small input: ``groupby(event_type).map_groups`` + in-group
      ``np.partition`` selection (one type's rows fit a worker);
    - large input (or ``force_distributed``): histogram refine — per-block
      8192-bin integer histograms combine map-side (64 KB per type per
      block), the driver locates the two median bins from cumulative
      counts, and a second pruned pass fetches only those bins' values for
      the exact order statistics. EXACT at any size because the value_e6
      domain is integer; both paths produce identical doubles."""
    import pyarrow.parquet as _pqm

    n_rows = _pqm.ParquetFile(_pq(sf_dir, "events")).metadata.num_rows
    if force_distributed or n_rows > MEDIAN_INGROUP_LIMIT:
        return _events_value_median_histogram(sf_dir)

    def med(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value_e6"].to_numpy()
        n = len(v)
        if n % 2:
            m = float(np.partition(v, n // 2)[n // 2])
        else:
            lo = np.partition(v, n // 2 - 1)[n // 2 - 1]
            hi = np.partition(v, n // 2)[n // 2]
            m = _median_from_sorted_pair(float(lo), float(hi), odd=False)
        return pd.DataFrame(
            {"event_type": [g["event_type"].iloc[0]], "median_value": [m / 1_000_000.0]}
        )

    out = (
        rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "value"])
        .map_batches(_events_to_e6, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(med, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("event_type").reset_index(drop=True)


_MEDIAN_BINS = 8192


def _distributed_order_stats(sf_dir: str, ks_of_n, src_factory=None) -> tuple[dict, dict]:
    """EXACT per-type order statistics at the ranks ``ks_of_n(n)`` with
    bounded state everywhere: per-type integer domain (pass 1), 8192-bin
    map-side-combined histograms (pass 2, 64 KB partials), then a pruned
    fetch of ONLY the bins containing the requested ranks (pass 3, tiny).
    ``src_factory`` (default: the events value column in e6 fixed point)
    must return a Dataset with (event_type, value_e6) — it lets derived
    integer domains (e.g. MAD's absolute deviations) reuse the machinery.
    Returns ({type: {k: value_e6}}, {type: n})."""
    from ray.data.aggregate import Count, Max, Min

    if src_factory is None:
        def src_factory():
            return rd.read_parquet(
                _pq(sf_dir, "events"), columns=["event_type", "value"]
            ).map_batches(_events_to_e6, batch_format="pyarrow")

    src = src_factory()

    # pass 1: per-type integer domain + count
    dom = (
        src.groupby("event_type")
        .aggregate(
            Min("value_e6", alias_name="lo"),
            Max("value_e6", alias_name="hi"),
            Count(alias_name="n"),
        )
        .to_pandas()
        .set_index("event_type")
    )
    types = sorted(dom.index)
    lo = {t: int(dom.loc[t, "lo"]) for t in types}
    width = {t: int(dom.loc[t, "hi"]) - lo[t] + 1 for t in types}
    ref = ray.put((lo, width))

    # pass 2: per-block per-type histograms (64 KB partials, linear merge)
    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        lo_, width_ = ray.get(ref)
        rows = []
        for etype, g in b.groupby("event_type"):
            v = g["value_e6"].to_numpy()
            bins = (v - lo_[etype]) * _MEDIAN_BINS // width_[etype]
            h = np.bincount(bins, minlength=_MEDIAN_BINS).astype(np.int64)
            rows.append({"event_type": etype, "hist": h.tobytes()})
        return pd.DataFrame(rows, columns=["event_type", "hist"])

    def hist_merge(g: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(_MEDIAN_BINS, dtype=np.int64)
        for buf in g["hist"]:
            acc += np.frombuffer(buf, dtype=np.int64)
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]], "hist": [acc.tobytes()]})

    hists = (
        src.map_batches(hist_partial, batch_format="pandas")
        .groupby("event_type")
        .map_groups(hist_merge, batch_format="pandas")
        .to_pandas()
        .set_index("event_type")
    )

    # locate the bins holding every requested rank (0-based)
    need_bins: dict[str, set[int]] = {}
    ks_by_type: dict[str, list[int]] = {}
    cums: dict[str, np.ndarray] = {}
    ns: dict[str, int] = {}
    for t in types:
        h = np.frombuffer(hists.loc[t, "hist"], dtype=np.int64)
        cum = np.cumsum(h)
        n = int(dom.loc[t, "n"])
        ks = sorted(set(ks_of_n(n)))
        need_bins[t] = {int(np.searchsorted(cum, k + 1)) for k in ks}
        ks_by_type[t], cums[t], ns[t] = ks, cum, n

    # pass 3: pruned fetch of ONLY the needed bins' values (tiny)
    bref = ray.put((lo, width, need_bins))

    tindex = {t_: i for i, t_ in enumerate(sorted(need_bins))}
    allowed = np.sort(
        np.array(
            [tindex[t_] * (_MEDIAN_BINS + 1) + b for t_, s_ in need_bins.items() for b in s_],
            dtype=np.int64,
        )
    )

    def in_needed_bins(t: pa.Table) -> pa.Table:
        lo_, width_, _ = ray.get(bref)
        et = pd.Series(t["event_type"].to_pylist())
        v = t["value_e6"].to_numpy()
        b = (v - et.map(lo_).to_numpy()) * _MEDIAN_BINS // et.map(width_).to_numpy()
        # one composite (type-index, bin) key + one sorted-membership test
        key = et.map(tindex).to_numpy() * (_MEDIAN_BINS + 1) + b
        pos = np.minimum(np.searchsorted(allowed, key), len(allowed) - 1)
        return t.filter(pa.array(allowed[pos] == key))

    cand = src.map_batches(in_needed_bins, batch_format="pyarrow").to_pandas()

    out: dict[str, dict[int, int]] = {}
    for t in types:
        cum = cums[t]
        h = np.frombuffer(hists.loc[t, "hist"], dtype=np.int64)
        vals = np.sort(cand[cand["event_type"] == t]["value_e6"].to_numpy())
        got: dict[int, int] = {}
        for k in ks_by_type[t]:
            b = int(np.searchsorted(cum, k + 1))
            before = int(cum[b - 1]) if b else 0
            # vals holds ONLY the needed bins' values, in bin order; offset
            # of bin b inside vals = count of needed-bin values below b
            off = sum(int(h[x]) for x in sorted(need_bins[t]) if x < b)
            got[k] = int(vals[off + (k - before)])
        out[t] = got
    return out, ns


def _events_value_median_histogram(sf_dir: str) -> pd.DataFrame:
    """Distributed exact median via :func:`_distributed_order_stats`."""
    stats, ns = _distributed_order_stats(
        sf_dir, lambda n: [(n - 1) // 2, n // 2]
    )
    rows = []
    for t in sorted(stats):
        k1, k2 = (ns[t] - 1) // 2, ns[t] // 2
        m = _median_from_sorted_pair(
            float(stats[t][k1]), float(stats[t][k2]), odd=(k1 == k2)
        )
        rows.append({"event_type": t, "median_value": m / 1_000_000.0})
    return pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)


def events_value_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact p25/p50/p75 of value per event type (linear interpolation at
    rank (n−1)·q — DuckDB ``quantile_cont`` semantics), computed fully
    distributed through the same bounded-state order-statistic machinery
    as the median: only the ≤6 needed ranks' bins are ever fetched."""
    qs = (0.25, 0.50, 0.75)

    def ks_of_n(n: int) -> list[int]:
        ks = []
        for q in qs:
            pos = (n - 1) * q
            ks += [int(np.floor(pos)), int(np.ceil(pos))]
        return ks

    stats, ns = _distributed_order_stats(sf_dir, ks_of_n)
    rows = []
    for t in sorted(stats):
        n = ns[t]
        rec = {"event_type": t}
        for q, name in zip(qs, ("q25", "q50", "q75")):
            pos = (n - 1) * q
            klo, khi = int(np.floor(pos)), int(np.ceil(pos))
            vlo, vhi = float(stats[t][klo]), float(stats[t][khi])
            rec[name] = (vlo + (pos - klo) * (vhi - vlo)) / 1_000_000.0
        rows.append(rec)
    return pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)


EVENTS_VALUE_QUANTILES_SQL = """
SELECT event_type,
       quantile_cont(CAST(round(value * 1000000) AS BIGINT), 0.25) / 1000000.0 AS q25,
       quantile_cont(CAST(round(value * 1000000) AS BIGINT), 0.50) / 1000000.0 AS q50,
       quantile_cont(CAST(round(value * 1000000) AS BIGINT), 0.75) / 1000000.0 AS q75
FROM events GROUP BY event_type ORDER BY event_type
"""


EVENTS_VALUE_MEDIAN_SQL = """
SELECT event_type,
       median(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 AS median_value
FROM events GROUP BY event_type ORDER BY event_type
"""


def events_value_mad(sf_dir: str, *, force_distributed: bool = False) -> pd.DataFrame:
    """Median absolute deviation of value per event type — the robust-σ
    companion to ``events_value_stats`` (outlier-resistant scale estimate;
    the standard spread statistic for quality-score distributions).

    Exactness: all math in 2× e6 fixed point so the interpolated median
    never leaves integers until the final divide — ``med2 = v_lo + v_hi``
    (twice the median), ``dev2 = |2·v − med2|`` (integer), and
    ``mad = median(dev2) / 2``; bit-identical to DuckDB ``mad()``.

    Size gate (the events_value_median contract): small inputs take the
    in-group selection path (event_type is a tiny vocabulary, so the key
    is bounded); large inputs (or ``force_distributed``) run TWO rounds of
    the bounded-state histogram-refine machinery — one for the median,
    one over the derived deviation domain via ``src_factory``."""
    import pyarrow.parquet as _pqm

    def _mad_from_dev2(dev2_sorted_pair: tuple[float, float], odd: bool) -> float:
        return _median_from_sorted_pair(*dev2_sorted_pair, odd) / 2.0

    n_rows = _pqm.ParquetFile(_pq(sf_dir, "events")).metadata.num_rows
    if not (force_distributed or n_rows > MEDIAN_INGROUP_LIMIT):

        def mad(g: pd.DataFrame) -> pd.DataFrame:
            v = np.sort(g["value_e6"].to_numpy())
            n = len(v)
            med2 = int(v[(n - 1) // 2]) + int(v[n // 2])
            dev2 = np.sort(np.abs(2 * v - med2))
            m = _mad_from_dev2(
                (float(dev2[(n - 1) // 2]), float(dev2[n // 2])), odd=bool(n % 2)
            )
            return pd.DataFrame(
                {"event_type": [g["event_type"].iloc[0]], "mad_value": [m / 1_000_000.0]}
            )

        out = (
            rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "value"])
            .map_batches(_events_to_e6, batch_format="pyarrow")
            .groupby("event_type")
            .map_groups(mad, batch_format="pandas")
            .to_pandas()
        )
        return out.sort_values("event_type").reset_index(drop=True)

    med_ks = lambda n: [(n - 1) // 2, n // 2]  # noqa: E731
    med_stats, ns = _distributed_order_stats(sf_dir, med_ks)
    med2 = {
        t: int(med_stats[t][(ns[t] - 1) // 2]) + int(med_stats[t][ns[t] // 2])
        for t in med_stats
    }
    mref = ray.put(med2)

    def dev_factory():
        def to_dev2(t: pa.Table) -> pa.Table:
            med2_ = ray.get(mref)
            e6 = pc.cast(
                pc.round(pc.multiply(t["value"], pa.scalar(1_000_000.0)), round_mode="half_up"),
                pa.int64(),
            ).to_numpy()
            m2 = pd.Series(t["event_type"].to_pylist()).map(med2_).to_numpy(np.int64)
            return pa.table(
                {
                    "event_type": t["event_type"],
                    "value_e6": pa.array(np.abs(2 * e6 - m2), pa.int64()),
                }
            )

        return rd.read_parquet(
            _pq(sf_dir, "events"), columns=["event_type", "value"]
        ).map_batches(to_dev2, batch_format="pyarrow")

    dev_stats, dns = _distributed_order_stats(sf_dir, med_ks, src_factory=dev_factory)
    rows = []
    for t in sorted(dev_stats):
        n = dns[t]
        k1, k2 = (n - 1) // 2, n // 2
        m = _mad_from_dev2(
            (float(dev_stats[t][k1]), float(dev_stats[t][k2])), odd=(k1 == k2)
        )
        rows.append({"event_type": t, "mad_value": m / 1_000_000.0})
    return pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)


EVENTS_VALUE_MAD_SQL = """
SELECT event_type,
       mad(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 AS mad_value
FROM events GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Lead/lag window: gap since the user's previous event
# ---------------------------------------------------------------------------


def events_user_gaps(sf_dir: str, n_pkeys: int = 64) -> pd.DataFrame:
    """Per event: microseconds since the same user's previous event (−1 for
    the first). BOUNDED shard key (``user_id & 63``) co-locates each user's
    events; inside the shard ONE sort (user, ts, event_id) + one array diff
    with −1 forced at user boundaries covers every user at once — never one
    Ray UDF call per distinct user."""

    def gaps_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        gap = np.empty(len(ts), dtype=np.int64)
        first = np.ones(len(ts), dtype=bool)
        if len(ts) > 1:
            gap[1:] = ts[1:] - ts[:-1]
            first[1:] = u[1:] != u[:-1]
        gap[first] = -1
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(), "gap_us": gap})

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts_us": ts_us(t["ts"]),
                "pkey": pc.cast(
                    pc.bit_wise_and(t["user_id"], pa.scalar(n_pkeys - 1, pa.int64())),
                    pa.int32(),
                ),
            }
        )

    out = (
        rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "ts", "user_id"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(gaps_shard, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("event_id").reset_index(drop=True)


EVENTS_USER_GAPS_SQL = """
SELECT event_id,
       coalesce(CAST(epoch_us(ts) AS BIGINT)
                - lag(CAST(epoch_us(ts) AS BIGINT))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id), -1) AS gap_us
FROM events ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Rollup: revenue by (region, nation) with subtotals and grand total
# ---------------------------------------------------------------------------


def revenue_rollup(sf_dir: str) -> pd.DataFrame:
    """Order revenue at three grains — (region, nation), per-region, grand
    total — in ONE pass: the dimension chain customer→nation→region is tiny
    and broadcast once; orders stream through a per-batch combiner; the
    rollup levels are derived from the ≤|nations| base aggregate on the
    driver (re-aggregating partials, not data)."""
    cust = pd.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    nat = pd.read_parquet(_pq(sf_dir, "nation"))
    reg = pd.read_parquet(_pq(sf_dir, "region"))
    dim = cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey").merge(
        reg, left_on="n_regionkey", right_on="r_regionkey"
    )
    lookup = dict(zip(dim["c_custkey"], zip(dim["r_name"], dim["n_name"])))
    ref = ray.put(lookup)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        lk = ray.get(ref)
        cents = np.floor(b["o_totalprice"].to_numpy() * 10_000.0 + 0.5).astype("int64")
        rn = b["o_custkey"].map(lk)
        df = pd.DataFrame(
            {
                "region": rn.map(lambda x: x[0]),
                "nation": rn.map(lambda x: x[1]),
                "e4": cents,
            }
        )
        g = df.groupby(["region", "nation"], as_index=False).agg(
            e4=("e4", "sum"), n_orders=("e4", "size")
        )
        return g

    base = (
        rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
        .map_batches(partial, batch_format="pandas")
        .groupby(["region", "nation"])
        .aggregate(Sum("e4", alias_name="e4"), Sum("n_orders", alias_name="n_orders"))
        .to_pandas()
    )
    lvl1 = base.groupby("region", as_index=False).agg(e4=("e4", "sum"), n_orders=("n_orders", "sum"))
    lvl1["nation"] = "ALL"
    total = pd.DataFrame(
        {"region": ["ALL"], "nation": ["ALL"], "e4": [base["e4"].sum()], "n_orders": [base["n_orders"].sum()]}
    )
    out = pd.concat([base, lvl1, total], ignore_index=True)
    out["revenue"] = ((out.pop("e4").to_numpy() + 50) // 100) / 100.0
    out["n_orders"] = out["n_orders"].astype("int64")
    return out[["region", "nation", "revenue", "n_orders"]].sort_values(
        ["region", "nation"]
    ).reset_index(drop=True)


REVENUE_ROLLUP_SQL = """
SELECT coalesce(r_name, 'ALL') AS region,
       coalesce(n_name, 'ALL') AS nation,
       ((sum(CAST(round(o_totalprice * 10000) AS BIGINT)) + 50) // 100) / 100.0 AS revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
ORDER BY region, nation
"""


# ---------------------------------------------------------------------------
# Set op: customers ordering in BOTH years (INTERSECT)
# ---------------------------------------------------------------------------


def repeat_customers_intersect(sf_dir: str, y1: int = 1996, y2: int = 1997) -> pd.DataFrame:
    """INTERSECT of two filtered key sets without materializing either on
    the driver: one pass tags each order with its year-flag bit, a groupby
    ORs the bits per customer, and the filter keeps custkeys carrying both
    bits (Max aggregates per bit — map-side combinable)."""
    from ray.data.aggregate import Max

    if y1 >= y2:
        raise ValueError(f"y1 must precede y2 (got {y1}, {y2})")  # read filter below assumes it
    lo1 = pa.scalar(pd.Timestamp(f"{y1}-01-01"), pa.timestamp("us"))
    hi2 = pa.scalar(pd.Timestamp(f"{y2 + 1}-01-01"), pa.timestamp("us"))

    def flags(t: pa.Table) -> pa.Table:
        y = pc.year(t["o_orderdate"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "in1": pa.array((y == y1).astype(np.int8)),
                "in2": pa.array((y == y2).astype(np.int8)),
            }
        )

    out = (
        rd.read_parquet(
            _pq(sf_dir, "orders"),
            columns=["o_custkey", "o_orderdate"],
            filter=(pc.field("o_orderdate") >= lo1) & (pc.field("o_orderdate") < hi2),
        )
        .map_batches(flags, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Max("in1", alias_name="in1"), Max("in2", alias_name="in2"))
        .to_pandas()
    )
    keep = out[(out["in1"] > 0) & (out["in2"] > 0)][["o_custkey"]].astype("int64")
    return keep.sort_values("o_custkey").reset_index(drop=True)


REPEAT_CUSTOMERS_INTERSECT_SQL = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
ORDER BY o_custkey
"""


# ---------------------------------------------------------------------------
# Range join: same-customer orders in the preceding window
# ---------------------------------------------------------------------------


def orders_prior_window(sf_dir: str, days: int = 30, n_buckets: int = 32) -> pd.DataFrame:
    """For each order: how many orders the SAME customer placed in the
    preceding ``days`` days ([date − days, date), strictly before) — a
    per-key RANGE self-join with genuinely non-trivial counts on this data
    (the earlier events×orders variant was degenerate: the two tables'
    time ranges never overlap).

    Shape: co-partition by hash(custkey) (one groupby shuffle); inside
    each bucket ALL windows resolve with two searchsorteds over ONE
    composite (customer-rank · K + time-RANK) key — no per-customer Python
    loop. Time is mapped to its dense rank first, so the key magnitude is
    bounded by (rows per bucket)² — int64-safe to ~3·10⁹ rows per bucket
    (raw microsecond offsets would overflow the product at scale).
    Per-task memory O(rows / n_buckets); no broadcast."""
    from data_quality_ray.pipelines.relational import _user_bucket_cols

    win_us = days * 86_400_000_000

    def ord_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                **_user_bucket_cols(t["o_custkey"].to_numpy(), None, n_buckets),
                "ts_us": ts_us(t["o_orderdate"]),
                "o_orderkey": t["o_orderkey"],
            }
        )

    od = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_custkey", "o_orderkey", "o_orderdate"]
    ).map_batches(ord_rows, batch_format="pyarrow")

    def count_window(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame(
                {
                    "o_orderkey": pd.Series([], dtype="int64"),
                    "n_prior": pd.Series([], dtype="int64"),
                }
            )
        u = g["user"].to_numpy()
        ts = g["ts_us"].to_numpy()
        uniq_u = np.unique(u)
        uniq_t = np.unique(ts)
        K = len(uniq_t) + 1
        rank_u = np.searchsorted(uniq_u, u)
        key = rank_u * K + np.searchsorted(uniq_t, ts)
        skey = np.sort(key)
        # window [t-days, t): strict upper bound excludes the order itself
        # and same-timestamp peers, matching the < in the oracle
        r_hi = np.searchsorted(uniq_t, ts, side="left")
        r_lo = np.searchsorted(uniq_t, ts - win_us, side="left")
        n = np.searchsorted(skey, rank_u * K + r_hi, side="left") - np.searchsorted(
            skey, rank_u * K + r_lo, side="left"
        )
        return pd.DataFrame(
            {"o_orderkey": g["o_orderkey"].to_numpy(), "n_prior": n.astype(np.int64)}
        )

    out = (
        od.groupby("bucket")
        .map_groups(count_window, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("o_orderkey").reset_index(drop=True)


def orders_prior_window_sql(days: int = 30) -> str:
    """Oracle generated from the same window parameter as the pipeline
    (the registered constant covers the 30-day default)."""
    return f"""
SELECT o.o_orderkey,
       (SELECT count(*) FROM orders o2
        WHERE o2.o_custkey = o.o_custkey
          AND o2.o_orderdate >= o.o_orderdate - INTERVAL {int(days)} DAY
          AND o2.o_orderdate < o.o_orderdate) AS n_prior
FROM orders o
ORDER BY o.o_orderkey
"""


ORDERS_PRIOR_WINDOW_SQL = orders_prior_window_sql(30)


# ---------------------------------------------------------------------------
# Q3-style 3-way join: segment × date-filtered revenue top-k
# ---------------------------------------------------------------------------


def q3_shipping_priority(sf_dir: str, segment: str = "BUILDING", k: int = 10) -> pd.DataFrame:
    """Top-k revenue among orders of one market segment placed before a
    cutoff with line items shipped after it (TPC-H Q3 shape).

    Join discipline by side size: customer is dimension-grain → its
    filtered key set broadcasts; orders×lineitem are both facts → the
    explicit bucket-partitioned hash join on orderkey (one co-partitioning
    shuffle, schema-aligned union), per-bucket combiner, then a tiny global
    groupby + distributed sort + limit."""
    cutoff = pd.Timestamp("1995-03-15")
    cut = pa.scalar(cutoff, pa.timestamp("us"))
    n_buckets = 32

    cust = pd.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    keys = np.sort(cust[cust["c_mktsegment"] == segment]["c_custkey"].to_numpy())
    kref = ray.put(keys)

    def ord_rows(t: pa.Table) -> pa.Table:
        ks = ray.get(kref)
        ck = t["o_custkey"].to_numpy()
        if len(ks):
            pos = np.minimum(np.searchsorted(ks, ck), len(ks) - 1)
            m = ks[pos] == ck
        else:
            m = np.zeros(len(ck), dtype=bool)
        t = t.filter(pa.array(m))
        key = t["o_orderkey"]
        return pa.table(
            {
                "key": key,
                "bucket": pc.cast(
                    pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())), pa.int32()
                ),
                "side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                "rev_e4": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "odate_us": ts_us(t["o_orderdate"]),
                "priority": t["o_orderpriority"],
            }
        )

    def li_rows(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        e4 = pc.cast(
            pc.round(pc.multiply(rev, pa.scalar(10_000.0)), round_mode="half_up"), pa.int64()
        )
        key = t["l_orderkey"]
        return pa.table(
            {
                "key": key,
                "bucket": pc.cast(
                    pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())), pa.int32()
                ),
                "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                "rev_e4": e4,
                "odate_us": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "priority": pa.nulls(t.num_rows, pa.string()),
            }
        )

    orders = rd.read_parquet(
        _pq(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=(pc.field("o_orderdate") < cut),
    ).map_batches(ord_rows, batch_format="pyarrow")
    li = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pc.field("l_shipdate") > cut),
    ).map_batches(li_rows, batch_format="pyarrow")

    empty = pa.table(
        {
            "key": pa.array([], pa.int64()),
            "odate_us": pa.array([], pa.int64()),
            "priority": pa.array([], pa.string()),
            "rev_e4": pa.array([], pa.int64()),
        }
    )

    def bucket_join(t: pa.Table) -> pa.Table:
        # Arrow/numpy-native shard kernel (round-5 rework): orderkey is
        # UNIQUE on the orders side, so the inner join is one searchsorted
        # lookup and the per-(key,odate,priority) combine is an integer
        # scatter-add per order row — no pandas merge/groupby round-trip.
        side = t["side"].to_numpy()
        key = t["key"].to_numpy()
        rmask = side == 1
        ridx = np.flatnonzero(rmask)
        okey = key[ridx]
        if len(okey) == 0 or len(okey) == len(key):
            return empty
        oorder = np.argsort(okey, kind="stable")
        okey_s = okey[oorder]
        lmask = ~rmask
        lkey = key[lmask]
        rev = t["rev_e4"].to_numpy()[lmask]
        pos = np.minimum(np.searchsorted(okey_s, lkey), len(okey_s) - 1)
        hit = okey_s[pos] == lkey
        acc = np.zeros(len(okey_s), dtype=np.int64)
        np.add.at(acc, pos[hit], rev[hit])
        cnt = np.bincount(pos[hit], minlength=len(okey_s))
        emit = cnt > 0
        src = ridx[oorder][emit]  # original rows of the emitted orders
        return pa.table(
            {
                "key": pa.array(okey_s[emit], pa.int64()),
                "odate_us": pa.array(t["odate_us"].to_numpy()[src], pa.int64()),
                "priority": t["priority"].combine_chunks().take(
                    pa.array(src, pa.int64())
                ),
                "rev_e4": pa.array(acc[emit], pa.int64()),
            }
        )

    agg = (
        li.union(orders)
        .groupby("bucket")
        .map_groups(bucket_join, batch_format="pyarrow")
        .groupby(["key", "odate_us", "priority"])
        .aggregate(Sum("rev_e4", alias_name="rev_e4"))
        .sort(["rev_e4", "key"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    agg["revenue"] = ((agg.pop("rev_e4").to_numpy() + 50) // 100) / 100.0
    agg["o_orderdate_day"] = agg.pop("odate_us").to_numpy() // 86_400_000_000
    out = agg.rename(columns={"key": "l_orderkey", "priority": "o_orderpriority"})
    return out[["l_orderkey", "revenue", "o_orderdate_day", "o_orderpriority"]].reset_index(
        drop=True
    )


Q3_SHIPPING_PRIORITY_SQL = """
SELECT l_orderkey,
       ((sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) + 50) // 100) / 100.0
         AS revenue,
       CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
         AS o_orderdate_day,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) DESC, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Sliding window: trailing 1-hour event count per event (RANGE window)
# ---------------------------------------------------------------------------


def _trailing_bounds(us: np.ndarray, ts: np.ndarray, window_us: int):
    """(lo, hi) index bounds of each row's same-user CLOSED trailing window
    [ts − window, ts] over arrays pre-sorted by (user, ts).

    One composite-key searchsorted (user-rank·2^TS_SPAN_BITS + Δts) covers
    ALL users in the shard at once — the events_hourly_locf machinery —
    instead of a per-user Python loop. ``hi`` uses side='right' so equal-ts
    peers are included (SQL RANGE semantics); ``lo`` is clamped to the
    user's first row (a window reaching before t0 must not leak into the
    previous user's key range). Span overage raises (never silent wrap)."""
    n = len(us)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    uids, starts = np.unique(us, return_index=True)
    t0 = int(ts.min())
    if int(ts.max()) - t0 >= (1 << TS_SPAN_BITS):
        raise ValueError(
            f"_trailing_bounds: ts span exceeds 2^{TS_SPAN_BITS}µs; "
            "widen TS_SPAN_BITS (range check, never silent wrap)"
        )
    if len(uids) << TS_SPAN_BITS >= (1 << 63):
        raise ValueError(
            f"_trailing_bounds: {len(uids)} distinct keys in one shard would "
            f"overflow the rank*2^{TS_SPAN_BITS} int64 composite key; use "
            "more shards (range check, never silent wrap)"
        )
    rank = np.searchsorted(uids, us)
    key = rank * (1 << TS_SPAN_BITS) + (ts - t0)
    lo = np.searchsorted(key, key - window_us, side="left")
    lo = np.maximum(lo, starts[rank])
    hi = np.searchsorted(key, key, side="right")
    return lo.astype(np.int64), hi.astype(np.int64)


def events_trailing_hour(sf_dir: str, n_pkeys: int = 64) -> pd.DataFrame:
    """Per event: number of the same user's events in the closed trailing
    hour [ts − 1h, ts] — a RANGE-frame sliding window. BOUNDED shard key
    (``user_id & 63``) → ONE in-shard sort → one composite-key
    searchsorted across every user in the shard (``_trailing_bounds``) —
    never one Ray UDF call per distinct user."""
    hour_us = 3_600_000_000

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts_us": ts_us(t["ts"]),
                "pkey": pc.cast(
                    pc.bit_wise_and(t["user_id"], pa.scalar(n_pkeys - 1, pa.int64())),
                    pa.int32(),
                ),
            }
        )

    def trail_shard(t: pa.Table) -> pa.Table:
        # Arrow-native shard kernel: zero-copy int64 views + one lexsort —
        # no pandas round-trip (round-5 rework of the hottest shard)
        eid = t["event_id"].to_numpy()
        us = t["user_id"].to_numpy()
        ts = t["ts_us"].to_numpy()
        order = np.lexsort((eid, ts, us))
        us, ts, eid = us[order], ts[order], eid[order]
        lo, hi = _trailing_bounds(us, ts, hour_us)
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "n_trailing": pa.array(hi - lo, pa.int64()),
            }
        )

    out = (
        rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "ts", "user_id"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(trail_shard, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("event_id").reset_index(drop=True)


EVENTS_TRAILING_HOUR_SQL = """
SELECT event_id,
       CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts
                           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_trailing
FROM events ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Deterministic stratified sample (content-keyed; identical on any cluster)
# ---------------------------------------------------------------------------


def doc_stratified_sample(sf_dir: str) -> pd.DataFrame:
    """~1/8 deterministic sample of documents WITHIN each language stratum:
    keep rows whose md5(lang:doc_id) first hex digit is 0 or 1. Content-
    keyed (no RNG state), so the sample is identical at any parallelism —
    and exactly reproducible in SQL."""
    import hashlib

    def pick(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        langs = t["lang"].to_pylist()
        m = [
            hashlib.md5(f"{l}:{i}".encode()).hexdigest()[0] in ("0", "1")
            for l, i in zip(langs, ids)
        ]
        return t.filter(pa.array(m))

    out = (
        rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "lang"])
        .map_batches(pick, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


DOC_STRATIFIED_SAMPLE_SQL = """
SELECT doc_id, lang FROM documents
WHERE substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Approximate distinct count via a mergeable HyperLogLog aggregate
# ---------------------------------------------------------------------------


def events_user_hll(sf_dir: str) -> pd.DataFrame:
    """Approximate distinct users per event type via a from-scratch
    HyperLogLog (functions/sketches.py) run as a proper distributed
    aggregate: each batch folds its values into per-type register partials
    (map-side combine — 4 KB per type per block leaves the stage, never
    the values), the groupby merges registers by elementwise max, and only
    the final estimate is materialized. Deterministic (fixed hash), so the
    result is identical at any parallelism. Accuracy vs exact distinct is
    test-gated (~1.6% typical at p=12); no SQL oracle by design — the
    exact-distinct counterpart is ``events_weekly_users``."""
    from data_quality_ray.functions import sketches as sk

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for etype, g in b.groupby("event_type"):
            regs = sk.hll_accumulate(sk.hll_empty(), g["user_id"].to_numpy())
            rows.append({"event_type": etype, "regs": regs.tobytes()})
        return pd.DataFrame(rows, columns=["event_type", "regs"])

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        regs = sk.hll_empty()
        for buf in g["regs"]:
            regs = sk.hll_merge(regs, np.frombuffer(buf, dtype=np.uint8))
        return pd.DataFrame(
            {"event_type": [g["event_type"].iloc[0]],
             "n_users_approx": [sk.hll_estimate(regs)]}
        )

    out = (
        rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "user_id"])
        .map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    out["n_users_approx"] = out["n_users_approx"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def events_value_quantile_sketch(sf_dir: str) -> pd.DataFrame:
    """Approximate p50/p95/p99 of value per event type via a from-scratch
    DDSketch (functions/sketches.py — Masson et al. 2019) run as a proper
    distributed aggregate: every batch folds its values into per-type
    log-γ bucket partials (map-side combine — KBs per type per block,
    never the values), the groupby merges bucket counts (associative, so
    the result is BIT-deterministic at any parallelism), and only the
    final quantiles materialize. Guaranteed relative error ≤ α = 0.5% per
    quantile — accuracy AND merge-equality are test-gated vs the exact
    order-statistic machinery; no SQL oracle by design (the exact
    counterparts are events_value_median / events_value_quantiles)."""
    from data_quality_ray.functions import sketches as sk

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for etype, g in b.groupby("event_type"):
            s = sk.dd_accumulate(sk.dd_empty(), g["value"].to_numpy())
            rows.append({"event_type": etype, "sketch": sk.dd_serialize(s)})
        return pd.DataFrame(rows, columns=["event_type", "sketch"])

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        from data_quality_ray.functions import sketches as sk_

        acc = sk_.dd_empty()
        for buf in g["sketch"]:
            acc = sk_.dd_merge(acc, sk_.dd_deserialize(buf))
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "p50": [sk_.dd_quantile(acc, 0.50)],
                "p95": [sk_.dd_quantile(acc, 0.95)],
                "p99": [sk_.dd_quantile(acc, 0.99)],
            }
        )

    out = (
        rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "value"])
        .map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("event_type").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Pearson correlation from exact integer moments
# ---------------------------------------------------------------------------


def events_value_k_corr(sf_dir: str) -> pd.DataFrame:
    """Correlation between the event value (cents fixed point) and the
    JSON ``k`` property, per event type. The five moments (Σx, Σy, Σx²,
    Σy², Σxy) are EXACT int64 sums — order-independent and map-side
    combinable — and both sides evaluate the identical closed-form double
    expression on those exact integers, so the result hash-matches the
    oracle at any parallelism.

    Overflow contract: DuckDB promotes sum(BIGINT) to HUGEINT, the Ray
    side accumulates in int64 — the exact-match contract therefore only
    holds while every |Σ moment| < 2⁶³ (e.g. n·max(x²) at x = cents:
    safe to ~10⁹ rows of $30k values per group). Instead of documenting
    silently: per-row squares use CHECKED multiplies, and the sums are
    guarded by n·max(moment) < 2⁶² (factor-2 margin) — a breach raises
    rather than wrapping."""
    from ray.data.aggregate import Count as _Count, Max as _Max, Sum as _Sum

    def moments(t: pa.Table) -> pa.Table:
        x = pc.cast(
            pc.round(pc.multiply(t["value"], pa.scalar(100.0)), round_mode="half_up"),
            pa.int64(),
        )
        m = pc.extract_regex(t["props"], r'"k": (?P<k>\d+)')
        y = pc.cast(pc.struct_field(m, "k"), pa.int64())
        xy = pc.multiply_checked(x, y)
        out = pa.table(
            {
                "event_type": t["event_type"],
                "x": x,
                "y": y,
                "xx": pc.multiply_checked(x, x),
                "yy": pc.multiply_checked(y, y),
                "xy": xy,
                "axy": pc.abs(xy),
            }
        )
        # rows without a parseable k are EXCLUDED on both sides (the count
        # must describe the same rows the sums do)
        return out.filter(pc.is_valid(out["y"]))

    s = (
        rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "value", "props"])
        .map_batches(moments, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            _Count(alias_name="n"),
            _Sum("x", alias_name="sx"),
            _Sum("y", alias_name="sy"),
            _Sum("xx", alias_name="sxx"),
            _Sum("yy", alias_name="syy"),
            _Sum("xy", alias_name="sxy"),
            _Max("xx", alias_name="mxx"),
            _Max("yy", alias_name="myy"),
            _Max("axy", alias_name="maxy"),
        )
        .to_pandas()
    )
    nf = s["n"].to_numpy().astype(np.float64)
    for mcol in ("mxx", "myy", "maxy"):
        if (nf * s[mcol].to_numpy().astype(np.float64) > float(1 << 62)).any():
            raise OverflowError(
                "events_value_k_corr: int64 moment sums would exceed 2^62 "
                f"(n·max({mcol})); the exact-hash contract vs DuckDB HUGEINT "
                "no longer holds at this data magnitude"
            )
    s = s.drop(columns=["mxx", "myy", "maxy"])
    n = s["n"].to_numpy().astype(np.float64)
    sx = s["sx"].to_numpy().astype(np.float64)
    sy = s["sy"].to_numpy().astype(np.float64)
    sxx = s["sxx"].to_numpy().astype(np.float64)
    syy = s["syy"].to_numpy().astype(np.float64)
    sxy = s["sxy"].to_numpy().astype(np.float64)
    s["corr_xy"] = (n * sxy - sx * sy) / (
        np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
    )
    return (
        s[["event_type", "corr_xy"]].sort_values("event_type").reset_index(drop=True)
    )


EVENTS_VALUE_K_CORR_SQL = r"""
WITH c AS (
  SELECT event_type,
         CAST(round(value * 100) AS BIGINT) AS x,
         TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS y
  FROM events
  WHERE TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) IS NOT NULL
),
s AS (
  SELECT event_type,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         CAST(sum(x * x) AS DOUBLE) AS sxx, CAST(sum(y * y) AS DOUBLE) AS syy,
         CAST(sum(x * y) AS DOUBLE) AS sxy
  FROM c GROUP BY event_type
)
SELECT event_type,
       (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
         AS corr_xy
FROM s ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# NTILE window: per-user value quartiles (bucketed ranking)
# ---------------------------------------------------------------------------


def events_value_ntile(sf_dir: str, k: int = 4) -> pd.DataFrame:
    """Per event: its NTILE(k) bucket of ``value`` within the user's events.

    Ray shape: ``groupby(user_id & 63)`` — a BOUNDED shard key — supplies
    the PARTITION BY; inside the shard ONE lexsort on (user, value,
    event_id) is the ORDER BY, per-user position/size come from a
    vectorized cumcount/transform, and the tile formula is evaluated
    row-wise with per-row n (DuckDB NTILE semantics: the first n % k
    tiles hold one extra row) — never one Ray UDF call per distinct user.
    Ties in the float ``value`` are broken by event_id on both sides, so
    the assignment is deterministic."""
    n_pkeys = 64

    def pkey(b: pd.DataFrame) -> pd.DataFrame:
        b["pkey"] = (b["user_id"].to_numpy() & (n_pkeys - 1)).astype("int32")
        return b

    def tiles_shard(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            (g["event_id"].to_numpy(), g["value"].to_numpy(), g["user_id"].to_numpy())
        )
        g = g.iloc[order]
        by_user = g.groupby("user_id", sort=False)
        pos = by_user.cumcount().to_numpy()
        n = by_user["event_id"].transform("size").to_numpy(np.int64)
        q, r = n // k, n % k
        tile = np.where(
            pos < r * (q + 1),
            pos // (q + 1),
            r + (pos - r * (q + 1)) // np.maximum(q, 1),
        ) + 1
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(), "tile": tile})

    out = (
        rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "user_id", "value"])
        .map_batches(pkey, batch_format="pandas")
        .groupby("pkey")
        .map_groups(tiles_shard, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("event_id").reset_index(drop=True)


def events_value_ntile_sql(k: int = 4) -> str:
    """Oracle generated from the SAME ``k`` as the pipeline (invariant:
    parameterized queries never hand-edit one side)."""
    return f"""
SELECT event_id,
       CAST(ntile({k}) OVER (PARTITION BY user_id ORDER BY value, event_id)
            AS BIGINT) AS tile
FROM events ORDER BY event_id
"""


EVENTS_VALUE_NTILE_SQL = events_value_ntile_sql()


# ---------------------------------------------------------------------------
# Pivot / crosstab: per-user event-type counts as fixed columns
# ---------------------------------------------------------------------------

# The pivot's column set. Pipeline and SQL are BOTH generated from this list
# (round-2 invariant: shared constants, never hand-synced); an event type in
# the data but not listed raises rather than silently vanishing.
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_type_pivot(sf_dir: str) -> pd.DataFrame:
    """Crosstab: one row per user, one count column per event type plus a
    total — the wide layout feature stores want.

    Shape: per-batch conditional counting (a (users × 6)-int partial per
    block — the map-side combine) → ONE groupby(user_id) summing the fixed
    columns. The column set is static, so the shuffle payload is dense
    int64s, never strings; unknown types fail loudly."""

    def pivot_partial(df: pd.DataFrame) -> pd.DataFrame:
        unknown = set(df["event_type"].unique()) - set(EVENT_TYPES)
        if unknown:
            raise ValueError(f"events_type_pivot: unlisted event types {sorted(unknown)}")
        out = (
            pd.crosstab(df["user_id"], df["event_type"])
            .reindex(columns=list(EVENT_TYPES), fill_value=0)
            .astype("int64")
        )
        out.columns = [f"n_{t}" for t in EVENT_TYPES]
        out["n_total"] = out.sum(axis=1)
        return out.reset_index().rename(columns={"index": "user_id"})

    aggs = [Sum(f"n_{t}", alias_name=f"n_{t}") for t in EVENT_TYPES]
    aggs.append(Sum("n_total", alias_name="n_total"))
    out = (
        rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "event_type"])
        .map_batches(pivot_partial, batch_format="pandas")
        .groupby("user_id")
        .aggregate(*aggs)
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True)


def events_type_pivot_sql(types: "tuple[str, ...]" = EVENT_TYPES) -> str:
    cols = ",\n       ".join(
        f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS n_{t}"
        for t in types
    )
    return f"""
SELECT user_id,
       {cols},
       CAST(count(*) AS BIGINT) AS n_total
FROM events
GROUP BY user_id
ORDER BY user_id
"""


EVENTS_TYPE_PIVOT_SQL = events_type_pivot_sql()


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis, distributed)
# ---------------------------------------------------------------------------

WSAMPLE_K = 64


def doc_weighted_sample(sf_dir: str, k: int = WSAMPLE_K) -> pd.DataFrame:
    """Deterministic weighted sample WITHOUT replacement: the k documents
    with the smallest Efraimidis–Spirakis keys ``-ln(u)/w`` (w = n_chars+1,
    so longer docs are proportionally likelier — the "sample training docs
    by quality weight" primitive).

    ``u`` is not an RNG draw but a pure function of doc_id — the top 52
    md5 bits as a (0,1) double — so the sample is identical on any cluster
    and REPRODUCIBLE IN SQL (same hex-prefix parse, same formula, see
    functions/hashing.py for the md5-determinism discipline).

    Shape: one map over (doc_id, n_chars) computing keys vectorized, a
    per-block k-smallest partial, and a driver merge of n_blocks×k tiny
    rows — the same partial-top-k pattern as ann_brute_force; no shuffle,
    no full sort.
    """
    from data_quality_ray.functions.hashing import md5_u52_column

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        w = t["n_chars"].to_numpy().astype(np.float64) + 1.0
        u = (md5_u52_column(t["doc_id"]).astype(np.float64) + 0.5) / float(1 << 52)
        key = -np.log(u) / w
        kk = min(k, len(ids))
        order = np.argsort(key)[:kk]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "n_chars": t["n_chars"].take(pa.array(order)),
                "key": pa.array(key[order], pa.float64()),
            }
        )

    parts = (
        rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    sel = parts.nsmallest(k, "key")
    return (
        sel[["doc_id", "n_chars"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype({"doc_id": "int64", "n_chars": "int64"})
    )


def doc_weighted_sample_sql(k: int = WSAMPLE_K) -> str:
    return f"""
WITH keyed AS (
  SELECT doc_id, n_chars,
         -ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT)
              + 0.5) / 4503599627370496.0)
           / (n_chars + 1.0) AS key
  FROM documents
)
SELECT doc_id, n_chars FROM keyed
ORDER BY key LIMIT {k}
"""


DOC_WEIGHTED_SAMPLE_SQL = doc_weighted_sample_sql()


# ---------------------------------------------------------------------------
# Q5-style local-supplier volume: two chained fact-fact joins + 3 broadcast
# dims (region/nation/supplier), revenue per nation within one region/year
# ---------------------------------------------------------------------------


def q5_local_supplier_volume(
    sf_dir: str, region: str = "ASIA", year: int = 1996, n_buckets: int = 32
) -> pd.DataFrame:
    """TPC-H Q5 shape: revenue by nation for orders placed in ``year`` by
    customers of ``region`` whose line items were ALSO supplied from the
    customer's own nation.

    Join discipline (the 100-TB contract): region/nation/supplier are
    dimension-grain → broadcast once via ``ray.put`` (supplier is 10k/SF in
    TPC-H — if it ever grows fact-grain, fold it into the second bucketed
    join instead). customer×orders and (orders·cust)×lineitem are fact-fact
    → each is ONE explicit bucket-co-partitioned hash join (schema-aligned
    union → groupby(bucket) → vectorized pandas merge per bucket), the same
    machinery as q3_shipping_priority. Revenue stays int64 e4 fixed-point
    until the final ≤|nation| rows (oracle-exactness discipline)."""
    lo = pd.Timestamp(f"{year}-01-01")
    hi = pd.Timestamp(f"{year + 1}-01-01")
    lo_s, hi_s = pa.scalar(lo, pa.timestamp("us")), pa.scalar(hi, pa.timestamp("us"))

    # --- broadcast dimensions (driver reads are dimension-grain only) ---
    reg = pd.read_parquet(_pq(sf_dir, "region"), columns=["r_regionkey", "r_name"])
    rkey = reg.loc[reg["r_name"] == region, "r_regionkey"].to_numpy()
    nat = pd.read_parquet(_pq(sf_dir, "nation"))
    nat_in_region = np.sort(
        nat.loc[np.isin(nat["n_regionkey"].to_numpy(), rkey), "n_nationkey"].to_numpy()
    ).astype(np.int32)
    sup = pd.read_parquet(_pq(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    sup = sup.sort_values("s_suppkey")
    sup_ref = ray.put(
        (sup["s_suppkey"].to_numpy().astype(np.int64), sup["s_nationkey"].to_numpy().astype(np.int32))
    )
    nat_ref = ray.put(nat_in_region)

    def _bucket(key: "pa.ChunkedArray | pa.Array") -> pa.Array:
        return pc.cast(pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())), pa.int32())

    # --- join 1: customer (in region) ⋈ orders (in year) on custkey ---
    def cust_rows(t: pa.Table) -> pa.Table:
        ks = ray.get(nat_ref)
        m = np.isin(t["c_nationkey"].to_numpy(), ks)
        t = t.filter(pa.array(m))
        key = pc.cast(t["c_custkey"], pa.int64())
        return pa.table(
            {
                "key": key,
                "bucket": _bucket(key),
                "side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                "payload": pc.cast(t["c_nationkey"], pa.int64()),  # = c_nat
            }
        )

    def ord_rows(t: pa.Table) -> pa.Table:
        key = pc.cast(t["o_custkey"], pa.int64())
        return pa.table(
            {
                "key": key,
                "bucket": _bucket(key),
                "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                "payload": pc.cast(t["o_orderkey"], pa.int64()),  # = orderkey
            }
        )

    cust = rd.read_parquet(
        _pq(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    ).map_batches(cust_rows, batch_format="pyarrow")
    orders = rd.read_parquet(
        _pq(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=((pc.field("o_orderdate") >= lo_s) & (pc.field("o_orderdate") < hi_s)),
    ).map_batches(ord_rows, batch_format="pyarrow")

    def join_cust_orders(g: pd.DataFrame) -> pa.Table:
        # emits ARROW so the downstream union with li_rows' arrow blocks is
        # block-type-homogeneous (mixed pandas/arrow unions fail in Ray 2.49)
        right = g.loc[g["side"] == 1, ["key", "payload"]].rename(columns={"payload": "c_nat"})
        left = g.loc[g["side"] == 0, ["key", "payload"]].rename(columns={"payload": "okey"})
        m = left.merge(right, on="key", how="inner")
        # re-key the matched orders on orderkey for join 2 (side=1 again)
        okey = m["okey"].to_numpy(dtype=np.int64, na_value=0)
        return pa.table(
            {"key": pa.array(okey, pa.int64()),
             "bucket": pa.array((okey & (n_buckets - 1)).astype(np.int32)),
             "side": pa.array(np.ones(len(m), dtype=np.int8)),
             "c_nat": pa.array(m["c_nat"].to_numpy(dtype=np.int64, na_value=-1), pa.int64()),
             "rev_e4": pa.array(np.zeros(len(m), dtype=np.int64)),
             "s_nat": pa.array(np.full(len(m), -1, dtype=np.int64))}
        )

    ord_cust = (
        cust.union(orders).groupby("bucket").map_groups(join_cust_orders, batch_format="pandas")
    )

    # --- join 2: (order, c_nat) ⋈ lineitem on orderkey; supplier lookup ---
    def li_rows(t: pa.Table) -> pa.Table:
        skeys, snats = ray.get(sup_ref)
        sk = t["l_suppkey"].to_numpy()
        pos = np.minimum(np.searchsorted(skeys, sk), len(skeys) - 1)
        s_nat = np.where(skeys[pos] == sk, snats[pos], -2).astype(np.int64)
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        e4 = pc.cast(pc.round(pc.multiply(rev, pa.scalar(10_000.0)), round_mode="half_up"), pa.int64())
        key = pc.cast(t["l_orderkey"], pa.int64())
        return pa.table(
            {"key": key, "bucket": _bucket(key),
             "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
             "c_nat": pa.array(np.full(t.num_rows, -1, dtype=np.int64)),
             "rev_e4": e4, "s_nat": pa.array(s_nat)}
        )

    li = rd.read_parquet(
        _pq(sf_dir, "lineitem"), columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_rows, batch_format="pyarrow")

    def join_li(g: pd.DataFrame) -> pd.DataFrame:
        right = g.loc[g["side"] == 1, ["key", "c_nat"]]
        left = g.loc[g["side"] == 0, ["key", "rev_e4", "s_nat"]]
        m = left.merge(right, on="key", how="inner")
        m = m[m["c_nat"] == m["s_nat"]]  # local-supplier condition
        if m.empty:
            return pd.DataFrame({"nat": pd.Series([], dtype="int64"),
                                 "rev_e4": pd.Series([], dtype="int64")})
        # per-bucket combine: ≤|nation| partial rows leave each bucket
        out = m.groupby("s_nat", as_index=False)["rev_e4"].sum()
        return out.rename(columns={"s_nat": "nat"})

    agg = (
        ord_cust.union(li)
        .groupby("bucket")
        .map_groups(join_li, batch_format="pandas")
        .groupby("nat")
        .aggregate(Sum("rev_e4", alias_name="rev_e4"))
        .to_pandas()
    )
    names = nat.set_index("n_nationkey")["n_name"]
    agg["n_name"] = agg["nat"].map(names)
    agg["revenue"] = ((agg["rev_e4"].to_numpy() + 50) // 100) / 100.0
    out = agg[["n_name", "revenue"]].sort_values(
        ["revenue", "n_name"], ascending=[False, True]
    )
    return out.reset_index(drop=True)


def q5_sql(region: str = "ASIA", year: int = 1996) -> str:
    return f"""
SELECT n_name,
       ((sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) + 50) // 100) / 100.0
         AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{region}'
  AND c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '{year}-01-01'
  AND o_orderdate < TIMESTAMP '{year + 1}-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


Q5_LOCAL_SUPPLIER_VOLUME_SQL = q5_sql()


# ---------------------------------------------------------------------------
# Ordered-sequence funnel: view → click → purchase conversion counts
# ---------------------------------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")


def events_funnel(sf_dir: str, n_pkeys: int = 64) -> pd.DataFrame:
    """Strict-order funnel: users with a view, users whose first click came
    AFTER their first view, users whose first purchase came after that first
    click. One row of three counts — the conversion report.

    Shape: ONE shuffle. Users are hash-sharded (pkey = user_id mod 64 — the
    partitioned-groupby pattern, each user wholly in one group) and each
    group computes its min-timestamp chain vectorized in pandas, emitting a
    3-int partial; the driver sums ≤64 partials. No per-user Python loop,
    no driver-side event rows."""

    def funnel_partial(g: pd.DataFrame) -> pd.DataFrame:
        t1 = g.loc[g["event_type"] == FUNNEL_STEPS[0]].groupby("user_id")["ts"].min()
        c = g.loc[g["event_type"] == FUNNEL_STEPS[1], ["user_id", "ts"]].merge(
            t1.rename("t_prev"), on="user_id"
        )
        t2 = c.loc[c["ts"] > c["t_prev"]].groupby("user_id")["ts"].min()
        p = g.loc[g["event_type"] == FUNNEL_STEPS[2], ["user_id", "ts"]].merge(
            t2.rename("t_prev"), on="user_id"
        )
        t3 = p.loc[p["ts"] > p["t_prev"]].groupby("user_id")["ts"].min()
        return pd.DataFrame(
            {"users_view": [np.int64(len(t1))],
             "users_click": [np.int64(len(t2))],
             "users_purchase": [np.int64(len(t3))]}
        )

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column(
            "pkey", pc.cast(pc.bit_wise_and(t["user_id"], pa.scalar(n_pkeys - 1, pa.int64())), pa.int32())
        )

    parts = (
        rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "event_type", "ts"])
        .map_batches(add_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(funnel_partial, batch_format="pandas")
        .to_pandas()
    )
    out = parts[["users_view", "users_click", "users_purchase"]].sum().to_frame().T
    return out.astype("int64").reset_index(drop=True)


EVENTS_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id
)
SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS users_view,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS users_click,
       CAST((SELECT count(*) FROM p) AS BIGINT) AS users_purchase
"""


# ---------------------------------------------------------------------------
# Cohort retention: first-activity week × week-offset distinct-user matrix
# ---------------------------------------------------------------------------

WEEK_US = 7 * 86_400_000_000


def events_cohort_retention(sf_dir: str, n_pkeys: int = 64) -> pd.DataFrame:
    """Classic retention matrix: users bucketed by the ISO week of their
    FIRST event (cohort), counted distinct in every later week they were
    active, keyed by offset-in-weeks.

    Shape: ONE shuffle. Same user-sharded groupby as events_funnel; each
    shard derives (cohort_week, week_offset, user) triples vectorized and
    emits per-(cohort, offset) partial counts — distinct-exact because a
    user lives in exactly one shard. Global groupby sums ≤64 tiny partials."""

    def retention_partial(g: pd.DataFrame) -> pd.DataFrame:
        us = g["ts"].to_numpy("datetime64[us]").astype("int64")  # unit-normalized
        wk = us // WEEK_US
        df = pd.DataFrame({"user_id": g["user_id"].to_numpy(), "wk": wk})
        cw = df.groupby("user_id")["wk"].min().rename("cohort_week")
        act = df.drop_duplicates().merge(cw, on="user_id")
        act["week_offset"] = act["wk"] - act["cohort_week"]
        out = act.groupby(["cohort_week", "week_offset"], as_index=False).agg(
            n_users=("user_id", "size")
        )
        return out.astype({"cohort_week": "int64", "week_offset": "int64", "n_users": "int64"})

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column(
            "pkey", pc.cast(pc.bit_wise_and(t["user_id"], pa.scalar(n_pkeys - 1, pa.int64())), pa.int32())
        )

    out = (
        rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])
        .map_batches(add_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(retention_partial, batch_format="pandas")
        .groupby(["cohort_week", "week_offset"])
        .aggregate(Sum("n_users", alias_name="n_users"))
        .to_pandas()
    )
    return (
        out.astype({"cohort_week": "int64", "week_offset": "int64", "n_users": "int64"})
        .sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )


EVENTS_COHORT_RETENTION_SQL = f"""
WITH f AS (
  SELECT user_id, CAST(floor(epoch_us(min(ts)) / {WEEK_US}) AS BIGINT) AS cohort_week
  FROM events GROUP BY user_id
), a AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST(floor(epoch_us(e.ts) / {WEEK_US}) AS BIGINT) - f.cohort_week AS week_offset
  FROM events e JOIN f ON e.user_id = f.user_id
)
SELECT cohort_week, week_offset, CAST(count(*) AS BIGINT) AS n_users
FROM a GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""


# ---------------------------------------------------------------------------
# Per-group normalization: z-score of n_chars within each language
# ---------------------------------------------------------------------------


def doc_chars_zscore(sf_dir: str) -> pd.DataFrame:
    """Per-language z-score of document length — the "normalize a feature
    within its group" primitive (feature engineering / outlier trim).

    Shape: pass 1 computes per-lang (count, Σx, Σx²) via map-side partials →
    tiny groupby (the sums are EXACT int64 — n_chars² fits comfortably);
    pass 2 broadcasts the ≤|langs| stats and maps the z-score. The float
    expression tree (mean = Σx/n; var = Σx²/n − mean²; z = (x−mean)/√var)
    is replicated VERBATIM in the oracle SQL so IEEE rounding matches
    bit-for-bit (the k_corr/moment discipline)."""

    def stats_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"lang": t["lang"].to_pandas(), "x": t["n_chars"].to_numpy()})
        g = df.groupby("lang")["x"].agg(n="size", s1="sum", s2=lambda v: int((v.to_numpy() ** 2).sum()))
        g = g.reset_index()
        return pa.table(
            {"lang": pa.array(g["lang"], pa.string()),
             "n": pa.array(g["n"].to_numpy(), pa.int64()),
             "s1": pa.array(g["s1"].to_numpy(), pa.int64()),
             "s2": pa.array(g["s2"].to_numpy(), pa.int64())}
        )

    stats = (
        rd.read_parquet(_pq(sf_dir, "documents"), columns=["lang", "n_chars"])
        .map_batches(stats_partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n", alias_name="n"), Sum("s1", alias_name="s1"), Sum("s2", alias_name="s2"))
        .to_pandas()
    )
    langs = stats["lang"].to_numpy()
    n = stats["n"].to_numpy().astype(np.float64)
    mean = stats["s1"].to_numpy().astype(np.float64) / n
    var = stats["s2"].to_numpy().astype(np.float64) / n - mean * mean
    sref = ray.put({l: (m, v) for l, m, v in zip(langs, mean, var)})

    def zmap(t: pa.Table) -> pa.Table:
        sm = ray.get(sref)
        lg = t["lang"].to_pylist()
        x = t["n_chars"].to_numpy().astype(np.float64)
        mv = np.array([sm[l] for l in lg], dtype=np.float64)
        m, v = mv[:, 0], mv[:, 1]
        z = np.where(v > 0, (x - m) / np.sqrt(np.where(v > 0, v, 1.0)), 0.0)
        return pa.table(
            {"doc_id": t["doc_id"], "lang": t["lang"], "z": pa.array(z, pa.float64())}
        )

    out = (
        rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars"])
        .map_batches(zmap, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


DOC_CHARS_ZSCORE_SQL = """
WITH s AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n, CAST(sum(n_chars) AS BIGINT) AS s1,
         CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
  FROM documents GROUP BY lang
)
SELECT d.doc_id, d.lang,
       CASE WHEN (CAST(s.s2 AS DOUBLE) / CAST(s.n AS DOUBLE)
                  - (CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE))
                    * (CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE))) > 0
            THEN (CAST(d.n_chars AS DOUBLE) - CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE))
                 / sqrt(CAST(s.s2 AS DOUBLE) / CAST(s.n AS DOUBLE)
                        - (CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE))
                          * (CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE)))
            ELSE 0.0 END AS z
FROM documents d JOIN s ON d.lang = s.lang
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# Timeseries gap-fill: per-user hourly grid with last-observation carry-fwd
# ---------------------------------------------------------------------------

HOUR_US = 3_600_000_000
# composite-key span: user-rank*2^42 + (ts - t0) — 2^42 µs ≈ 51 days covers
# the events table's range; asserted per shard, never assumed
TS_SPAN_BITS = 42


def events_hourly_locf(sf_dir: str, n_pkeys: int = 64) -> pd.DataFrame:
    """Regularize each user's event stream onto an hourly grid, carrying the
    most recent ``value`` forward (LOCF) — the resample step that precedes
    any fixed-step timeseries model.

    Grid: hours from floor(first event) to floor(last event) per user; the
    value at hour h is the latest event with ts < (h+1)h, ties on identical
    timestamps broken by largest event_id (mirrored in the oracle's ASOF
    dedup). Shape: ONE user-sharded shuffle; inside a shard the fill is a
    single composite-key searchsorted (rank·2^42 + Δts) across ALL users at
    once — no per-user Python loop."""

    def locf_partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        us = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        val = g["value"].to_numpy()
        uids, starts = np.unique(us, return_index=True)
        ends = np.append(starts[1:], len(us))
        t0 = ts.min()
        span = ts.max() - t0
        if span >= (1 << TS_SPAN_BITS):
            raise ValueError(
                f"events_hourly_locf: ts span {span}us exceeds 2^{TS_SPAN_BITS}; "
                "widen TS_SPAN_BITS (range check, never silent wrap)"
            )
        if len(uids) << TS_SPAN_BITS >= (1 << 63):
            raise ValueError(
                f"events_hourly_locf: {len(uids)} distinct users in one shard "
                "would overflow the composite key; use more shards "
                "(range check, never silent wrap)"
            )
        rank = np.searchsorted(uids, us)
        # grid hours per user
        h0 = ts[starts] // HOUR_US
        h1 = ts[ends - 1] // HOUR_US
        counts = (h1 - h0 + 1).astype(np.int64)
        gu = np.repeat(np.arange(len(uids)), counts)  # user rank per grid row
        gh = np.concatenate([np.arange(a, b + 1) for a, b in zip(h0, h1)]) if len(uids) else np.array([], dtype=np.int64)
        # event composite keys (sorted); grid boundary = end of hour
        ev_key = rank * (1 << TS_SPAN_BITS) + (ts - t0)
        q_key = gu * (1 << TS_SPAN_BITS) + np.minimum(
            (gh + 1) * HOUR_US - 1 - t0, (1 << TS_SPAN_BITS) - 1
        )
        pos = np.searchsorted(ev_key, q_key, side="right") - 1
        # grid start ≥ first event's hour ⇒ pos lands inside the same user
        return pd.DataFrame(
            {"user_id": uids[gu], "hour": gh.astype("int64"), "value": val[pos]}
        )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts_us": ts_us(t["ts"]),
                "event_id": t["event_id"],
                "value": t["value"],
                "pkey": pc.cast(
                    pc.bit_wise_and(t["user_id"], pa.scalar(n_pkeys - 1, pa.int64())), pa.int32()
                ),
            }
        )

    out = (
        rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(locf_partial, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["user_id", "hour"]).reset_index(drop=True)


EVENTS_HOURLY_LOCF_SQL = f"""
WITH e2 AS (
  SELECT user_id, epoch_us(ts) AS ts_us, value,
         row_number() OVER (PARTITION BY user_id, epoch_us(ts) ORDER BY event_id DESC) AS rn
  FROM events
), e3 AS (
  SELECT user_id, ts_us, value FROM e2 WHERE rn = 1
), b AS (
  SELECT user_id,
         CAST(floor(min(ts_us) / {HOUR_US}) AS BIGINT) AS h0,
         CAST(floor(max(ts_us) / {HOUR_US}) AS BIGINT) AS h1
  FROM e3 GROUP BY user_id
), g AS (
  SELECT user_id, unnest(generate_series(h0, h1)) AS hour FROM b
)
SELECT g.user_id, g.hour, e3.value
FROM g ASOF JOIN e3
  ON g.user_id = e3.user_id AND (g.hour + 1) * {HOUR_US} - 1 >= e3.ts_us
ORDER BY g.user_id, g.hour
"""


# ---------------------------------------------------------------------------
# Co-occurrence: event-type pairs sharing a user (market-basket association)
# ---------------------------------------------------------------------------


def events_type_cooccurrence(sf_dir: str, n_pkeys: int = 64) -> pd.DataFrame:
    """For every unordered pair of event types, how many users did both —
    the association-mining primitive. ONE user-sharded shuffle: each shard
    dedups (user, type), self-merges per user (type_a < type_b, a ≤k² blowup
    over a TINY vocabulary), and emits per-pair partials; distinct-exact
    because a user lives in one shard."""

    def pair_partial(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates()
        m = d.merge(d, on="user_id")
        m = m[m["event_type_x"] < m["event_type_y"]]
        out = m.groupby(["event_type_x", "event_type_y"], as_index=False).agg(
            n_users=("user_id", "size")
        )
        return out.rename(columns={"event_type_x": "type_a", "event_type_y": "type_b"}).astype(
            {"n_users": "int64"}
        )

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column(
            "pkey", pc.cast(pc.bit_wise_and(t["user_id"], pa.scalar(n_pkeys - 1, pa.int64())), pa.int32())
        )

    out = (
        rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "event_type"])
        .map_batches(add_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(pair_partial, batch_format="pandas")
        .groupby(["type_a", "type_b"])
        .aggregate(Sum("n_users", alias_name="n_users"))
        .to_pandas()
    )
    return (
        out.astype({"n_users": "int64"})
        .sort_values(["type_a", "type_b"])
        .reset_index(drop=True)
    )


EVENTS_TYPE_COOCCURRENCE_SQL = """
WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b, CAST(count(*) AS BIGINT) AS n_users
FROM d a JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY type_a, type_b
ORDER BY type_a, type_b
"""


# ---------------------------------------------------------------------------
# Key-skew diagnostics: the shuffle-planning report (hot-key detection)
# ---------------------------------------------------------------------------


def events_key_skew(sf_dir: str) -> pd.DataFrame:
    """One-row skew report over the events shuffle key (user_id): key count,
    total rows, max/min per-key load and an integer skew factor
    (max·1000·n_keys // total = 1000 × max/mean). This is the diagnostic a
    100-TB run consults before choosing salt factors — map-side count
    partials → one small groupby → 4 scalar aggregates; all-integer so the
    oracle hash is exact."""
    from ray.data.aggregate import Max, Min

    def count_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"user_id": t["user_id"].to_numpy()})
        g = df.groupby("user_id", as_index=False).agg(cnt=("user_id", "size"))
        return pa.table(
            {"user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
             "cnt": pa.array(g["cnt"].to_numpy(), pa.int64())}
        )

    counts = (
        rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id"])
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    stats = counts.aggregate(
        Count(alias_name="n_keys"),
        Sum("cnt", alias_name="total"),
        Max("cnt", alias_name="max_cnt"),
        Min("cnt", alias_name="min_cnt"),
    )
    n_keys = int(stats["n_keys"]); total = int(stats["total"])
    mx = int(stats["max_cnt"]); mn = int(stats["min_cnt"])
    return pd.DataFrame(
        {"n_keys": [n_keys], "total": [total], "max_cnt": [mx], "min_cnt": [mn],
         "skew_x1000": [mx * 1000 * n_keys // total]}
    ).astype("int64")


EVENTS_KEY_SKEW_SQL = """
WITH c AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(cnt) AS BIGINT) AS total,
       CAST(max(cnt) AS BIGINT) AS max_cnt,
       CAST(min(cnt) AS BIGINT) AS min_cnt,
       CAST(max(cnt) * 1000 * count(*) // sum(cnt) AS BIGINT) AS skew_x1000
FROM c
"""


# ---------------------------------------------------------------------------
# Corpus mixing: deterministic per-language rebalance (downsample to the
# smallest language's share) — the "fix the language mix" pretraining op
# ---------------------------------------------------------------------------

U52 = 1 << 52  # md5-prefix uniform resolution (13 hex chars)


def doc_balanced_sample(sf_dir: str) -> pd.DataFrame:
    """Downsample every language to (approximately) the smallest language's
    document count, deterministically: keep doc iff
    ``u52(md5(doc_id)) < floor(min_cnt · 2^52 / cnt_lang)``.

    The hash-thresholding makes the sample a pure function of doc_id —
    identical on any cluster, restart-stable, and reproducible in SQL with
    the same integer arithmetic (thresholds are exact integer floors; the
    min·2^52 product is computed in Python/HUGEINT, never in wrapping
    int64). Shape: one tiny per-lang count groupby → broadcast thresholds →
    one filtering map; no shuffle of the corpus."""
    from data_quality_ray.functions.hashing import md5_u52_column

    counts = (
        rd.read_parquet(_pq(sf_dir, "documents"), columns=["lang"])
        .groupby("lang")
        .aggregate(Count(alias_name="cnt"))
        .to_pandas()
    )
    min_cnt = int(counts["cnt"].min())
    # exact integer thresholds (python ints — arbitrary precision)
    thresholds = {
        l: (min_cnt * U52) // int(c) for l, c in zip(counts["lang"], counts["cnt"])
    }
    tref = ray.put(thresholds)

    def keep(t: pa.Table) -> pa.Table:
        th = ray.get(tref)
        u = md5_u52_column(t["doc_id"])
        lim = np.array([th[l] for l in t["lang"].to_pylist()], dtype=np.int64)
        return t.filter(pa.array(u < lim))

    out = (
        rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "lang"])
        .map_batches(keep, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


DOC_BALANCED_SAMPLE_SQL = f"""
WITH c AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS cnt FROM documents GROUP BY lang
), t AS (
  -- min_cnt * 2^52 promotes to HUGEINT in DuckDB: exact, like Python ints
  SELECT lang, (SELECT min(cnt) FROM c) * {U52} // cnt AS lim FROM c
)
SELECT d.doc_id, d.lang
FROM documents d JOIN t ON d.lang = t.lang
WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 13)) AS BIGINT) < t.lim
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# Streaming anomaly flags: integer-exact 3σ test over the trailing hour
# ---------------------------------------------------------------------------


def events_anomaly_flags(sf_dir: str) -> pd.DataFrame:
    """Flag events whose value deviates >3σ from the same user's trailing
    1-hour window (window inclusive of the current row, population σ) — the
    streaming outlier-detection primitive.

    Exactness: the 3σ test is evaluated as the INTEGER inequality
    ``(v·n − s1)² > 9·(n·s2 − s1²)`` over cent-scaled values, so pipeline
    and oracle agree bit-for-bit with no float σ. Overflow contract: with
    bound = n·max|v|, the largest term actually evaluated is
    9·(n·s2 − s1²) ≤ 9·bound² (and (v·n − s1)² ≤ 4·bound²), so the guard
    requires 9·bound² < 2^63 — not merely bound² < 2^62, which would
    admit silent int64 wraparound in the factor-9 term where DuckDB
    raises. Shape: one BOUNDED user-sharded groupby (``user_id & 63``),
    trailing sums from prefix cumsums + one composite-key searchsorted
    across all users in the shard (``_trailing_bounds``) — never one Ray
    UDF call per distinct user."""
    hour_us = 3_600_000_000
    n_pkeys = 64

    def prep(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(t["value"], pa.scalar(100.0)), round_mode="half_up"), pa.int64())
        return pa.table(
            {"event_id": t["event_id"], "user_id": t["user_id"],
             # normalize to µs BEFORE int64 (a ns-unit file would otherwise
             # silently shrink the window 1000×)
             "ts_us": ts_us(t["ts"]), "v": v,
             "pkey": pc.cast(
                 pc.bit_wise_and(t["user_id"], pa.scalar(n_pkeys - 1, pa.int64())),
                 pa.int32(),
             )}
        )

    def flags_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        v = g["v"].to_numpy()
        lo, hi = _trailing_bounds(g["user_id"].to_numpy(), g["ts_us"].to_numpy(), hour_us)
        # cumsums span the whole shard, but lo/hi stay inside each user's
        # slice, so the differences are per-user window sums
        cs1 = np.concatenate(([0], np.cumsum(v)))
        cs2 = np.concatenate(([0], np.cumsum(v * v)))
        n = hi - lo
        s1 = cs1[hi] - cs1[lo]
        s2 = cs2[hi] - cs2[lo]
        bound = int(np.max(np.abs(v), initial=0)) * int(n.max(initial=1))
        if 9 * bound * bound >= (1 << 63):
            raise ValueError(
                "events_anomaly_flags: 9·(n·max_v)² would overflow int64; "
                "rescale values or shrink the window before the math wraps"
            )
        lhs = v * n - s1
        is_anom = (n >= 2) & (lhs * lhs > 9 * (n * s2 - s1 * s1))
        return pd.DataFrame(
            {"event_id": g["event_id"].to_numpy(), "n_trailing": n, "is_anomaly": is_anom}
        )

    out = (
        rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(flags_shard, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("event_id").reset_index(drop=True)


EVENTS_ANOMALY_FLAGS_SQL = """
WITH w AS (
  SELECT event_id,
         CAST(round(value * 100) AS BIGINT) AS v,
         CAST(count(*) OVER win AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER win AS BIGINT) AS s1,
         CAST(sum(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT))
              OVER win AS BIGINT) AS s2
  FROM events
  WINDOW win AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
)
SELECT event_id, n AS n_trailing,
       (n >= 2 AND (v * n - s1) * (v * n - s1) > 9 * (n * s2 - s1 * s1)) AS is_anomaly
FROM w ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Ordered aggregation: per-user event-type sequence (string_agg ORDER BY)
# ---------------------------------------------------------------------------


def events_type_sequences(sf_dir: str, n_pkeys: int = 64) -> pd.DataFrame:
    """Per user, the comma-joined sequence of event types in (ts, event_id)
    order plus the event count — the ordered-aggregation surface
    (session-as-string is the standard input to sequence mining). ONE
    user-sharded shuffle; each shard sorts once and joins per-user slices;
    the (ts, event_id) tie-break makes the string deterministic, so the
    oracle hash is exact."""

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts_us": ts_us(t["ts"]),
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "pkey": pc.cast(
                    pc.bit_wise_and(t["user_id"], pa.scalar(n_pkeys - 1, pa.int64())),
                    pa.int32(),
                ),
            }
        )

    def seq_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        out = g.groupby("user_id", sort=True).agg(
            type_seq=("event_type", ",".join), n_events=("event_type", "size")
        )
        out = out.reset_index()
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    out = (
        rd.read_parquet(
            _pq(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type"]
        )
        .map_batches(prep, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(seq_shard, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True)


EVENTS_TYPE_SEQUENCES_SQL = """
SELECT user_id,
       string_agg(event_type, ',' ORDER BY ts, event_id) AS type_seq,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY user_id ORDER BY user_id
"""


def events_type_transitions(sf_dir: str, n_pkeys: int = 64) -> pd.DataFrame:
    """Corpus-wide event-type transition counts (prev_type → next_type over
    each user's (ts, event_id)-ordered stream) — distributed first-order
    Markov-chain training, the sequence-model companion to
    ``train_char_lm_counts``.

    Shape: ONE bounded user-sharded shuffle; inside the shard one sort +
    one array shift (user boundaries masked) emits every user's adjacent
    pairs at once, pre-aggregated to (prev, next, n) — a ≤|vocab|² partial
    per shard — then a tiny vectorized ``groupby.aggregate(Sum)`` merges
    shards. Never one Ray UDF call per user."""
    from ray.data.aggregate import Sum as _Sum

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts_us": ts_us(t["ts"]),
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "pkey": pc.cast(
                    pc.bit_wise_and(t["user_id"], pa.scalar(n_pkeys - 1, pa.int64())),
                    pa.int32(),
                ),
            }
        )

    def pairs_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        if len(g) < 2:
            return pd.DataFrame({"prev_type": [], "next_type": [], "n": []}).astype(
                {"prev_type": str, "next_type": str, "n": np.int64}
            )
        same_user = u[1:] == u[:-1]
        part = (
            pd.DataFrame({"prev_type": et[:-1][same_user], "next_type": et[1:][same_user]})
            .groupby(["prev_type", "next_type"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        part["n"] = part["n"].astype(np.int64)
        return part

    out = (
        rd.read_parquet(
            _pq(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type"]
        )
        .map_batches(prep, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(pairs_shard, batch_format="pandas")
        .groupby(["prev_type", "next_type"])
        .aggregate(_Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["prev_type", "next_type"]).reset_index(drop=True)


EVENTS_TYPE_TRANSITIONS_SQL = """
WITH s AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
FROM s WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
ORDER BY prev_type, next_type
"""


# ---------------------------------------------------------------------------
# Fact×fact forward interval join: events within 7 days after each order
# ---------------------------------------------------------------------------

WINDOW_JOIN_DAYS = 7


def orders_events_window_join(sf_dir: str, n_buckets: int = 64) -> pd.DataFrame:
    """Per order: count and e6-fixed-point value sum of the SAME user's
    events with ts in the half-open forward window
    (o_orderdate, o_orderdate + 7 days] — a fact×fact INTERVAL join with a
    grouped aggregate (the post-purchase attribution shape). LEFT
    semantics: orders with no window events emit zeros.

    Scale shape: BOTH fact tables are co-partitioned by one bounded
    ``hash(user) & 63`` bucket via a tagged union (the bucketed-join
    machinery) — each bucket holds every row needed to answer its own
    orders, so the shard output is final with no second shuffle. Inside a
    shard the window bounds for ALL orders come from TWO composite-key
    searchsorteds over the time-sorted event rows (user-rank·M + Δt, M
    sized from the actual span — orders span years, so no fixed 2^42
    assumption; the rank·M < 2^63 guard raises before any silent wrap),
    and the sums are prefix-cumsum differences — never a per-user or
    per-order Python loop."""
    window_us = WINDOW_JOIN_DAYS * 86_400_000_000

    def prep_events(t: pa.Table) -> pa.Table:
        e6 = pc.cast(
            pc.round(pc.multiply(t["value"], pa.scalar(1_000_000.0)), round_mode="half_up"),
            pa.int64(),
        )
        return pa.table(
            {
                "key": t["user_id"],
                "t_us": ts_us(t["ts"]),
                "kind": pa.array(np.ones(t.num_rows, np.int8)),
                "val_e6": e6,
                "o_orderkey": pa.array(np.zeros(t.num_rows, np.int64)),
                "bucket": pc.cast(
                    pc.bit_wise_and(t["user_id"], pa.scalar(n_buckets - 1, pa.int64())),
                    pa.int32(),
                ),
            }
        )

    def prep_orders(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": t["o_custkey"],
                "t_us": ts_us(t["o_orderdate"]),
                "kind": pa.array(np.zeros(t.num_rows, np.int8)),
                "val_e6": pa.array(np.zeros(t.num_rows, np.int64)),
                "o_orderkey": t["o_orderkey"],
                "bucket": pc.cast(
                    pc.bit_wise_and(t["o_custkey"], pa.scalar(n_buckets - 1, pa.int64())),
                    pa.int32(),
                ),
            }
        )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        od = g[g["kind"] == 0]
        ev = g[g["kind"] == 1].sort_values(["key", "t_us"], kind="mergesort")
        if len(od) == 0:
            return pd.DataFrame(
                {"o_orderkey": [], "n_events": [], "value_e6_sum": []}
            ).astype({"o_orderkey": np.int64, "n_events": np.int64, "value_e6_sum": np.int64})
        okeys = od["o_orderkey"].to_numpy()
        n_ev = np.zeros(len(od), np.int64)
        s_ev = np.zeros(len(od), np.int64)
        if len(ev):
            eu = ev["key"].to_numpy()
            et = ev["t_us"].to_numpy()
            val = ev["val_e6"].to_numpy()
            uids, starts = np.unique(eu, return_index=True)
            ends = np.append(starts[1:], len(eu))
            t0 = min(int(et.min()), int(od["t_us"].min()))
            span = max(int(et.max()), int(od["t_us"].max()) + window_us) - t0 + 1
            if len(uids) * span >= (1 << 63):
                raise ValueError(
                    "orders_events_window_join: rank*span composite key would "
                    "overflow int64; shrink the bucket or window before wrap"
                )
            erank = np.searchsorted(uids, eu)
            ekey = erank * span + (et - t0)
            orank = np.searchsorted(uids, od["key"].to_numpy())
            orank = np.minimum(orank, len(uids) - 1)
            has_ev = uids[orank] == od["key"].to_numpy()
            ot = od["t_us"].to_numpy()
            lo = np.searchsorted(ekey, orank * span + (ot - t0), side="right")
            hi = np.searchsorted(ekey, orank * span + (ot + window_us - t0), side="right")
            lo = np.clip(lo, starts[orank], ends[orank])
            hi = np.clip(hi, starts[orank], ends[orank])
            cum = np.concatenate(([0], np.cumsum(val)))
            n_ev = np.where(has_ev, hi - lo, 0).astype(np.int64)
            s_ev = np.where(has_ev, cum[hi] - cum[lo], 0).astype(np.int64)
        return pd.DataFrame(
            {"o_orderkey": okeys, "n_events": n_ev, "value_e6_sum": s_ev}
        )

    ev = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["user_id", "ts", "value"]
    ).map_batches(prep_events, batch_format="pyarrow")
    od = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_custkey", "o_orderdate", "o_orderkey"]
    ).map_batches(prep_orders, batch_format="pyarrow")
    out = (
        ev.union(od)
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("o_orderkey").reset_index(drop=True)


ORDERS_EVENTS_WINDOW_JOIN_SQL = f"""
SELECT o.o_orderkey,
       CAST(count(e.ts) AS BIGINT) AS n_events,
       CAST(coalesce(sum(CAST(round(e.value * 1000000) AS BIGINT)), 0) AS BIGINT)
         AS value_e6_sum
FROM orders o LEFT JOIN events e
  ON e.user_id = o.o_custkey
 AND e.ts > o.o_orderdate
 AND e.ts <= o.o_orderdate + INTERVAL {WINDOW_JOIN_DAYS} DAY
GROUP BY o.o_orderkey
ORDER BY o.o_orderkey
"""


# ---------------------------------------------------------------------------
# Gaps-and-islands: longest consecutive-active-day streak per user
# ---------------------------------------------------------------------------


DAY_US = 86_400_000_000  # one day in µs — interpolated into the oracle SQL


def events_daily_streaks(sf_dir: str, n_pkeys: int = 64) -> pd.DataFrame:
    """Per user: count of distinct active days and the longest run of
    CONSECUTIVE days — the gaps-and-islands pattern (SQL: day −
    row_number() island key). Day = floor(epoch µs / 86 400 000 000), the
    same integer on both sides. One user-sharded shuffle; inside a shard
    the island labels come from one vectorized cumsum over day breaks."""
    def prep(t: pa.Table) -> pa.Table:
        us = ts_us(t["ts"])
        return pa.table(
            {
                "user_id": t["user_id"],
                "day": pc.divide(us, pa.scalar(DAY_US, pa.int64())),
                "pkey": pc.cast(
                    pc.bit_wise_and(t["user_id"], pa.scalar(n_pkeys - 1, pa.int64())),
                    pa.int32(),
                ),
            }
        )

    def streak_shard(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["user_id", "day"]].drop_duplicates().sort_values(["user_id", "day"])
        u = d["user_id"].to_numpy()
        day = d["day"].to_numpy()
        brk = np.ones(len(d), dtype=bool)
        brk[1:] = (u[1:] != u[:-1]) | (day[1:] != day[:-1] + 1)
        island = np.cumsum(brk)
        runs = pd.DataFrame({"user_id": u, "island": island})
        per_island = runs.groupby(["user_id", "island"], as_index=False).agg(
            streak=("island", "size")
        )
        out = per_island.groupby("user_id", as_index=False).agg(
            n_days=("streak", "sum"), max_streak=("streak", "max")
        )
        return out.astype({"n_days": "int64", "max_streak": "int64"})

    out = (
        rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(streak_shard, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True)


EVENTS_DAILY_STREAKS_SQL = f"""
WITH d AS (
  SELECT DISTINCT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // {DAY_US} AS day
  FROM events
), r AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM d
), s AS (
  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS streak
  FROM r GROUP BY user_id, grp
)
SELECT user_id,
       CAST(sum(streak) AS BIGINT) AS n_days,
       CAST(max(streak) AS BIGINT) AS max_streak
FROM s GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# CUBE grouping sets: every (status × priority) subset in one pass
# ---------------------------------------------------------------------------


def orders_status_cube(sf_dir: str) -> pd.DataFrame:
    """Order revenue/count at ALL FOUR grains of (o_orderstatus,
    o_orderpriority) — GROUP BY CUBE. The base grain is one distributed
    integer-cents groupby (≤ 3×5 cells); the three marginal grids are
    re-aggregated from those cells on the driver — partials, never data
    (same derivation discipline as revenue_rollup, which covers the
    hierarchical ROLLUP case; CUBE adds the cross-subset lattice)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["o_totalprice"].to_numpy() * 10_000.0 + 0.5).astype("int64")
        df = pd.DataFrame(
            {"status": b["o_orderstatus"], "priority": b["o_orderpriority"], "e4": cents}
        )
        return df.groupby(["status", "priority"], as_index=False).agg(
            e4=("e4", "sum"), n_orders=("e4", "size")
        )

    base = (
        rd.read_parquet(
            _pq(sf_dir, "orders"),
            columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
        )
        .map_batches(partial, batch_format="pandas")
        .groupby(["status", "priority"])
        .aggregate(Sum("e4", alias_name="e4"), Sum("n_orders", alias_name="n_orders"))
        .to_pandas()
    )
    by_status = base.groupby("status", as_index=False).agg(
        e4=("e4", "sum"), n_orders=("n_orders", "sum")
    )
    by_status["priority"] = "ALL"
    by_prio = base.groupby("priority", as_index=False).agg(
        e4=("e4", "sum"), n_orders=("n_orders", "sum")
    )
    by_prio["status"] = "ALL"
    total = pd.DataFrame(
        {
            "status": ["ALL"],
            "priority": ["ALL"],
            "e4": [base["e4"].sum()],
            "n_orders": [base["n_orders"].sum()],
        }
    )
    out = pd.concat([base, by_status, by_prio, total], ignore_index=True)
    out["revenue"] = ((out.pop("e4").to_numpy() + 50) // 100) / 100.0
    out["n_orders"] = out["n_orders"].astype("int64")
    return (
        out[["status", "priority", "revenue", "n_orders"]]
        .sort_values(["status", "priority"])
        .reset_index(drop=True)
    )


ORDERS_STATUS_CUBE_SQL = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       ((sum(CAST(round(o_totalprice * 10000) AS BIGINT)) + 50) // 100) / 100.0 AS revenue,
       count(*) AS n_orders
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
ORDER BY status, priority
"""


# ---------------------------------------------------------------------------
# percent_rank window: tie-aware relative rank within a partition
# ---------------------------------------------------------------------------


def orders_percent_rank(sf_dir: str) -> pd.DataFrame:
    """Per order, percent_rank() of o_totalprice within its priority class —
    the tie-aware relative-rank window ((rank−1)/(n−1), rank() semantics:
    equal prices share a rank). Exact vs DuckDB because both sides divide
    the same exact integers in double precision. groupby(priority) →
    in-group sort + ONE searchsorted for all ranks."""

    def pr(g: pd.DataFrame) -> pd.DataFrame:
        v = g["o_totalprice"].to_numpy()
        order = np.argsort(v, kind="stable")
        sv = v[order]
        rank = np.searchsorted(sv, v, side="left") + 1  # ties → min rank
        n = len(v)
        out = pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].to_numpy(),
                "pct_rank": (rank - 1) / (n - 1) if n > 1 else np.zeros(n),
            }
        )
        return out

    out = (
        rd.read_parquet(
            _pq(sf_dir, "orders"),
            columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
        )
        .groupby("o_orderpriority")
        .map_groups(pr, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("o_orderkey").reset_index(drop=True)


ORDERS_PERCENT_RANK_SQL = """
SELECT o_orderkey,
       percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice)
           AS pct_rank
FROM orders ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# Modal value (argmax with deterministic tie-break) per group
# ---------------------------------------------------------------------------


def part_mode_type(sf_dir: str) -> pd.DataFrame:
    """Per brand: the most common part type, its count, and the brand's
    total — the mode/argmax aggregate. Counts come from one
    map-side-combined distributed groupby over ≤ |brands|×|types| cells;
    the argmax (ties → lexicographically smallest type, matching the SQL
    window's ORDER BY) picks from those cells on the driver."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["p_brand", "p_type"], as_index=False).agg(
            n=("p_type", "size")
        )

    cells = (
        rd.read_parquet(_pq(sf_dir, "part"), columns=["p_brand", "p_type"])
        .map_batches(partial, batch_format="pandas")
        .groupby(["p_brand", "p_type"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    cells = cells.sort_values(["p_brand", "n", "p_type"], ascending=[True, False, True])
    best = cells.drop_duplicates("p_brand", keep="first").copy()
    totals = cells.groupby("p_brand", as_index=False).agg(n_total=("n", "sum"))
    out = best.merge(totals, on="p_brand").rename(
        columns={"p_type": "mode_type", "n": "n_mode"}
    )
    out["n_mode"] = out["n_mode"].astype("int64")
    out["n_total"] = out["n_total"].astype("int64")
    return (
        out[["p_brand", "mode_type", "n_mode", "n_total"]]
        .sort_values("p_brand")
        .reset_index(drop=True)
    )


PART_MODE_TYPE_SQL = """
WITH c AS (
  SELECT p_brand, p_type, CAST(count(*) AS BIGINT) AS n
  FROM part GROUP BY p_brand, p_type
), r AS (
  SELECT p_brand, p_type, n,
         row_number() OVER (PARTITION BY p_brand ORDER BY n DESC, p_type) AS rk,
         CAST(sum(n) OVER (PARTITION BY p_brand) AS BIGINT) AS n_total
  FROM c
)
SELECT p_brand, p_type AS mode_type, n AS n_mode, n_total
FROM r WHERE rk = 1 ORDER BY p_brand
"""
