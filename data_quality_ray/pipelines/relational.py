"""Relational operator coverage over the driver's TPC-H-ish tables.

These exercise the engine's generic query surface (groupby-aggregate with
map-side partials, broadcast joins, sort/top-k, windowed event aggregates,
filter/project with read-time pruning) — each has an exact DuckDB oracle in
``__ray_entry__.oracle_sql`` (driver conformance gate).

Design rules applied throughout (SURVEY.md §4/§7.3):
- prune columns AND push row filters into ``read_parquet``;
- pre-aggregate inside map_batches before any groupby where the group count
  is far below the row count (combiner);
- broadcast small dimension tables (``ray.put`` once, dict lookup per batch)
  instead of shuffle joins;
- floats that cross the oracle boundary are rounded to 2 decimals on BOTH
  sides (block-order-dependent double summation vs sequential SQL).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def ts_us(col) -> "pa.Array":
    """Timestamp column → int64 MICROseconds, normalizing the unit first.

    A raw ``pc.cast(ts, int64)`` yields whatever unit the file stored (a
    ns-unit parquet would silently shrink every µs window constant 1000×);
    every window/join that mixes ts integers with µs constants must go
    through this."""
    import pyarrow.compute as _pc

    return _pc.cast(_pc.cast(col, pa.timestamp("us")), pa.int64())


def _pq(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# ---------------------------------------------------------------------------
# Q1-style pricing summary: filter → groupby(2 keys) → 8 aggregates
# ---------------------------------------------------------------------------


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1 shape: per (returnflag, linestatus) sums/means over lineitem.

    Read is pruned to the 7 needed columns with the shipdate predicate pushed
    to parquet row groups. The groupby has ~6 groups — Ray's hash aggregate
    does map-side partials already, so no manual combiner is needed.
    """
    cutoff = pa.scalar(pd.Timestamp("1998-09-02"), pa.timestamp("us"))
    ds = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_shipdate",
        ],
        filter=(pc.field("l_shipdate") <= cutoff),
    )

    def _e4(x) -> pa.Array:
        # fixed-point 1e-4 units: integer sums are exact at ANY summation
        # order, so Ray's block-order-dependent combine matches sequential SQL
        return pc.cast(
            pc.round(pc.multiply(x, pa.scalar(10_000.0)), round_mode="half_up"),
            pa.int64(),
        )

    def derive(t: pa.Table) -> pa.Table:
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        charge = pc.multiply(disc, pc.add(pa.scalar(1.0), t["l_tax"]))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_e4": _e4(t["l_quantity"]),
                "price_e4": _e4(t["l_extendedprice"]),
                "disc_price_e4": _e4(disc),
                "charge_e4": _e4(charge),
                "disc_e4": _e4(t["l_discount"]),
            }
        )

    out = (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_e4", alias_name="qty_e4"),
            Sum("price_e4", alias_name="price_e4"),
            Sum("disc_price_e4", alias_name="disc_price_e4"),
            Sum("charge_e4", alias_name="charge_e4"),
            Sum("disc_e4", alias_name="disc_e4"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
    )
    # ALL rounding in integer space (half-up, positive values): a 2-decimal
    # result is cents/100.0 — bit-identical to the SQL oracle, no float
    # rounding boundary cases (the .965 problem)
    n = out["count_order"].to_numpy()

    def cents(e4: pd.Series) -> np.ndarray:
        return (e4.to_numpy() + 50) // 100

    c_qty = cents(out.pop("qty_e4"))
    c_price = cents(out.pop("price_e4"))
    out["sum_qty"] = c_qty / 100.0
    out["sum_base_price"] = c_price / 100.0
    out["sum_disc_price"] = cents(out.pop("disc_price_e4")) / 100.0
    out["sum_charge"] = cents(out.pop("charge_e4")) / 100.0
    out["avg_qty"] = ((2 * c_qty + n) // (2 * n)) / 100.0
    out["avg_price"] = ((2 * c_price + n) // (2 * n)) / 100.0
    out["avg_disc"] = ((2 * out.pop("disc_e4").to_numpy() + 100 * n) // (200 * n)) / 100.0
    cols = ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
            "sum_disc_price", "sum_charge", "avg_qty", "avg_price", "avg_disc",
            "count_order"]
    return out[cols].sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


Q1_SQL = """
WITH e4 AS (
  SELECT l_returnflag, l_linestatus,
         CAST(round(l_quantity * 10000) AS BIGINT)      AS qty_e4,
         CAST(round(l_extendedprice * 10000) AS BIGINT) AS price_e4,
         CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS disc_price_e4,
         CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000) AS BIGINT) AS charge_e4,
         CAST(round(l_discount * 10000) AS BIGINT)      AS disc_e4
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
)
SELECT l_returnflag, l_linestatus,
       ((sum(qty_e4) + 50) // 100) / 100.0        AS sum_qty,
       ((sum(price_e4) + 50) // 100) / 100.0      AS sum_base_price,
       ((sum(disc_price_e4) + 50) // 100) / 100.0 AS sum_disc_price,
       ((sum(charge_e4) + 50) // 100) / 100.0     AS sum_charge,
       ((2 * ((sum(qty_e4) + 50) // 100) + count(*)) // (2 * count(*))) / 100.0   AS avg_qty,
       ((2 * ((sum(price_e4) + 50) // 100) + count(*)) // (2 * count(*))) / 100.0 AS avg_price,
       ((2 * sum(disc_e4) + 100 * count(*)) // (200 * count(*))) / 100.0          AS avg_disc,
       count(*)                                   AS count_order
FROM e4
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Broadcast join: orders ⋈ customer (small side broadcast, no shuffle)
# ---------------------------------------------------------------------------


def revenue_by_segment(sf_dir: str) -> pd.DataFrame:
    """Total order value per customer market segment.

    The customer table is tiny relative to orders → broadcast pattern:
    ``ray.put`` the custkey→segment dict once; every map task reads it from
    the object store (zero-copy for the actor, one ship per node at scale)
    and does a vectorized pandas ``map`` — no all-to-all shuffle.
    """
    cust = pd.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    seg_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    def attach(batch: pd.DataFrame) -> pd.DataFrame:
        seg = ray.get(seg_ref)
        out = pd.DataFrame(
            {
                "c_mktsegment": batch["o_custkey"].map(seg),
                # fixed-point: summation-order-independent (see q1)
                "price_e4": np.floor(batch["o_totalprice"].to_numpy() * 10_000.0 + 0.5).astype("int64"),
            }
        )
        # combiner: one partial row per segment per batch
        return out.groupby("c_mktsegment", as_index=False).agg(
            rev_e4=("price_e4", "sum"), n_orders=("price_e4", "size")
        )

    out = (
        rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
        .map_batches(attach, batch_format="pandas")
        .groupby("c_mktsegment")
        .aggregate(Sum("rev_e4", alias_name="rev_e4"), Sum("n_orders", alias_name="n_orders"))
        .to_pandas()
    )
    out["revenue"] = ((out.pop("rev_e4").to_numpy() + 50) // 100) / 100.0
    return out[["c_mktsegment", "revenue", "n_orders"]].sort_values(
        "c_mktsegment"
    ).reset_index(drop=True)


REVENUE_BY_SEGMENT_SQL = """
SELECT c_mktsegment,
       ((sum(CAST(round(o_totalprice * 10000) AS BIGINT)) + 50) // 100) / 100.0 AS revenue,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Sort / top-k: top customers by revenue
# ---------------------------------------------------------------------------


def top_customers(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Top-k customers by total order value (groupby → sort → limit).

    The groupby output is |customers| rows (small); sort+limit on it is a
    cheap distributed sort. Ties broken by custkey for determinism.
    """
    def to_e4(t: pa.Table) -> pa.Table:
        e4 = pc.cast(
            pc.round(pc.multiply(t["o_totalprice"], pa.scalar(10_000.0)),
                     round_mode="half_up"),
            pa.int64(),
        )
        return pa.table({"o_custkey": t["o_custkey"], "price_e4": e4})

    agg = (
        rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
        .map_batches(to_e4, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("price_e4", alias_name="rev_e4"))
    )
    top = agg.sort(["rev_e4", "o_custkey"], descending=[True, False]).limit(k).to_pandas()
    top["revenue"] = ((top.pop("rev_e4").to_numpy() + 50) // 100) / 100.0
    return top[["o_custkey", "revenue"]].reset_index(drop=True)


TOP_CUSTOMERS_SQL = """
SELECT o_custkey,
       ((sum(CAST(round(o_totalprice * 10000) AS BIGINT)) + 50) // 100) / 100.0 AS revenue
FROM orders
GROUP BY o_custkey
ORDER BY sum(CAST(round(o_totalprice * 10000) AS BIGINT)) DESC, o_custkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Multi-way broadcast join + filter (Q3 flavor)
# ---------------------------------------------------------------------------


def order_priority_by_nation(sf_dir: str) -> pd.DataFrame:
    """orders ⋈ customer ⋈ nation (both dims broadcast) → counts per
    (nation, priority). Two chained small-side lookups in ONE map stage."""
    cust = pd.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    nation = pd.read_parquet(_pq(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    lookup_ref = ray.put(
        (
            dict(zip(cust["c_custkey"], cust["c_nationkey"])),
            dict(zip(nation["n_nationkey"], nation["n_name"])),
        )
    )

    def attach(batch: pd.DataFrame) -> pd.DataFrame:
        c2n, n2name = ray.get(lookup_ref)
        nk = batch["o_custkey"].map(c2n)
        out = pd.DataFrame(
            {"n_name": nk.map(n2name), "o_orderpriority": batch["o_orderpriority"]}
        )
        return out.groupby(["n_name", "o_orderpriority"], as_index=False).size().rename(
            columns={"size": "n"}
        )

    out = (
        rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_custkey", "o_orderpriority"])
        .map_batches(attach, batch_format="pandas")
        .groupby(["n_name", "o_orderpriority"])
        .aggregate(Sum("n", alias_name="n_orders"))
        .to_pandas()
    )
    return out.sort_values(["n_name", "o_orderpriority"]).reset_index(drop=True)


ORDER_PRIORITY_BY_NATION_SQL = """
SELECT n_name, o_orderpriority, count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name, o_orderpriority
ORDER BY n_name, o_orderpriority
"""


# ---------------------------------------------------------------------------
# Filter + project with read-time pruning
# ---------------------------------------------------------------------------


def parts_filter_project(sf_dir: str) -> pd.DataFrame:
    """Filter p_size >= 30, project brand/type, compute value = price*size.

    The size predicate is pushed into the parquet read; the projection reads
    only 4 of the table's columns.
    """
    ds = rd.read_parquet(
        _pq(sf_dir, "part"),
        columns=["p_partkey", "p_brand", "p_size", "p_retailprice"],
        filter=(pc.field("p_size") >= 30),
    )

    def proj(t: pa.Table) -> pa.Table:
        # integer-cents: round(price*100) once, multiply by the int size —
        # exact at any scale (no float round boundary, see q1)
        cents = pc.cast(
            pc.round(pc.multiply(t["p_retailprice"], pa.scalar(100.0)), round_mode="half_up"),
            pa.int64(),
        )
        value = pc.divide(
            pc.cast(pc.multiply(cents, pc.cast(t["p_size"], pa.int64())), pa.float64()),
            pa.scalar(100.0),
        )
        return pa.table(
            {"p_partkey": t["p_partkey"], "p_brand": t["p_brand"], "value": value}
        )

    out = ds.map_batches(proj, batch_format="pyarrow").to_pandas()
    return out.sort_values("p_partkey").reset_index(drop=True)


PARTS_FILTER_PROJECT_SQL = """
SELECT p_partkey, p_brand,
       (CAST(round(p_retailprice * 100) AS BIGINT) * p_size) / 100.0 AS value
FROM part WHERE p_size >= 30 ORDER BY p_partkey
"""


# ---------------------------------------------------------------------------
# Event-time tumbling window aggregate (streaming-shaped workload)
# ---------------------------------------------------------------------------


def events_hourly(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1-hour event-time windows per event_type: count + sum(value).

    Ray Data has no watermarks (SURVEY.md: the reference is strictly batch
    anyway, eeg_datasets.py:70's windows are row-index tumbling); event-time
    tumbling windows are a projection ``window = floor(ts to hour)`` followed
    by a partial-aggregated groupby — window assignment is embarrassingly
    parallel, only the (type × hour) partials shuffle.
    """

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch["ts"].dt.floor("h")
        out = pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "window_start": w,
                # fixed-point 1e-6 units (summation-order independence, see q1)
                "value_e6": np.floor(batch["value"].to_numpy() * 1e6 + 0.5).astype("int64"),
            }
        )
        return out.groupby(["event_type", "window_start"], as_index=False).agg(
            n=("value_e6", "size"), value_e6=("value_e6", "sum")
        )

    out = (
        rd.read_parquet(_pq(sf_dir, "events"), columns=["ts", "event_type", "value"])
        .map_batches(assign, batch_format="pandas")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("n", alias_name="n_events"), Sum("value_e6", alias_name="value_e6"))
        .to_pandas()
    )
    out["value_sum"] = ((out.pop("value_e6").to_numpy() + 5000) // 10000) / 100.0
    return out[["event_type", "window_start", "n_events", "value_sum"]].sort_values(
        ["event_type", "window_start"]
    ).reset_index(drop=True)


EVENTS_HOURLY_SQL = """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       count(*) AS n_events,
       ((sum(CAST(round(value * 1000000) AS BIGINT)) + 5000) // 10000) / 100.0 AS value_sum
FROM events
GROUP BY event_type, date_trunc('hour', ts)
ORDER BY event_type, window_start
"""


# ---------------------------------------------------------------------------
# Sessionization (gap-based) — map_groups over per-user time-sorted events
# ---------------------------------------------------------------------------


def events_sessions(
    sf_dir: str, gap_minutes: int = 30, n_pkeys: int = 64
) -> pd.DataFrame:
    """Session count + max session length per user (30-min inactivity gap).

    Per-user windowing on a BOUNDED shard key: ``groupby(user_id & 63)``
    co-locates each user's events, and inside the shard ONE sort +
    vectorized boundary diff + two pandas groupbys label and size every
    user's sessions at once — never one Ray UDF call per distinct user
    (the CLAUDE.md measured scale-killer). SQL oracle uses the classic
    lag/cumsum session id.
    """
    gap = pd.Timedelta(minutes=gap_minutes)

    def pkey(b: pd.DataFrame) -> pd.DataFrame:
        b["pkey"] = (b["user_id"].to_numpy() & (n_pkeys - 1)).astype("int32")
        return b

    def sess_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        u = g["user_id"].to_numpy()
        new = np.ones(len(g), dtype=bool)
        new[1:] = (u[1:] != u[:-1]) | (g["ts"].diff().to_numpy()[1:] > gap)
        sid = np.cumsum(new)  # session ids, unique across users in the shard
        sized = pd.DataFrame({"user_id": u, "sid": sid}).groupby(
            ["user_id", "sid"], as_index=False, sort=False
        ).agg(n=("sid", "size"))
        out = sized.groupby("user_id", as_index=False).agg(
            n_sessions=("sid", "size"), max_session_events=("n", "max")
        )
        return out.astype({"n_sessions": "int64", "max_session_events": "int64"})

    out = (
        rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])
        .map_batches(pkey, batch_format="pandas")
        .groupby("pkey")
        .map_groups(sess_shard, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True)


EVENTS_SESSIONS_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sessions AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
), sized AS (
  SELECT user_id, session_id, count(*) AS n FROM sessions GROUP BY user_id, session_id
)
SELECT user_id, count(*) AS n_sessions, max(n) AS max_session_events
FROM sized GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Window function: per-customer running total (sort within group)
# ---------------------------------------------------------------------------


def orders_running_total(sf_dir: str, n_pkeys: int = 64) -> pd.DataFrame:
    """Running order-value total per customer in order-date order.

    ``groupby(custkey & 63)`` co-locates each customer's orders on a
    BOUNDED shard key; inside the shard ONE sort + a per-customer
    ``groupby(...).cumsum()`` (vectorized across all customers) is the
    window — never one Ray UDF call per distinct customer. Ties broken
    by orderkey. Fixed-point cents keep the cumsum bit-identical to the
    SQL window function.
    """

    def pkey(b: pd.DataFrame) -> pd.DataFrame:
        b["pkey"] = (b["o_custkey"].to_numpy() & (n_pkeys - 1)).astype("int32")
        return b

    def running_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort")
        cents = np.floor(g["o_totalprice"].to_numpy() * 10_000.0 + 0.5).astype("int64")
        run = pd.Series(cents).groupby(g["o_custkey"].to_numpy(), sort=False).cumsum()
        out = g[["o_custkey", "o_orderkey"]].copy()
        out["running_total"] = ((run.to_numpy() + 50) // 100).astype("int64") / 100.0
        return out

    out = (
        rd.read_parquet(
            _pq(sf_dir, "orders"),
            columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
        )
        .map_batches(pkey, batch_format="pandas")
        .groupby("pkey")
        .map_groups(running_shard, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["o_custkey", "o_orderkey"]).reset_index(drop=True)


ORDERS_RUNNING_TOTAL_SQL = """
SELECT o_custkey, o_orderkey,
       ((sum(CAST(round(o_totalprice * 10000) AS BIGINT))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING) + 50) // 100) / 100.0 AS running_total
FROM orders
ORDER BY o_custkey, o_orderkey
"""


# ---------------------------------------------------------------------------
# As-of join: latest order at-or-before each event (per user = custkey)
# ---------------------------------------------------------------------------


ASOF_BROADCAST_LIMIT = 2_000_000  # orders rows; above this, co-partition


def events_asof_orders(sf_dir: str, *, force_partitioned: bool = False) -> pd.DataFrame:
    """For each event, the most recent order of that user at-or-before the
    event time (as-of backward join on (user, ts)).

    Two paths behind a SIZE GATE (orders is a fact table, not a dimension —
    an unconditional broadcast is a driver OOM at the target scale):

    - small orders side (≤ ASOF_BROADCAST_LIMIT rows): broadcast the
      per-user sorted order arrays once (``ray.put``), every event batch
      does a vectorized searchsorted — no shuffle at all.
    - large orders side: co-partition BOTH sides by hash(user) bucket (one
      schema-aligned union + groupby shuffle, the ``revenue_by_priority``
      join pattern), then a per-bucket ``pd.merge_asof(by=user)`` —
      per-task memory is O(rows / n_buckets), no driver state.

    Both paths implement the same tie semantics (latest date, then largest
    orderkey) and stay hash-identical to the SQL oracle; the partitioned
    path is forced in tests via ``force_partitioned``.
    """
    import pyarrow.parquet as _pqm

    # row count from the parquet footer — no Ray tasks for the size gate
    n_orders = _pqm.ParquetFile(_pq(sf_dir, "orders")).metadata.num_rows
    if force_partitioned or n_orders > ASOF_BROADCAST_LIMIT:
        return _events_asof_orders_partitioned(sf_dir)

    orders = pd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_custkey", "o_orderkey", "o_orderdate"]
    ).sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    per_user: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for ck, g in orders.groupby("o_custkey"):
        per_user[int(ck)] = (
            g["o_orderdate"].to_numpy("datetime64[us]").astype("int64"),
            g["o_orderkey"].to_numpy(),
        )
    ref = ray.put(per_user)

    def asof(batch: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(ref)
        ev_ts = batch["ts"].to_numpy("datetime64[us]").astype("int64")
        users = batch["user_id"].to_numpy()
        okeys = np.full(len(batch), -1, dtype="int64")
        for u in np.unique(users):
            rows = lookup.get(int(u))
            if rows is None:
                continue
            mask = users == u
            pos = np.searchsorted(rows[0], ev_ts[mask], side="right") - 1
            vals = np.where(pos >= 0, rows[1][np.maximum(pos, 0)], -1)
            okeys[mask] = vals
        out = pd.DataFrame(
            {"event_id": batch["event_id"], "last_orderkey": okeys}
        )
        return out

    out = (
        rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "ts", "user_id"])
        .map_batches(asof, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("event_id").reset_index(drop=True)


def _user_bucket_cols(users: np.ndarray, side: int | None, n_buckets: int) -> dict:
    """Shared co-partitioning tag for fact joins keyed by user id:
    (bucket[, side], user) columns. ``side=None`` omits the tag for
    single-table (self-join) uses. Used by the partitioned as-of join here
    and the range join in relational_ext."""
    out = {
        "bucket": pa.array(
            (users.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int32)
        ),
    }
    if side is not None:
        out["side"] = pa.array(np.full(len(users), side, dtype=np.int8))
    out["user"] = pa.array(users, pa.int64())
    return out


def _events_asof_orders_partitioned(sf_dir: str, n_buckets: int = 32) -> pd.DataFrame:
    """Co-partitioned as-of join: hash(user) buckets both sides into ONE
    groupby shuffle; each bucket runs a vectorized ``merge_asof`` keyed by
    user (right side sorted (date, orderkey) so the backward match picks
    the latest date / largest orderkey — identical to the broadcast path)."""

    def ev_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                **_user_bucket_cols(t["user_id"].to_numpy(), 0, n_buckets),
                "ts_us": ts_us(t["ts"]),
                "event_id": t["event_id"],
                "o_orderkey": pa.array(np.zeros(t.num_rows, np.int64)),
            }
        )

    def ord_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                **_user_bucket_cols(t["o_custkey"].to_numpy(), 1, n_buckets),
                "ts_us": ts_us(t["o_orderdate"]),
                "event_id": pa.array(np.zeros(t.num_rows, np.int64)),
                "o_orderkey": t["o_orderkey"],
            }
        )

    ev = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "ts", "user_id"]
    ).map_batches(ev_rows, batch_format="pyarrow")
    od = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_custkey", "o_orderkey", "o_orderdate"]
    ).map_batches(ord_rows, batch_format="pyarrow")

    def asof_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ev_g = g[g["side"] == 0]
        if ev_g.empty:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "last_orderkey": pd.Series([], dtype="int64"),
                }
            )
        od_g = g[g["side"] == 1].sort_values(["ts_us", "o_orderkey"], kind="stable")
        m = pd.merge_asof(
            ev_g[["event_id", "user", "ts_us"]].sort_values("ts_us", kind="stable"),
            od_g[["user", "ts_us", "o_orderkey"]],
            on="ts_us",
            by="user",
            direction="backward",
        )
        return pd.DataFrame(
            {
                "event_id": m["event_id"].astype("int64"),
                "last_orderkey": m["o_orderkey"].fillna(-1).astype("int64"),
            }
        )

    out = (
        ev.union(od)
        .groupby("bucket")
        .map_groups(asof_bucket, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("event_id").reset_index(drop=True)


EVENTS_ASOF_ORDERS_SQL = """
SELECT e.event_id,
       coalesce(
         (SELECT o.o_orderkey FROM orders o
          WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
          ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1),
         -1) AS last_orderkey
FROM events e
ORDER BY e.event_id
"""


# ---------------------------------------------------------------------------
# Broadcast anti join: customers with no orders
# ---------------------------------------------------------------------------


def customers_without_orders(sf_dir: str) -> pd.DataFrame:
    """Anti join via broadcast key set: custkeys with no order since
    1997-06-01. The recent-order key set is shipped once (``ray.put``) and
    each customer batch filters against it — no shuffle (at scale: a Bloom
    filter of the key set, same shape). The date predicate is pushed into
    the orders read."""
    import pyarrow.compute as _pc

    cutoff = pa.scalar(pd.Timestamp("1997-06-01"), pa.timestamp("us"))
    okeys = set(
        rd.read_parquet(
            _pq(sf_dir, "orders"),
            columns=["o_custkey", "o_orderdate"],
            filter=(_pc.field("o_orderdate") >= cutoff),
        )
        .to_pandas()["o_custkey"]
    )
    ref = ray.put(okeys)

    def anti(t: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        mask = np.array([k not in keys for k in t["c_custkey"].to_pylist()], dtype=bool)
        return t.filter(pa.array(mask))

    out = (
        rd.read_parquet(_pq(sf_dir, "customer"), columns=["c_custkey", "c_name"])
        .map_batches(anti, batch_format="pyarrow")
        .to_pandas()
    )
    if out.empty:
        out = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64"),
                            "c_name": pd.Series([], dtype="object")})
    return out.sort_values("c_custkey").reset_index(drop=True)


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderdate >= TIMESTAMP '1997-06-01')
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# Distinct / set op
# ---------------------------------------------------------------------------


def distinct_langs(sf_dir: str) -> pd.DataFrame:
    """Distinct values of a column (ds.unique — a small shuffle)."""
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["lang"])
    vals = sorted(ds.unique("lang"))
    return pd.DataFrame({"lang": vals})


DISTINCT_LANGS_SQL = "SELECT DISTINCT lang FROM documents ORDER BY lang"


# ---------------------------------------------------------------------------
# Salted two-phase count (skew-safe groupby demonstration on a real column)
# ---------------------------------------------------------------------------


def doc_lang_counts_salted(sf_dir: str, n_salt: int = 16) -> pd.DataFrame:
    """Per-language doc counts via explicit salted two-phase aggregation.

    Phase 1 groups on the SALTED key (lang, hash(doc_id) % n_salt) so a
    Zipf-skewed language cannot hot-spot one reducer; phase 2 is a tiny
    groupby over ≤ |langs| × n_salt partial rows (the skew treatment the
    north rule names; stages/stats.py uses the map-side-combine variant).
    """
    from ray.data.aggregate import Count as _Count, Sum as _Sum

    def salt(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return pa.table(
            {
                "lang": t["lang"],
                "salt": pa.array((ids % n_salt).astype(np.int64)),
            }
        )

    salted = (
        rd.read_parquet(_pq(sf_dir, "documents"), columns=["doc_id", "lang"])
        .map_batches(salt, batch_format="pyarrow")
        .groupby(["lang", "salt"])
        .aggregate(_Count(alias_name="n"))
    )
    out = (
        salted.groupby("lang")
        .aggregate(_Sum("n", alias_name="n_docs"))
        .to_pandas()
    )
    return out.sort_values("lang").reset_index(drop=True)


DOC_LANG_COUNTS_SQL = """
SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Large × large partitioned hash join: lineitem ⋈ orders on orderkey
# ---------------------------------------------------------------------------


def revenue_by_priority(sf_dir: str, n_buckets: int = 32) -> pd.DataFrame:
    """Discounted lineitem revenue per order priority — both sides large, so
    this is an EXPLICIT partitioned hash join (the broadcast pattern of
    revenue_by_segment does not apply):

      add bucket = orderkey % B to both sides (tagged, schema-aligned)
      → union → groupby(bucket) (ONE co-partitioning shuffle)
      → per bucket: pandas merge + per-priority partial aggregate (combiner)
      → tiny groupby(priority) merges the ≤ B × |priorities| partials.

    orderkey is a dense synthetic key → buckets are uniform; a skewed key
    would get the salt treatment of doc_lang_counts_salted. Fixed-point
    cents keep sums exact vs the SQL oracle.
    """

    def li_rows(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        e4 = pc.cast(
            pc.round(pc.multiply(rev, pa.scalar(10_000.0)), round_mode="half_up"),
            pa.int64(),
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
                "priority": pa.nulls(t.num_rows, pa.string()),
            }
        )

    def ord_rows(t: pa.Table) -> pa.Table:
        key = t["o_orderkey"]
        return pa.table(
            {
                "key": key,
                "bucket": pc.cast(
                    pc.bit_wise_and(key, pa.scalar(n_buckets - 1, pa.int64())), pa.int32()
                ),
                "side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                "rev_e4": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "priority": t["o_orderpriority"],
            }
        )

    li = rd.read_parquet(
        _pq(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_rows, batch_format="pyarrow")
    orders = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(ord_rows, batch_format="pyarrow")

    def bucket_join(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 0][["key", "rev_e4"]]
        right = g[g["side"] == 1][["key", "priority"]]
        m = left.merge(right, on="key", how="inner")
        if m.empty:
            return pd.DataFrame(
                {"priority": pd.Series([], dtype="object"),
                 "rev_e4": pd.Series([], dtype="int64"),
                 "n_items": pd.Series([], dtype="int64")}
            )
        out = m.groupby("priority", as_index=False).agg(
            rev_e4=("rev_e4", "sum"), n_items=("rev_e4", "size")
        )
        return out

    joined = (
        li.union(orders)
        .groupby("bucket")
        .map_groups(bucket_join, batch_format="pandas")
        .groupby("priority")
        .aggregate(Sum("rev_e4", alias_name="rev_e4"), Sum("n_items", alias_name="n_items"))
        .to_pandas()
    )
    joined["revenue"] = ((joined.pop("rev_e4").to_numpy() + 50) // 100) / 100.0
    out = joined.rename(columns={"priority": "o_orderpriority"})
    return out[["o_orderpriority", "revenue", "n_items"]].sort_values(
        "o_orderpriority"
    ).reset_index(drop=True)


REVENUE_BY_PRIORITY_SQL = """
SELECT o_orderpriority,
       ((sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) + 50) // 100) / 100.0
         AS revenue,
       count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Global sort + limit
# ---------------------------------------------------------------------------


def top_events(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Top-k events by value (distributed sort → limit); ties by event_id."""

    def to_e6(t: pa.Table) -> pa.Table:
        e6 = pc.cast(
            pc.round(pc.multiply(t["value"], pa.scalar(1_000_000.0)), round_mode="half_up"),
            pa.int64(),
        )
        return pa.table({"event_id": t["event_id"], "value_e6": e6})

    out = (
        rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "value"])
        .map_batches(to_e6, batch_format="pyarrow")
        .sort(["value_e6", "event_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    out["value"] = ((out.pop("value_e6").to_numpy() + 5000) // 10000) / 100.0
    return out[["event_id", "value"]].reset_index(drop=True)


TOP_EVENTS_SQL = """
SELECT event_id,
       ((CAST(round(value * 1000000) AS BIGINT) + 5000) // 10000) / 100.0 AS value
FROM events
ORDER BY CAST(round(value * 1000000) AS BIGINT) DESC, event_id
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Min / Max / Count aggregate (integer-exact extremes)
# ---------------------------------------------------------------------------


def events_value_extremes(sf_dir: str) -> pd.DataFrame:
    """Per-event-type min/max value (exact in 1e-6 fixed point) + count."""

    def to_e6(t: pa.Table) -> pa.Table:
        e6 = pc.cast(
            pc.round(pc.multiply(t["value"], pa.scalar(1_000_000.0)), round_mode="half_up"),
            pa.int64(),
        )
        return pa.table({"event_type": t["event_type"], "value_e6": e6})

    out = (
        rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "value"])
        .map_batches(to_e6, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Min("value_e6", alias_name="min_e6"),
            Max("value_e6", alias_name="max_e6"),
            Count(alias_name="n_events"),
        )
        .to_pandas()
    )
    out["min_value"] = out.pop("min_e6") / 1e6
    out["max_value"] = out.pop("max_e6") / 1e6
    return out[["event_type", "min_value", "max_value", "n_events"]].sort_values(
        "event_type"
    ).reset_index(drop=True)


EVENTS_VALUE_EXTREMES_SQL = """
SELECT event_type,
       min(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 AS min_value,
       max(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 AS max_value,
       count(*) AS n_events
FROM events GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Bloom-prefiltered semi join: orders of users active in events
# ---------------------------------------------------------------------------


def orders_of_active_users(sf_dir: str) -> pd.DataFrame:
    """Semi join: orders whose customer appears as an events user.

    Scale shape: a Bloom filter over the distinct user ids is broadcast and
    prefilters each orders batch (no false negatives); surviving rows are
    confirmed against the exact key set (also broadcast here; at 100 TB the
    confirm step is a partitioned lookup, and the bloom has already pruned
    ~|non-members| of the traffic). Result is exact — matches the SQL
    semi-join oracle.
    """
    from data_quality_ray.functions.hashing import BloomFilter

    users = (
        rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id"])
        .unique("user_id")
    )
    users = np.asarray(sorted(users), dtype=np.int64)
    # ~10 bits/key (FP ≈ 1%) rounded up to a power of two — sized from the
    # actual key count so the filter never saturates at scale
    n_bits = 1 << max(16, int(np.ceil(np.log2(max(len(users), 1) * 10))))
    bloom = BloomFilter(n_bits=n_bits, n_hashes=5)
    bloom.add(users)
    ref = ray.put((bloom, users))  # users: sorted int64 array

    def semi(t: pa.Table) -> pa.Table:
        b, exact = ray.get(ref)
        keys = t["o_custkey"].to_numpy()
        maybe = b.contains(keys)  # bloom prefilter: no false negatives
        confirmed = maybe.copy()
        idx = np.nonzero(maybe)[0]
        # exact confirm, vectorized: searchsorted membership in the sorted key array
        if len(exact):
            pos = np.minimum(np.searchsorted(exact, keys[idx]), len(exact) - 1)
            confirmed[idx] = exact[pos] == keys[idx]
        else:
            confirmed[idx] = False
        return t.filter(pa.array(confirmed))

    out = (
        rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"])
        .map_batches(semi, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("o_orderkey").reset_index(drop=True)


ORDERS_OF_ACTIVE_USERS_SQL = """
SELECT o_orderkey, o_custkey FROM orders
WHERE o_custkey IN (SELECT DISTINCT user_id FROM events)
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# Per-group top-k: each customer's 3 largest orders
# ---------------------------------------------------------------------------


def top_orders_per_customer(sf_dir: str, k: int = 3, n_pkeys: int = 64) -> pd.DataFrame:
    """Top-k rows within every group: ``groupby(custkey & 63)`` BOUNDED
    shard → ONE in-shard sort (custkey asc, price desc, orderkey asc) +
    vectorized per-customer cumcount rank — never one Ray UDF call per
    distinct customer."""

    def pkey(b: pd.DataFrame) -> pd.DataFrame:
        b["pkey"] = (b["o_custkey"].to_numpy() & (n_pkeys - 1)).astype("int32")
        return b

    def topk_shard(g: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(g["o_totalprice"].to_numpy() * 10_000.0 + 0.5).astype("int64")
        g = g.assign(price_e4=cents).sort_values(
            ["o_custkey", "price_e4", "o_orderkey"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        g["rank"] = g.groupby("o_custkey", sort=False).cumcount().to_numpy() + 1
        g = g[g["rank"] <= k]
        g["totalprice"] = ((g.pop("price_e4").to_numpy() + 50) // 100) / 100.0
        return g[["o_custkey", "rank", "o_orderkey", "totalprice"]]

    out = (
        rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_custkey", "o_orderkey", "o_totalprice"])
        .map_batches(pkey, batch_format="pandas")
        .groupby("pkey")
        .map_groups(topk_shard, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["o_custkey", "rank"]).reset_index(drop=True)


TOP_ORDERS_PER_CUSTOMER_SQL = """
SELECT o_custkey, rank, o_orderkey, totalprice
FROM (
  SELECT o_custkey, o_orderkey,
         ((CAST(round(o_totalprice * 10000) AS BIGINT) + 50) // 100) / 100.0 AS totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY CAST(round(o_totalprice * 10000) AS BIGINT) DESC,
                                     o_orderkey) AS rank
  FROM orders
)
WHERE rank <= 3
ORDER BY o_custkey, rank
"""


# ---------------------------------------------------------------------------
# Variance / std with exact integer moments
# ---------------------------------------------------------------------------


def events_value_stats(sf_dir: str) -> pd.DataFrame:
    """Mean and population variance of value per event type.

    Both moments are integer sums in cents (sum, sum of squares — int64-safe:
    cents ≤ 5·10^4, squares ≤ 2.5·10^9, trillions of rows before overflow at
    this magnitude), so the distributed result is bit-identical to sequential
    SQL; the final division/rounding happens once, identically on both sides.
    """

    def to_cents(t: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.round(pc.multiply(t["value"], pa.scalar(100.0)), round_mode="half_up"),
            pa.int64(),
        )
        return pa.table(
            {
                "event_type": t["event_type"],
                "cents": c,
                "cents_sq": pc.multiply(c, c),
            }
        )

    out = (
        rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "value"])
        .map_batches(to_cents, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("cents", alias_name="s1"),
            Sum("cents_sq", alias_name="s2"),
            Count(alias_name="n_events"),
        )
        .to_pandas()
    )
    n = out["n_events"].to_numpy().astype(np.float64)
    s1 = out.pop("s1").to_numpy().astype(np.float64)
    s2 = out.pop("s2").to_numpy().astype(np.float64)
    out["mean_value"] = np.round(s1 / n / 100.0, 4)
    out["var_value"] = np.round((s2 / n - (s1 / n) ** 2) / 10_000.0, 4)
    return out[["event_type", "n_events", "mean_value", "var_value"]].sort_values(
        "event_type"
    ).reset_index(drop=True)


EVENTS_VALUE_STATS_SQL = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
)
SELECT event_type,
       count(*) AS n_events,
       round(sum(cents) / count(*) / 100.0, 4) AS mean_value,
       round((sum(cents * cents) / count(*)
              - (sum(cents) / count(*)) * (sum(cents) / count(*))) / 10000.0, 4)
         AS var_value
FROM c GROUP BY event_type ORDER BY event_type
"""
