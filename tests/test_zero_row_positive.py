"""Positive-case fixtures for every query whose driver stamp was earned
on 0 = 0 rows (the round-8 verdict's vacuous-stamp class, extended past
the two dq detectors it named): a hand-built mini-warehouse where each
query's predicate structure actually FIRES, with exact expected rows and
a cross-engine oracle check on the same fixture. geo_nearest_climbs is
covered separately: its round-9 fix moved the reference point inside the
fixture's coordinate range (tests below pin the non-empty contract)."""

from __future__ import annotations

import datetime as dt
import os
import tempfile

import duckdb

from parquet_exporter_spark.registry import REGISTRY, _ensure_loaded
from tests.harness import canonical_rows

_ensure_loaded()

_D = dt.datetime(2024, 1, 5)


def _warehouse(spark):
    """One crafted star schema that makes every covered query fire."""
    d = tempfile.mkdtemp(prefix="zrow_wh_")

    def w(name, rows, schema):
        spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
            os.path.join(d, f"{name}.parquet")
        )

    w("region", [(0, "REGION_1"), (1, "REGION_2")], "r_regionkey int, r_name string")
    w(
        "nation",
        [
            (1, "NATION_1", 0),
            (5, "NATION_5", 1),
            (9, "NATION_9", 1),
            (13, "NATION_13", 0),
            (17, "NATION_17", 0),
        ],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    w(
        "customer",
        [
            # no orders + high balance: the join_anti row AND the q22 winner
            (999, "Customer#999", 1, 5000.0, "BUILDING"),
            (100, "Customer#100", 1, 100.0, "AUTOMOBILE"),
            (101, "Customer#101", 5, 50.0, "AUTOMOBILE"),
        ],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )
    w(
        "supplier",
        [
            (201, "Supplier#201", 5, 1000.0),  # REGION_2 via NATION_5
            (202, "Supplier#202", 9, 2000.0),  # REGION_2 via NATION_9
        ],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    w(
        "part",
        [
            (7, "part7", "BrandA", "LARGE", 10, 99.0),  # q2 target
            (8, "part8", "BrandB", "PROMO", 20, 49.0),  # q8 target
        ],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    # orders: nine cheap + one expensive (sql_scalar_subquery fires on
    # the 1000.0 one: avg = 109, threshold 218); all owned by customers
    # WITH orders so customer 999 stays order-free
    orders = [(k, 100 if k % 2 else 101, "O", 10.0, _D, "1-URGENT") for k in range(1, 10)]
    orders.append((10, 100, "O", 1000.0, _D, "1-URGENT"))
    w(
        "orders",
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    li_schema = (
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp"
    )
    w(
        "lineitem",
        [
            # q2: part 7 (LARGE, size 10) — supplier 201 unit cost 5.0
            # beats supplier 202's 7.0; both REGION_2-eligible
            (1, 7, 201, 1, 2.0, 10.0, 0.0, 0.0, "N", "O", _D),
            (1, 7, 202, 2, 1.0, 7.0, 0.0, 0.0, "N", "O", _D),
            # q8: PROMO part 8 sold into REGION_1 (order 1 -> cust 100 ->
            # NATION_1 -> REGION_1); NATION_5 supplier volume 100 vs
            # NATION_9 volume 50 -> 2024 market share 0.666667
            (1, 8, 201, 3, 1.0, 100.0, 0.0, 0.0, "N", "O", _D),
            (1, 8, 202, 4, 1.0, 100.0, 0.5, 0.0, "N", "O", _D),
        ],
        li_schema,
    )
    return d


_CACHE: dict[str, str] = {}


def _wh(spark):
    if "d" not in _CACHE:
        _CACHE["d"] = _warehouse(spark)
    return _CACHE["d"]


def _oracle_rows(data_dir, name):
    con = duckdb.connect()
    try:
        for t in os.listdir(data_dir):
            if t.endswith(".parquet"):
                con.sql(
                    f"CREATE VIEW {t[:-8]} AS SELECT * FROM "
                    f"'{os.path.join(data_dir, t)}/*.parquet'"
                )
        return con.sql(REGISTRY[name].oracle).df()
    finally:
        con.close()


def _run_both(spark, name, d):
    sdf = REGISTRY[name].fn(spark, d).toPandas()
    assert canonical_rows(sdf) == canonical_rows(_oracle_rows(d, name)), name
    return sdf


def test_join_anti_fires_on_orderless_customer(spark):
    d = _wh(spark)
    sdf = _run_both(spark, "join_anti", d)
    assert [tuple(r) for r in sdf.itertuples(index=False)] == [
        (999, "Customer#999")
    ]


def test_scalar_subquery_fires_on_outlier_order(spark):
    d = _wh(spark)
    sdf = _run_both(spark, "sql_scalar_subquery", d)
    assert [tuple(r) for r in sdf.itertuples(index=False)] == [(10, 1000.0)]


def test_q22_fires_on_rich_orderless_customer(spark):
    d = _wh(spark)
    sdf = _run_both(spark, "q22_global_sales_opportunity", d)
    assert [tuple(r) for r in sdf.itertuples(index=False)] == [(1, 1, 5000.0)]


def test_q2_picks_min_cost_supplier(spark):
    d = _wh(spark)
    sdf = _run_both(spark, "q2_min_cost_supplier", d)
    # supplier 201 (NATION_5) wins part 7 at unit cost 5.0; 202's 7.0 is cut
    assert [tuple(r) for r in sdf.itertuples(index=False)] == [
        (1000.0, "Supplier#201", "NATION_5", 7, "LARGE", 5.0)
    ]


def test_q8_market_share_strictly_between_zero_and_one(spark):
    d = _wh(spark)
    sdf = _run_both(spark, "q8_market_share", d)
    rows = [tuple(r) for r in sdf.itertuples(index=False)]
    assert rows == [(2024, 0.666667)]  # 100 / (100 + 50), NATION_5's cut


def test_dedup_embedding_cosine_fires_within_label_block_only(spark):
    """One same-label near-parallel pair fires; an orthogonal same-label
    pair does not; a PARALLEL pair split across labels must not fire —
    the label blocking is load-bearing, not decorative."""
    d = tempfile.mkdtemp(prefix="zrow_emb_")
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0, 0.0], 0),  # cos(0,1) ~ 0.9939 -> fires
        (2, [0.0, 1.0, 0.0, 0.0], 1),  # cos(2,3) = 0 -> silent
        (3, [1.0, 0.0, 0.0, 0.0], 1),  # parallel to 0 but label 1 -> blocked
    ]
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
    sdf = _run_both(spark, "dedup_embedding_cosine", d)
    rows = [tuple(r) for r in sdf.itertuples(index=False)]
    assert len(rows) == 1
    id_a, id_b, cos_sim = rows[0]
    assert (id_a, id_b) == (0, 1) and cos_sim > 0.99


def test_geo_nearest_climbs_returns_ranked_rows(spark, sf_dir):
    """The round-9 contract: the reference point sits INSIDE the climbs
    fixture's coordinate cloud, so the bbox admits rows and the
    haversine ranking executes (the pre-round-9 point's bbox matched
    zero rows, making every prior stamp vacuous)."""
    from parquet_exporter_spark.queries.reference_parity import geo_nearest_climbs

    out = geo_nearest_climbs(spark, sf_dir).collect()
    assert len(out) == 9
    dists = [r.dist_km for r in out]
    assert dists == sorted(dists) and dists[0] >= 0


def _events_dir(spark, rows, prefix):
    d = tempfile.mkdtemp(prefix=prefix)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    return d


def test_enum_new_values_fires_on_late_appearing_type(spark):
    """The enum-drift alarm must FIRE: 'beta_feature' appears only after
    the time midpoint (3 rows), so it is reported with its count, while
    'click' (both halves) and 'legacy' (old half only — a RETIRED value,
    the detector's explicit non-goal) stay silent. Its sf0.01 driver
    stamp is 0 = 0 (the testdata's enum is stable by design), so this
    fixture is the proof the detector works."""
    rows = []
    base = dt.datetime(2024, 3, 1)
    for i in range(10):  # clock: 10 days, midpoint day 5ish
        rows.append((i, base + dt.timedelta(days=i), 1, "click", 1.0, "{}"))
    rows.append((100, base + dt.timedelta(days=1), 2, "legacy", 1.0, "{}"))
    for k, off in enumerate((7, 8, 9)):
        rows.append(
            (200 + k, base + dt.timedelta(days=off, hours=1), 3, "beta_feature", 1.0, "{}")
        )
    d = _events_dir(spark, rows, "enumnew_")
    sdf = _run_both(spark, "dq_enum_new_values", d)
    assert [tuple(r) for r in sdf.itertuples(index=False)] == [("beta_feature", 3)]


def test_monthly_churn_fires_on_a_user_who_leaves(spark):
    """Churn must FIRE: user 2 is active in January only (churns), users
    1 and 3 stay through February; March is the verdict-less last month
    and must be excluded. The sf0.01 testdata spans a single month, so
    the driver stamp is 0 = 0 — this fixture proves the month-shifted
    self-join actually counts leavers."""
    months = {1: dt.datetime(2024, 1, 10), 2: dt.datetime(2024, 2, 10), 3: dt.datetime(2024, 3, 10)}
    rows = []
    eid = 0
    for user, active_in in ((1, (1, 2, 3)), (2, (1,)), (3, (1, 2, 3))):
        for m in active_in:
            rows.append((eid, months[m], user, "click", 1.0, "{}"))
            eid += 1
    d = _events_dir(spark, rows, "churn_")
    sdf = _run_both(spark, "analytics_monthly_churn", d)
    got = sorted(tuple(r) for r in sdf.itertuples(index=False))
    assert got == [
        (dt.date(2024, 1, 1), 3, 1, 0.333333),
        (dt.date(2024, 2, 1), 2, 0, 0.0),
    ]
