"""Plan-shape proofs for the TPC-H semi/anti/correlated shape battery.

The oracle gate proves the VALUES; these tests pin the PHYSICAL
strategy — quantified subqueries must plan as hash/sort-merge
semi/anti joins on their equi keys (inequalities as residuals),
never as a cartesian or a nested-loop over the fact table. At 100 TB
a regression from LeftSemi to CartesianProduct is the difference
between a join and an outage, and it would NOT show up in the
correctness gate.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from strava_etl_public_spark.queries import EXTRA_QUERIES, QUERIES


def _plan(spark, name: str, sf_dir: str) -> str:
    # rotation moves names between the driver and extras registries
    # (Q21 promoted r9) — the plan contract follows the query either way
    fn = QUERIES.get(name) or EXTRA_QUERIES[name]
    df = fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name, required, forbidden",
    [
        # Q4: correlated EXISTS -> LeftSemi on the orderkey equi key.
        ("x_tpch_q4_order_priority", ["LeftSemi"], ["CartesianProduct"]),
        # Q21: EXISTS + NOT EXISTS on the same derived relation ->
        # one LeftSemi and one LeftAnti, both keyed.
        (
            "x_tpch_q21_waiting_supplier",
            ["LeftSemi", "LeftAnti"],
            ["CartesianProduct"],
        ),
        # Q16: NOT IN over a non-null key -> broadcast anti join.
        ("x_tpch_q16_supplier_cnt", ["LeftAnti"], ["CartesianProduct"]),
        # Q22: dormant-customer anti join; the global scalar rides a
        # 1-row broadcast (BroadcastNestedLoopJoin over 1 row is the
        # intended shape, NOT a cartesian over data).
        ("x_tpch_q22_dormant_customers", ["LeftAnti"], ["CartesianProduct"]),
    ],
)
def test_shape_battery_plans(spark, sf_dir, name, required, forbidden):
    plan = _plan(spark, name, sf_dir)
    for token in required:
        assert token in plan, f"{name}: expected {token} in plan\n{plan}"
    for token in forbidden:
        assert token not in plan, f"{name}: forbidden {token} in plan\n{plan}"


def test_q13_every_customer_lands_in_one_bucket(spark, sf_dir):
    """Conservation: the two-level aggregation partitions customers —
    sum(custdist) must equal |customer| exactly (an inner-join or
    WHERE-clause regression breaks this as soon as any customer's
    orders are all filtered out)."""
    rows = {
        r["c_count"]: r["custdist"]
        for r in EXTRA_QUERIES["x_tpch_q13_custdist"](spark, sf_dir).collect()
    }
    import duckdb

    n_cust = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/customer.parquet'"
    ).fetchone()[0]
    assert sum(rows.values()) == n_cust


def test_q13_shape_filter_in_join_condition_not_where(spark):
    """The distinction the fixture data can't exercise (every sf0.001
    customer has an unfiltered order): a customer whose EVERY order is
    filtered out must surface with c_count=0. Built on a micro fixture
    where the WHERE-clause rewrite provably loses the customer."""
    from pyspark.sql import functions as F

    c = spark.createDataFrame([(1,), (2,)], "c_custkey long")
    o = spark.createDataFrame(
        [(1, 10, "KEEP"), (2, 20, "DROP"), (2, 21, "DROP")],
        "o_custkey long, o_orderkey long, o_orderpriority string",
    )
    co = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "DROP"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    got = {r["c_custkey"]: r["c_count"] for r in co.collect()}
    assert got == {1: 1, 2: 0}


def test_join_strategy_hints_honored(spark, sf_dir):
    """Planner-control surface: per-join strategy hints must override
    the cost-based choice — BROADCAST forces a BroadcastHashJoin on a
    side AQE would otherwise shuffle, MERGE forces SortMergeJoin on a
    side small enough to broadcast, SHUFFLE_HASH forces a
    ShuffledHashJoin. At 100 TB these hints are the escape hatch when
    statistics mislead the optimizer (stale stats, exploding joins)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o.createOrReplaceTempView("t_hint_orders")
    li.createOrReplaceTempView("t_hint_lineitem")

    def plan(hint):
        return spark.sql(
            f"""
            SELECT /*+ {hint}(o) */ count(*) AS n
            FROM t_hint_lineitem l JOIN t_hint_orders o
              ON l.l_orderkey = o.o_orderkey
            """
        )._jdf.queryExecution().executedPlan().toString()

    assert "BroadcastHashJoin" in plan("BROADCAST")
    merge_plan = plan("MERGE")
    assert "SortMergeJoin" in merge_plan and "BroadcastHashJoin" not in merge_plan
    sh_plan = plan("SHUFFLE_HASH")
    assert "ShuffledHashJoin" in sh_plan and "BroadcastHashJoin" not in sh_plan


def test_scan_prunes_columns_and_pushes_filters(spark, sf_dir):
    """The brief's literal contract: a 2-column projection must reach
    the parquet scan as a 2-column ReadSchema (a scan reading all 11
    lineitem columns for it is wrong at any scale), and a comparison
    filter must appear in PushedFilters so row groups can be skipped
    on statistics."""
    df = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_quantity") < 5)
        .select("l_orderkey", "l_quantity")
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"l_orderkey", "l_quantity"}, cols
    assert re.search(r"PushedFilters: \[.*LessThan\(l_quantity,5\.0\)", plan), plan
