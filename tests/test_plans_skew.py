"""Physical-plan assertions (the plan IS the product at 100 TB) and
skew-mitigation correctness."""

import pytest
from pyspark.sql import functions as F

from lineage_store_database_management_system_spark.operators import skew
from lineage_store_database_management_system_spark.plans.explain import (
    explain_str,
    has_pushed_filters,
    scan_read_schema,
)
from lineage_store_database_management_system_spark.sources.readers import load_star


@pytest.fixture(scope="module")
def star(spark, sf_dir):
    return load_star(spark, sf_dir)


def test_star_join_uses_broadcast(spark, sf_dir):
    from lineage_store_database_management_system_spark import workloads

    df = workloads.QUERIES["ext_q5_region_revenue"](spark, sf_dir)
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan
    # the fact table must not be exchanged before the joins: no
    # shuffle of lineitem rows, only the final aggregation exchange
    assert "SortMergeJoin" not in plan


def test_topk_compiles_to_take_ordered(spark, sf_dir):
    from lineage_store_database_management_system_spark import workloads

    df = workloads.QUERIES["ext_q3_shipping_priority"](spark, sf_dir)
    assert "TakeOrderedAndProject" in explain_str(df)


def test_projection_prunes_scan_columns(star):
    df = star["lineitem"].select("l_orderkey", "l_quantity")
    schemas = scan_read_schema(df)
    assert schemas and all("l_extendedprice" not in s for s in schemas)


def test_predicate_pushdown_on_fact_scan(star):
    df = star["orders"].where(F.col("o_orderkey") == 7).select("o_totalprice")
    assert has_pushed_filters(df, "o_orderkey")


def test_salted_aggregate_matches_plain(star):
    ev = star["events"]
    plain = {
        r["user_id"]: (r["n"], round(r["total"], 6))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    salted = {
        r["user_id"]: (r["n"], round(r["total"], 6))
        for r in skew.salted_aggregate(
            ev.select("user_id", "value"),
            ["user_id"],
            {"n": ("*", "count"), "total": ("value", "sum")},
        ).collect()
    }
    assert salted == plain


def test_salted_broadcast_join_matches_plain(spark, star):
    ev = star["events"].select("user_id", "event_id", "value")
    dim = spark.createDataFrame(
        [(i, f"grp{i % 3}") for i in range(150)], "user_id long, grp string"
    )
    plain = ev.join(dim, "user_id").groupBy("grp").count().collect()
    salted = (
        skew.salted_broadcast_left_join(ev, dim, on="user_id")
        .groupBy("grp")
        .count()
        .collect()
    )
    assert sorted((r["grp"], r["count"]) for r in plain) == sorted(
        (r["grp"], r["count"]) for r in salted
    )
    # and the salted join is really broadcast — no shuffle of the left
    plan = explain_str(skew.salted_broadcast_left_join(ev, dim, on="user_id"))
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_bucketed_join_no_exchange(spark, star, tmp_path):
    """Two tables co-bucketed on the join key sort-merge-join with no
    Exchange on either side — the pay-the-shuffle-once-at-write-time
    layout for repeated big-big joins at 100 TB."""
    from lineage_store_database_management_system_spark.sources import write_bucketed

    ords = star["orders"].select("o_orderkey", "o_totalprice")
    li = star["lineitem"].select("l_orderkey", "l_extendedprice")
    write_bucketed(ords, "b_orders", ["o_orderkey"], 8, path=str(tmp_path / "b_orders"))
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 8, path=str(tmp_path / "b_lineitem"))
    joined = (
        spark.table("b_orders")
        .hint("merge")
        .join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderkey")
        .agg(F.sum("l_extendedprice").alias("s"))
    )
    plan = explain_str(joined)
    assert "SortMergeJoin" in plan
    # bucketing makes BOTH join inputs exchange-free; the groupBy on
    # the bucket key reuses the same distribution, so the whole plan
    # has no shuffle at all
    assert "Exchange" not in plan
    # sanity: result matches the plain (shuffling) join
    n_plain = (
        ords.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey")
        .count()
        .count()
    )
    assert joined.count() == n_plain
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_q13_outer_join_preserved(spark, sf_dir):
    """Q13's join-side filter must NOT convert the left join to inner:
    zero-order customers stay, so the distribution includes c_count=0
    and every customer is counted exactly once."""
    from lineage_store_database_management_system_spark import workloads

    df = workloads.QUERIES["ext_q13_customer_distribution"](spark, sf_dir)
    rows = {r["c_count"]: r["custdist"] for r in df.collect()}
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    ords = spark.read.parquet(f"{sf_dir}/orders.parquet").where("o_orderstatus <> 'F'")
    assert sum(rows.values()) == cust.count()
    n_zero = cust.join(
        ords, cust.c_custkey == ords.o_custkey, "left_anti"
    ).count()
    assert rows.get(0, 0) == n_zero  # zero-order customers survive the join


def test_q22_uses_anti_join_and_broadcast_scalar(spark, sf_dir):
    from lineage_store_database_management_system_spark import workloads

    df = workloads.QUERIES["ext_q22_idle_customers"](spark, sf_dir)
    plan = explain_str(df)
    assert "LeftAnti" in plan
    # the scalar avg joins as a broadcast, never a shuffle of customer
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_q21_decorrelates_to_single_extra_agg(spark, sf_dir):
    """The EXISTS/NOT-EXISTS pair is decorrelated into one per-order
    aggregate: lineitem is scanned exactly twice (probe + per-order
    counts), not three+ times as naive self-joins would."""
    from lineage_store_database_management_system_spark import workloads

    df = workloads.QUERIES["ext_q21_blocking_supplier"](spark, sf_dir)
    plan = explain_str(df)
    n_li_scans = plan.count("lineitem.parquet")
    assert n_li_scans <= 2, plan
    assert "TakeOrderedAndProject" in plan
