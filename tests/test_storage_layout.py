"""Layout-driven plan guarantees: partition pruning reaches the scan, a
bucketed fact-fact join runs with zero exchanges, ORC round-trips. These
are the 100 TB moves the operator plans assume the lake can make."""

from __future__ import annotations

from pyspark.sql import functions as F

from metas_judiciarias_etl_spark.sources.layout import (
    read_orc,
    write_bucketed,
    write_orc,
    write_partitioned,
)
from metas_judiciarias_etl_spark.sources.parquet import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partition_pruning_reaches_scan(spark, sf_small, tmp_path):
    ev = load_table(spark, sf_small, "events")
    path = str(tmp_path / "events_part")
    write_partitioned(ev, path, ["event_type"])
    back = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = _plan(back)
    assert "PartitionFilters" in plan and "event_type" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], "partition predicate did not become a PartitionFilter"
    expected = ev.filter(F.col("event_type") == "click").count()
    assert back.count() == expected


def test_bucketed_join_eliminates_shuffle(spark, sf_small):
    orders = load_table(spark, sf_small, "orders")
    li = load_table(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(orders, "t_orders_b", "o_orderkey", 4, sort_col="o_orderkey")
    write_bucketed(li, "t_lineitem_b", "l_orderkey", 4, sort_col="l_orderkey")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the join to resolve as SMJ so the assertion targets the
        # exchange elimination, not a broadcast fallback
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.table("t_orders_b")
        b = spark.table("t_lineitem_b")
        joined = a.join(b, a.o_orderkey == b.l_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = _plan(joined)
        # bucket-aligned sides: the JOIN itself introduces no exchange —
        # the only exchange in the whole plan is the final tiny groupBy
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_part, (
            "bucketed join still shuffles:\n" + plan[:3000]
        )
        # cross-check the result against the unbucketed plan
        expected = (
            orders.join(li, orders.o_orderkey == li.l_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, expected)
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_orc_round_trip(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents")
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path)
    back = read_orc(spark, path)
    assert back.count() == docs.count()
    h = lambda df: df.agg(  # noqa: E731
        F.sum(F.crc32(F.concat_ws("|", "doc_id", "source"))).alias("h")
    ).collect()[0]["h"]
    assert h(back) == h(docs)
    # pushdown works on ORC the same as parquet
    plan = _plan(back.filter(F.col("doc_id") < 10).select("doc_id"))
    assert "PushedFilters" in plan or "doc_id" in plan


def test_parquet_merge_schema_evolution(spark, sf_small, tmp_path):
    """Schema evolution on the lake: two parquet generations with drifted
    schemas read as one table under mergeSchema — the parquet counterpart
    of the metas CSV unionByName (old rows take NULL for new columns)."""
    base = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a")], "id long, name string")
    v2 = spark.createDataFrame([(2, "b", 9.5)], "id long, name string, score double")
    v1.write.parquet(base + "/gen=1")
    v2.write.parquet(base + "/gen=2")
    merged = spark.read.option("mergeSchema", "true").parquet(base)
    rows = {r["id"]: (r["name"], r["score"]) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}
    assert set(merged.columns) >= {"id", "name", "score"}
