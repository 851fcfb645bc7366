"""SQL-text surface: a SQL string must produce the same rows AND the same
physical plan shape as its DataFrame twin."""

from __future__ import annotations

from metas_judiciarias_etl_spark import registry
from metas_judiciarias_etl_spark.sql_surface import open_sql

registry.load_all()

Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                       AS sum_qty,
       round(sum(l_extendedprice), 2)                  AS sum_base_price,
       round(avg(l_discount), 6)                       AS avg_disc,
       count(*)                                        AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def test_sql_text_matches_dataframe_twin(spark, sf_small):
    sql = open_sql(spark, sf_small)
    df = sql(Q1_SQL)
    rows = {(r["l_returnflag"], r["l_linestatus"]): r["count_order"] for r in df.collect()}
    # DataFrame twin of the same aggregation
    from pyspark.sql import functions as F

    from metas_judiciarias_etl_spark.sources.parquet import load_table

    li = load_table(spark, sf_small, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    twin = {
        (r["l_returnflag"], r["l_linestatus"]): r["n"]
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert rows == twin


def test_sql_text_gets_same_plan_quality(spark, sf_small):
    sql = open_sql(spark, sf_small)
    df = sql(Q1_SQL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # partial+final agg and a pushed scan filter, same as the DataFrame path
    assert plan.count("HashAggregate") >= 2
    assert "PushedFilters" in plan and "l_shipdate" in plan


def test_observe_metrics_ride_the_job(spark, sf_small):
    """Pipeline observability the Spark-native way: df.observe() collects
    named aggregates DURING the action — no second scan, no collect() of
    data rows. The driver-side read is the documented Observation API."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from metas_judiciarias_etl_spark.sources.parquet import load_table

    li = load_table(spark, sf_small, "lineitem")
    obs = Observation("li_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).alias(
            "cents_seen"
        ),
    )
    out = observed.groupBy("l_returnflag").count()
    n_groups = out.count()  # one job drives both the query and the metrics
    got = obs.get
    assert n_groups >= 3
    assert got["rows_seen"] == li.count()
    # exact-integer metric: re-derivable independently
    expected = li.select(
        F.sum(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
    ).collect()[0][0]
    assert got["cents_seen"] == expected


def test_bench_headline_names_all_registered():
    """bench.py silently skips unknown names (fn is None -> continue) — a
    typo'd headline entry would vanish from BENCH output without failing
    anything. Pin every headline name to the registry."""
    import bench
    from metas_judiciarias_etl_spark import registry

    registry.load_all()
    missing = [n for n in bench.HEADLINE if n not in registry.QUERIES]
    assert not missing, f"headline entries not in registry: {missing}"


PIPE_SQL = """
FROM lineitem
|> WHERE l_shipdate <= TIMESTAMP '1998-09-02'
|> AGGREGATE round(sum(l_quantity), 2) AS sum_qty,
             count(*) AS count_order
   GROUP BY l_returnflag, l_linestatus
|> ORDER BY l_returnflag, l_linestatus
"""


def test_sql_pipe_syntax_matches_standard_form(spark, sf_small):
    """Spark 4's SQL pipe syntax (FROM ... |> WHERE ... |> AGGREGATE) must
    produce row-identical results to the standard SELECT form — the
    surface a user migrating incremental pipe-style queries relies on.
    Also pins that the piped WHERE still reaches the parquet scan as a
    pushed filter (pipe syntax desugars before Catalyst, so pushdown
    must survive)."""
    sql = open_sql(spark, sf_small)
    piped = sql(PIPE_SQL)
    std = sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    )
    assert [tuple(r) for r in piped.collect()] == [
        tuple(r) for r in std.collect()
    ]
    fmt = piped.sparkSession.sparkContext._jvm.PythonSQLUtils.explainString(
        piped._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in fmt and "l_shipdate" in fmt.split("PushedFilters")[1].split("]")[0]
