"""Sink-side scale features: partitioned layouts that prune, bucketed
layouts that kill the join shuffle, and single-file parity CSV.

These are plan/layout tests (sinks have no DuckDB-oracle form): they assert
the physical properties that make the layouts worth writing at 100 TB —
a partition filter that skips files, and a bucketed join with zero Exchange.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metas_judiciarias_etl_spark.sources.parquet import load_table


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_partitioned_write_prunes(spark, sf_small, tmp_path):
    """Hive-style partitioning by a filter column → reads touch only the
    matching directory (partition pruning at planning time)."""
    out = str(tmp_path / "li_part")
    li = load_table(spark, sf_small, "lineitem")
    li.write.partitionBy("l_returnflag").mode("overwrite").parquet(out)

    back = spark.read.parquet(out)
    picked = back.filter(F.col("l_returnflag") == "A")
    plan = _formatted_plan(picked)
    assert "PartitionFilters" in plan and "l_returnflag" in plan.split(
        "PartitionFilters"
    )[1].split("\n")[0]

    expected = li.filter(F.col("l_returnflag") == "A").count()
    assert picked.count() == expected
    # (DataFrame.inputFiles() reports the relation pre-pruning, so the
    # physical proof is the PartitionFilters clause asserted above.)


def test_bucketed_join_has_no_exchange(spark, sf_small, tmp_path):
    """Bucketing both fact tables by the join key pre-shuffles them once at
    write time; the join then runs with ZERO Exchange — the layout move that
    makes repeated 100 TB fact-fact joins affordable."""
    orders = load_table(spark, sf_small, "orders")
    li = load_table(spark, sf_small, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "b_orders"))
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "b_lineitem"))
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # Force the shuffle-join path so the assertion is about bucketing,
        # not about one side being broadcast-small.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (
            spark.table("b_lineitem")
            .join(
                spark.table("b_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = _formatted_plan(joined.filter(F.lit(True)))
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_section, join_section

        unbucketed = (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, unbucketed.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_partitioned_write_roundtrip_schema(spark, sf_small, tmp_path):
    """Partition column comes back (as the directory-derived column) and row
    multiset is preserved."""
    out = str(tmp_path / "orders_part")
    orders = load_table(spark, sf_small, "orders")
    orders.write.partitionBy("o_orderstatus").mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert set(back.columns) == set(orders.columns)
    assert back.count() == orders.count()
    a = orders.groupBy("o_orderstatus").count()
    b = back.groupBy("o_orderstatus").count()
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


@pytest.mark.parametrize("status", ["O"])
def test_dynamic_partition_overwrite(spark, sf_small, tmp_path, status):
    """Dynamic partition overwrite only replaces the partitions present in
    the incoming batch — the idempotent-backfill write mode at scale."""
    out = str(tmp_path / "dyn")
    orders = load_table(spark, sf_small, "orders")
    orders.write.partitionBy("o_orderstatus").mode("overwrite").parquet(out)
    before_other = (
        spark.read.parquet(out).filter(F.col("o_orderstatus") != status).count()
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        patch = (
            orders.filter(F.col("o_orderstatus") == status)
            .withColumn("o_totalprice", F.lit(0.0))
        )
        patch.write.partitionBy("o_orderstatus").mode("overwrite").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    after = spark.read.parquet(out)
    assert after.filter(F.col("o_orderstatus") != status).count() == before_other
    patched = after.filter(F.col("o_orderstatus") == status)
    assert patched.count() > 0
    assert patched.select(F.max("o_totalprice")).first()[0] == 0.0


def test_quote_nonnumeric_sink_parity(spark, tmp_path):
    """P:121-125 staging format: QUOTE_NONNUMERIC over a fully-stringified
    frame quotes every field — byte parity with csv.QUOTE_NONNUMERIC as
    pandas writes it for all-string data."""
    import csv as _csv
    import glob
    import io
    import os

    import pandas as pd

    from metas_judiciarias_etl_spark.metas.pipeline import write_csv

    df = spark.createDataFrame(
        [("TJSP", "12.5", "NA"), ("TRT3", "7.0", "1.0")],
        "sigla_tribunal string, meta1 string, meta2a string",
    )
    out = str(tmp_path / "quoted.csv")
    write_csv(df, out, single_file=True, quote_nonnumeric=True)
    part = glob.glob(os.path.join(out, "*.csv"))[0]
    with open(part) as fh:
        got = fh.read()

    buf = io.StringIO()
    pd.DataFrame(
        {"sigla_tribunal": ["TJSP", "TRT3"], "meta1": ["12.5", "7.0"],
         "meta2a": ["NA", "1.0"]}
    ).to_csv(buf, sep=";", index=False, quoting=_csv.QUOTE_NONNUMERIC)
    expected = buf.getvalue()
    assert sorted(got.strip().splitlines()) == sorted(expected.strip().splitlines())


def test_quote_nonnumeric_typed_exact_parity(spark, tmp_path):
    """P:121-125 EXACT semantics on a TYPED drifted frame: numeric cells
    unquoted with str() float formatting (sci-notation, shortest repr),
    strings quoted with internal quotes doubled, NULL -> '""'. Byte-identical
    to pandas.to_csv(quoting=csv.QUOTE_NONNUMERIC)."""
    import csv as _csv
    import glob
    import io
    import os

    import numpy as np
    import pandas as pd

    from metas_judiciarias_etl_spark.metas.pipeline import write_csv

    pdf = pd.DataFrame(
        {
            "sigla_tribunal": ["TJ;SP", 'has"quote', None, "TRF1"],
            "ramo_justica": ["Justiça Estadual", "Justiça do Trabalho", "X", "Justiça Federal"],
            "julgados_2025": [12.5, np.nan, 1e20, 0.1 + 0.2],
            "casos_novos_2025": [7.0, -0.0, 1234567.891, 1e-07],
            # int64 column: Arrow hands the worker np.int64 scalars, which
            # must print as '5' not '5.0' (ADVICE r5: isinstance(np.int64,
            # int) is False). 2**53+1 would round if routed through float.
            "processos_2025": np.array(
                [3, -17, 0, 9007199254740993], dtype=np.int64
            ),
        }
    )
    df = spark.createDataFrame(
        pdf,
        "sigla_tribunal string, ramo_justica string, "
        "julgados_2025 double, casos_novos_2025 double, "
        "processos_2025 long",
    )
    out = str(tmp_path / "typed_quoted.csv")
    write_csv(df, out, single_file=True, quote_nonnumeric=True)
    parts = glob.glob(os.path.join(out, "part-*"))
    assert len(parts) == 1
    with open(parts[0], encoding="utf-8") as fh:
        got = fh.read()

    buf = io.StringIO()
    pdf.to_csv(buf, sep=";", index=False, quoting=_csv.QUOTE_NONNUMERIC,
               lineterminator="\n")
    assert got == buf.getvalue()
