"""Spark 4 extensibility surfaces: Python UDTFs (registration, SQL
invocation, LATERAL join) and SQL scripting (compound statements,
variables, loops). Both are exercised against pure-relational twins so
the surface demo is CHECKED, not just smoke-run."""

from __future__ import annotations

from metas_judiciarias_etl_spark import registry
from metas_judiciarias_etl_spark.functions.udtfs import register_udtfs
from metas_judiciarias_etl_spark.sources.parquet import load_table

registry.load_all()


def test_udtf_lateral_matches_expression_chunker(spark, sf_small):
    """The UDTF chunker joined LATERAL over documents must produce
    EXACTLY the rows of the registered pure-expression chunk_documents —
    the extension surface and the zero-UDF surface agree row for row."""
    register_udtfs(spark)
    load_table(spark, sf_small, "documents").createOrReplaceTempView(
        "docs_udtf_test"
    )
    got = spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.n_tok, c.n_chunks
        FROM docs_udtf_test d, LATERAL chunk_windows(d.text) c
        """
    ).collect()
    want = registry.QUERIES["chunk_documents"](spark, sf_small).collect()
    key = lambda r: (r["doc_id"], r["chunk_idx"])  # noqa: E731
    assert sorted(map(tuple, got)) == sorted(
        (r["doc_id"], r["chunk_idx"], r["n_tok"], r["n_chunks"])
        for r in want
    ), "UDTF and expression chunker diverge"
    assert len(got) == len(want)


def test_udtf_direct_table_invocation(spark):
    """A UDTF is callable as a bare table function with literal args."""
    register_udtfs(spark)
    rows = spark.sql(
        "SELECT * FROM chunk_windows('one two three')"
    ).collect()
    assert [tuple(r) for r in rows] == [(0, 3, 1)]


def test_udtf_null_text_yields_no_rows(spark):
    """NULL text: the expression twin's F.split(NULL) explodes to zero
    rows, so the UDTF must yield nothing too (ADVICE r4 — '' would have
    counted one token and broken the same-boundary-math claim)."""
    register_udtfs(spark)
    rows = spark.sql(
        "SELECT * FROM chunk_windows(CAST(NULL AS STRING))"
    ).collect()
    assert rows == []


def test_sql_scripting_compound_matches_relational(spark, sf_small):
    """A scripted WHILE loop accumulating per-source doc counts must
    reproduce the plain GROUP BY total — the scripting surface
    (variables, loops, compound statements) runs real logic over real
    tables, checked against the declarative answer."""
    spark.conf.set("spark.sql.scripting.enabled", "true")
    load_table(spark, sf_small, "documents").createOrReplaceTempView(
        "docs_script_test"
    )
    n_sources = spark.sql(
        "SELECT count(DISTINCT source) AS n FROM docs_script_test"
    ).collect()[0]["n"]
    total = spark.sql(
        """
        BEGIN
          DECLARE remaining INT;
          DECLARE acc BIGINT = 0;
          SET remaining = (SELECT count(DISTINCT source)
                           FROM docs_script_test);
          WHILE remaining > 0 DO
            SET acc = acc + (
              SELECT count(*) FROM (
                SELECT source, row_number() OVER (ORDER BY source) AS rk
                FROM (SELECT DISTINCT source FROM docs_script_test)
              ) s JOIN docs_script_test d ON d.source = s.source
              WHERE s.rk = remaining);
            SET remaining = remaining - 1;
          END WHILE;
          SELECT acc AS total_docs;
        END
        """
    ).collect()[0]["total_docs"]
    want = spark.sql(
        "SELECT count(*) AS n FROM docs_script_test"
    ).collect()[0]["n"]
    assert total == want
    assert n_sources > 1  # the loop actually iterated
