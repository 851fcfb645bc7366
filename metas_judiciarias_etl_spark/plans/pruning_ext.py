"""Scan-pruning primitives — the two metadata structures a 100 TB engine
uses to NOT read data: Bloom-filter runtime join pruning (Spark's
bloom-filter join pushdown / DPP analog, built here from explicit integer
bit algebra so the DuckDB oracle replays it exactly) and min/max zone maps
(the parquet row-group / Delta file-skipping shape).

Determinism: every hash is 2-universal integer arithmetic with all
intermediate products bounded below 2^47 (no silent int64 wrap on either
engine); bit sets use 32-bit words so no shift ever touches the sign bit;
the only floats are final ratio divisions over identical integers.

Scale notes (100 TB):

* bloom_semi_join_prune: the build side never ships row-for-row to the
  probe — it compresses to a fixed 64 Kbit / 2048-word bit table that
  broadcasts at ANY build cardinality (the filter degrades via false-
  positive rate, surfaced as a measured column, never via memory). This is
  exactly the shape of Spark's own runtime bloom pushdown
  (spark.sql.optimizer.runtime.bloomFilter.enabled); registering the
  explicit form pins its semantics: zero false negatives (asserted as an
  output column), measurable selectivity.
* data_skipping_zonemap: per-file min/max metadata is O(files), not
  O(rows); the skip decision is a metadata-only scan. The registered query
  also proves the pruning SOUND (rows matching the predicate inside
  skipped buckets = 0 — an output column both engines must agree is zero).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.parquet import load_table

# --------------------------------------------------------------------------
# Bloom-filter semi-join pruning.
# --------------------------------------------------------------------------
_BLOOM_BITS = 1 << 16          # 64 Kbit filter
_BLOOM_WORD = 32               # 32-bit words: shifts never reach the sign bit
_BLOOM_HASHES = ((40503, 30011, 7), (48271, 20011, 101), (69621, 10007, 1009))
_BLOOM_PRIORITY = "1-URGENT"


def _bloom_h_sql(key: str, a: int, b: int, c: int, idiv: str = "//") -> str:
    """((key%M)*a + (key//M%M)*b + c) % M — products <= 2^16 * 2^17 < 2^47,
    exact in BIGINT on both engines (no HUGEINT promotion divergence).
    ``idiv`` is the integer-division spelling: '//' (DuckDB) / 'div'
    (Spark SQL) — the SAME generated text otherwise drives both."""
    m = _BLOOM_BITS
    return (
        f"((({key} % {m}) * {a} + (({key} {idiv} {m}) % {m}) * {b} + {c})"
        f" % {m})"
    )


def _bloom_h_col(key: str, a: int, b: int, c: int):
    return F.expr(_bloom_h_sql(key, a, b, c, idiv="div"))


def _bloom_oracle() -> str:
    hs = [_bloom_h_sql("o_orderkey", *t) for t in _BLOOM_HASHES]
    probe_hs = [_bloom_h_sql("l_orderkey", *t) for t in _BLOOM_HASHES]
    w = _BLOOM_WORD
    tests = " AND ".join(
        f"coalesce(bw{i}.word_bits, 0) & (CAST(1 AS BIGINT) << CAST(h{i} % {w} AS INTEGER)) <> 0"
        for i in range(len(_BLOOM_HASHES))
    )
    joins = "\n        ".join(
        f"LEFT JOIN bloom bw{i} ON bw{i}.word_id = h{i} // {w}"
        for i in range(len(_BLOOM_HASHES))
    )
    hcols = ", ".join(f"{h} AS h{i}" for i, h in enumerate(probe_hs))
    return f"""
    WITH build AS (
        SELECT DISTINCT o_orderkey FROM orders
        WHERE o_orderpriority = '{_BLOOM_PRIORITY}'
    ), bits AS (
        SELECT unnest([{', '.join(hs)}]) AS h FROM build
    ), bloom AS (
        SELECT h // {w} AS word_id,
               bit_or(CAST(1 AS BIGINT) << CAST(h % {w} AS INTEGER)) AS word_bits
        FROM bits GROUP BY 1
    ), probe AS (
        SELECT l_orderkey, {hcols} FROM lineitem
    ), tested AS (
        SELECT p.l_orderkey,
               CAST(({tests}) AS INT) AS pass_bloom,
               CAST(b.o_orderkey IS NOT NULL AS INT) AS true_match
        FROM probe p
        {joins}
        LEFT JOIN build b ON b.o_orderkey = p.l_orderkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_probe_rows,
           CAST(sum(pass_bloom) AS BIGINT) AS n_pass_bloom,
           CAST(sum(true_match) AS BIGINT) AS n_true_match,
           CAST(sum(CASE WHEN pass_bloom = 1 AND true_match = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
           CAST(sum(CASE WHEN pass_bloom = 0 AND true_match = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_neg,
           (SELECT CAST(sum(bit_count(word_bits)) AS BIGINT) FROM bloom)
               AS n_bits_set
    FROM tested
    """


@query("bloom_semi_join_prune", oracle=_bloom_oracle())
def bloom_semi_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter join pruning, made explicit: the urgent-order
    key set compresses into a 64 Kbit (2048-word) filter; every lineitem
    row tests its 3 hash bits against the broadcast word table; the exact
    semi join runs alongside as ground truth. Output: probe/pass/match
    counts, the measured false-positive count, the false-NEGATIVE count
    (must be 0 — Bloom's defining guarantee, asserted cross-engine), and
    the filter's set-bit population.

    Why this is the 100 TB shape: a semi join's build side grows with the
    data, but the filter is FIXED-SIZE — it broadcasts at any build
    cardinality, and the cost of under-sizing shows up as measured
    false-positive rate, not memory. The hash family keeps every product
    under 2^47, so Spark's non-ANSI BIGINT arithmetic and DuckDB's
    HUGEINT promotion cannot diverge. Plan: one build-side agg (2048-row
    result), three broadcast word-table probes + one build-key lookup on
    the scan, one global rollup — the probe side never shuffles."""
    m, w = _BLOOM_BITS, _BLOOM_WORD
    orders = load_table(spark, sf_dir, "orders")
    build = (
        orders.filter(F.col("o_orderpriority") == _BLOOM_PRIORITY)
        .select("o_orderkey")
        .distinct()
    )
    hs = [_bloom_h_col("o_orderkey", *t) for t in _BLOOM_HASHES]
    bloom = (
        build.select(F.explode(F.array(*hs)).alias("h"))
        .groupBy(F.expr(f"h div {w}").alias("word_id"))
        .agg(
            F.bit_or(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(h % {w} AS INT))")
            ).alias("word_bits")
        )
    )
    probe = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    for i, t in enumerate(_BLOOM_HASHES):
        probe = probe.withColumn(f"h{i}", _bloom_h_col("l_orderkey", *t))
    tested = probe
    for i in range(len(_BLOOM_HASHES)):
        bw = bloom.select(
            F.col("word_id").alias(f"w{i}"), F.col("word_bits").alias(f"bits{i}")
        )
        tested = tested.join(
            F.broadcast(bw),
            F.expr(f"h{i} div {w}") == F.col(f"w{i}"),
            "left",
        )
    bit_tests = [
        F.expr(
            f"coalesce(bits{i}, CAST(0 AS BIGINT))"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(h{i} % {w} AS INT)) <> 0"
        )
        for i in range(len(_BLOOM_HASHES))
    ]
    pass_bloom = F.when(
        sum((t.cast("int") for t in bit_tests), F.lit(0))
        == len(_BLOOM_HASHES),
        1,
    ).otherwise(0)
    truth = build.select(F.col("o_orderkey").alias("l_orderkey")).withColumn(
        "__in_build", F.lit(1)
    )
    tested = tested.join(truth, "l_orderkey", "left").select(
        pass_bloom.alias("pass_bloom"),
        F.coalesce(F.col("__in_build"), F.lit(0)).alias("true_match"),
    )
    bits_set = bloom.agg(
        F.sum(F.bit_count("word_bits")).cast("long").alias("n_bits_set")
    )
    return (
        tested.agg(
            F.count(F.lit(1)).cast("long").alias("n_probe_rows"),
            F.sum("pass_bloom").cast("long").alias("n_pass_bloom"),
            F.sum("true_match").cast("long").alias("n_true_match"),
            F.sum(
                F.when(
                    (F.col("pass_bloom") == 1) & (F.col("true_match") == 0), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_false_pos"),
            F.sum(
                F.when(
                    (F.col("pass_bloom") == 0) & (F.col("true_match") == 1), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_false_neg"),
        )
        .crossJoin(F.broadcast(bits_set))
    )


# --------------------------------------------------------------------------
# Min/max zone maps (file-skipping metadata).
# --------------------------------------------------------------------------
_ZM_BUCKET = 4096            # rows land in "files" of ~this many order keys
_ZM_LO = 9131                # 1995-01-01 as days since epoch
_ZM_HI = 9311                # 1995-06-30


@query(
    "data_skipping_zonemap",
    oracle=f"""
    WITH rows_d AS (
        SELECT l_orderkey // {_ZM_BUCKET} AS bucket_id,
               date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
                   AS ship_day
        FROM lineitem
    ), zones AS (
        SELECT bucket_id, min(ship_day) AS lo, max(ship_day) AS hi,
               count(*) AS n_rows
        FROM rows_d GROUP BY bucket_id
    ), flagged AS (
        SELECT bucket_id, n_rows,
               CAST(hi < {_ZM_LO} OR lo > {_ZM_HI} AS INT) AS skip
        FROM zones
    ), rowcheck AS (
        SELECT CAST(sum(CASE WHEN r.ship_day BETWEEN {_ZM_LO} AND {_ZM_HI}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_matching_rows,
               CAST(sum(CASE WHEN f.skip = 1
                             AND r.ship_day BETWEEN {_ZM_LO} AND {_ZM_HI}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_false_skips
        FROM rows_d r JOIN flagged f USING (bucket_id)
        WHERE r.ship_day BETWEEN {_ZM_LO} AND {_ZM_HI} OR f.skip = 1
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM flagged) AS n_buckets,
           (SELECT CAST(sum(skip) AS BIGINT) FROM flagged) AS n_skipped_buckets,
           (SELECT CAST(sum(n_rows) AS BIGINT) FROM flagged) AS rows_total,
           (SELECT CAST(sum(n_rows * skip) AS BIGINT) FROM flagged)
               AS rows_skipped,
           (SELECT n_matching_rows FROM rowcheck) AS n_matching_rows,
           (SELECT n_false_skips FROM rowcheck) AS n_false_skips
    """,
)
def data_skipping_zonemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/max zone-map pruning over ingestion-ordered row buckets
    (l_orderkey DIV 4096 stands in for parquet files written in arrival
    order): per-bucket (min, max) shipdate metadata decides which buckets
    a 1995-H1 predicate can skip without reading. Output: bucket/row skip
    accounting, the exact matching-row count, and the soundness witness —
    matching rows inside skipped buckets (MUST be 0; both engines assert
    the same zero, so an unsound zone map cannot pass the gate).

    Why this is the 100 TB shape: the skip decision reads O(files)
    metadata, not O(rows) data — the same contract as parquet row-group
    stats / Delta & Iceberg file skipping, and the reason naturally
    clustered columns (time, monotonically-assigned keys) prune so well.
    Plan: ONE bucket-keyed aggregation builds the zone table (tiny); the
    soundness check joins it back by broadcast; everything else is
    metadata-scale."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr(f"l_orderkey div {_ZM_BUCKET}").alias("bucket_id"),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("ship_day"),
    )
    zones = li.groupBy("bucket_id").agg(
        F.min("ship_day").alias("lo"),
        F.max("ship_day").alias("hi"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    flagged = zones.select(
        "bucket_id",
        "n_rows",
        ((F.col("hi") < _ZM_LO) | (F.col("lo") > _ZM_HI)).cast("int").alias("skip"),
    )
    zstats = flagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("skip").cast("long").alias("n_skipped_buckets"),
        F.sum("n_rows").cast("long").alias("rows_total"),
        F.sum(F.col("n_rows") * F.col("skip")).cast("long").alias("rows_skipped"),
    )
    match = F.col("ship_day").between(_ZM_LO, _ZM_HI)
    rowcheck = (
        li.join(F.broadcast(flagged.select("bucket_id", "skip")), "bucket_id")
        .filter(match | (F.col("skip") == 1))
        .agg(
            F.sum(match.cast("int")).cast("long").alias("n_matching_rows"),
            F.sum(F.when((F.col("skip") == 1) & match, 1).otherwise(0))
            .cast("long")
            .alias("n_false_skips"),
        )
    )
    return zstats.crossJoin(F.broadcast(rowcheck))
