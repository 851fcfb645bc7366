"""JSON-Lines source/sink — the interchange format of large-scale text
pipelines (one JSON document per line, splittable, append-friendly).

The reference is CSV-only (Versao_Np.py:155); JSONL is engine surface added
for the training-data path (SURVEY §7 phases 4–5). Design rules, mirroring
the CSV reader in metas/pipeline.py:

* ALWAYS an explicit schema. ``inferSchema``/sampling reads the data twice
  and pins whatever the sample happened to contain — at 100 TB both are
  bugs, and a schema drift should fail loudly, not re-type a column.
* Malformed lines are an explicit policy, not an accident:
  - ``bad_lines='drop'`` → DROPMALFORMED (the NP on_bad_lines='skip'
    semantics);
  - ``bad_lines='keep'`` → PERMISSIVE with a ``_corrupt_record`` column,
    so a cleanup pass can quarantine the raw line instead of losing it
    (the audit-friendly mode for ingest at scale).
* JSONL is the *transport*; long-lived storage should land in parquet
  (columnar, pushdown-able). ``jsonl_to_parquet`` is that one-hop step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    bad_lines: str = "drop",
) -> DataFrame:
    """Read JSONL with an explicit schema.

    ``bad_lines='drop'`` silently drops unparseable lines; ``'keep'``
    returns them in a ``_corrupt_record`` string column (all data columns
    NULL for those rows).
    """
    if bad_lines not in ("drop", "keep"):
        raise ValueError(f"bad_lines must be 'drop' or 'keep', got {bad_lines!r}")
    if bad_lines == "drop":
        return spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def write_jsonl(df: DataFrame, path: str, compression: str | None = "gzip") -> None:
    """Write JSONL (optionally gzipped — fine for transport; note gzip parts
    are not splittable, so keep part sizes bounded by upstream partitioning
    rather than writing few huge parts)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def jsonl_to_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    schema: T.StructType,
    partition_by: list[str] | None = None,
) -> None:
    """Ingest hop: JSONL transport → parquet storage, optionally
    hive-partitioned. One pass, no driver-side materialization."""
    df = read_jsonl(spark, src, schema, bad_lines="drop")
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(dest)
