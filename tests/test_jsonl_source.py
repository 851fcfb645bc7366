"""JSONL source/sink round-trip and malformed-line policy tests
(sources/jsonl.py). Transport-level checks — no DuckDB-oracle form."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from metas_judiciarias_etl_spark.sources.jsonl import (
    CORRUPT_COL,
    jsonl_to_parquet,
    read_jsonl,
    write_jsonl,
)
from metas_judiciarias_etl_spark.sources.parquet import load_table

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def test_jsonl_roundtrip_preserves_documents(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out, compression=None)
    back = read_jsonl(spark, out, DOC_SCHEMA).select(*docs.columns)
    orig = {tuple(r) for r in docs.collect()}
    got = {tuple(r) for r in back.collect()}
    assert got == orig


def test_jsonl_gzip_roundtrip(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents").limit(50)
    out = str(tmp_path / "docs_gz")
    write_jsonl(docs, out)  # default gzip
    assert any(f.endswith(".gz") for f in os.listdir(out))
    back = read_jsonl(spark, out, DOC_SCHEMA)
    assert back.count() == 50


def _write_mixed_file(path: str) -> None:
    lines = [
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "a", "n_chars": 2}',
        "this is not json at all {{{",
        '{"doc_id": 2, "text": "also ok", "lang": "pt", "source": "b", "n_chars": 7}',
    ]
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")


def test_bad_lines_drop(spark, tmp_path):
    src = str(tmp_path / "mixed.jsonl")
    _write_mixed_file(src)
    df = read_jsonl(spark, src, DOC_SCHEMA, bad_lines="drop")
    assert {r["doc_id"] for r in df.collect()} == {1, 2}


def test_bad_lines_keep_quarantines_raw_line(spark, tmp_path):
    src = str(tmp_path / "mixed.jsonl")
    _write_mixed_file(src)
    df = read_jsonl(spark, src, DOC_SCHEMA, bad_lines="keep")
    assert df.count() == 3
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    rows = bad.collect()
    assert len(rows) == 1
    assert rows[0][CORRUPT_COL].startswith("this is not json")
    assert rows[0]["doc_id"] is None  # data columns NULL on corrupt rows


def test_jsonl_to_parquet_partitioned_ingest(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents")
    src = str(tmp_path / "ingest_jsonl")
    dest = str(tmp_path / "ingest_parquet")
    write_jsonl(docs, src, compression=None)
    jsonl_to_parquet(spark, src, dest, DOC_SCHEMA, partition_by=["lang"])
    back = spark.read.parquet(dest)
    assert back.count() == docs.count()
    # hive layout materialized per language
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    on_disk = {
        d.split("=", 1)[1]
        for d in os.listdir(dest)
        if d.startswith("lang=")
    }
    assert on_disk == langs
