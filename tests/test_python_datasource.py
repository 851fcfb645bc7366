"""Custom Python data source (Spark 4 DataSource API): deterministic rows
regardless of partition layout, executor-side generation fan-out, and
filter pushdown that actually skips row construction."""

from __future__ import annotations

from metas_judiciarias_etl_spark.sources import synthetic


def _read(spark, **opts):
    synthetic.register(spark)
    r = spark.read.format("synthetic_events")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_rows_match_recipe_and_are_layout_invariant(spark):
    exp = sorted(synthetic.expected_rows(500))
    for parts in (1, 8):
        df = _read(spark, rows=500, partitions=parts)
        assert df.rdd.getNumPartitions() == parts
        assert sorted(map(tuple, df.collect())) == exp


def test_filter_pushdown_accepted_for_event_type(spark):
    df = _read(spark, rows=500).filter("event_type = 'purchase'")
    exp = [r for r in synthetic.expected_rows(500) if r[1] == "purchase"]
    assert sorted(map(tuple, df.collect())) == sorted(exp)


def test_unsupported_filter_still_correct(spark):
    # pushFilters rejects non-EqualTo predicates; Spark must re-apply them
    df = _read(spark, rows=500).filter("cents > 25000 AND user_id < 500")
    exp = [
        r
        for r in synthetic.expected_rows(500)
        if r[3] > 25000 and r[2] < 500
    ]
    assert sorted(map(tuple, df.collect())) == sorted(exp)


def test_source_composes_with_relational_ops(spark):
    df = _read(spark, rows=1000, partitions=4)
    agg = (
        df.groupBy("event_type")
        .sum("cents")
        .withColumnRenamed("sum(cents)", "total")
    )
    got = {r["event_type"]: r["total"] for r in agg.collect()}
    exp: dict[str, int] = {}
    for _i, t, _u, c in synthetic.expected_rows(1000):
        exp[t] = exp.get(t, 0) + c
    assert got == exp


def test_conflicting_pushed_filters_stay_correct(spark):
    # two EqualTo predicates on event_type: only ONE may be absorbed by the
    # reader; the other must be yielded back so Spark re-applies it and the
    # contradiction correctly produces zero rows
    df = (
        _read(spark, rows=500)
        .filter("event_type = 'purchase'")
        .filter("event_type = 'click'")
    )
    assert df.count() == 0


def test_zero_rows_option_yields_empty_frame(spark):
    assert _read(spark, rows=0).count() == 0


def test_streaming_reader_replays_exactly_once(spark, tmp_path):
    """The custom source's streaming form: micro-batches advance a row
    offset, rows regenerate deterministically from (row_id, seed), and
    draining availableNow yields every row exactly once in order — the
    replayability contract a real feed source implements with a log
    position."""
    import time

    synthetic.register(spark)
    n = 250
    q = (
        spark.readStream.format("synthetic_events")
        .option("rows", n)
        .option("batch_rows", 100)
        .load()
        .writeStream.format("memory")
        .queryName("synth_stream_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    # a simple stream reader prefetches on the driver, so availableNow
    # would drain only the first prefetched batch — run the continuous
    # micro-batch trigger and stop once the bounded generator is drained
    deadline = time.time() + 120
    try:
        while time.time() < deadline:
            if spark.sql("SELECT count(*) c FROM synth_stream_out").collect()[0]["c"] >= n:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    got = [
        tuple(r)
        for r in spark.sql(
            "SELECT * FROM synth_stream_out ORDER BY event_id"
        ).collect()
    ]
    assert got == synthetic.expected_rows(n)
