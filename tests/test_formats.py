"""Source/sink format round-trips: CSV, JSON-lines, partitioned
parquet (with partition pruning assertion)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_alerts_consumer_spark.sources import register_tables
from kinesis_alerts_consumer_spark.sources.formats import (
    read_csv,
    read_jsonl,
    read_lines,
    write_csv,
    write_jsonl,
    write_parquet,
)

from .conftest import SF_SMOKE


def _orders(spark):
    return register_tables(spark, SF_SMOKE)["orders"].select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_roundtrip(spark, tmp_path):
    src = _orders(spark)
    path = str(tmp_path / "orders_csv")
    write_csv(src, path)
    back = read_csv(
        spark,
        path,
        schema="o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double",
    )
    assert _canon(back) == _canon(src)


def test_jsonl_roundtrip_and_corrupt_capture(spark, tmp_path):
    src = _orders(spark)
    path = str(tmp_path / "orders_json")
    write_jsonl(src, path)
    back = read_jsonl(
        spark,
        path,
        schema="o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double",
    )
    assert _canon(back) == _canon(src)

    # corrupt line -> captured row, not a failed scan
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "part-0.json").write_text('{"a": 1}\nnot json at all\n')
    got = read_jsonl(spark, str(bad), schema="a bigint, _corrupt_record string")
    rows = got.collect()
    assert len(rows) == 2
    assert sum(r._corrupt_record is not None for r in rows) == 1


def test_partitioned_parquet_prunes(spark, tmp_path):
    src = _orders(spark)
    path = str(tmp_path / "orders_part")
    write_parquet(src, path, partition_by=("o_orderstatus",))
    back = spark.read.parquet(path)
    pruned = back.filter(F.col("o_orderstatus") == "F")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition filter must reach the scan, not a post-scan Filter
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan
    want = src.filter(F.col("o_orderstatus") == "F").drop("o_orderstatus")
    assert _canon(pruned.drop("o_orderstatus")) == _canon(want)


def test_read_lines(spark, tmp_path):
    p = tmp_path / "lines"
    p.mkdir()
    (p / "a.txt").write_text("one\ntwo\n")
    assert {r.value for r in read_lines(spark, str(p)).collect()} == {"one", "two"}


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    from kinesis_alerts_consumer_spark.sources.formats import read_orc, write_orc

    orders = _orders(spark)
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)
    back = read_orc(spark, path)
    assert _canon(back) == _canon(orders)
    # Filter must reach the ORC scan (pushed filters in the plan).
    plan = (
        back.filter(F.col("o_orderkey") == 7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "o_orderkey" in plan.split("PushedFilters")[1][:80]


def test_register_tables_refreshes_views_on_sf_switch(spark):
    """Temp views are global per session: switching sf_dir and back
    must re-point the views, not silently serve the stale sf's data
    from the (session, sf_dir) cache."""
    from .conftest import SF_CORRECTNESS

    n_smoke = register_tables(spark, SF_SMOKE)["orders"].count()
    assert spark.sql("SELECT COUNT(*) c FROM orders").first().c == n_smoke
    n_big = register_tables(spark, SF_CORRECTNESS)["orders"].count()
    assert n_big != n_smoke
    assert spark.sql("SELECT COUNT(*) c FROM orders").first().c == n_big
    register_tables(spark, SF_SMOKE)
    assert spark.sql("SELECT COUNT(*) c FROM orders").first().c == n_smoke


def test_avro_gate_or_roundtrip(spark, tmp_path):
    """Avro is an external Spark module: where the jar exists the
    round-trip must work; here (no jar) the reader/writer must raise
    the actionable gate error, not an opaque ClassNotFound. The
    branch is chosen by ATTEMPTING the write (the gate pattern itself)
    rather than a separate availability probe that could drift."""
    import pytest as _pytest

    from kinesis_alerts_consumer_spark.sources.formats import (
        read_avro,
        write_avro,
    )

    df = spark.range(5).withColumnRenamed("id", "n")
    try:
        write_avro(df, str(tmp_path / "a"))
        available = True
    except RuntimeError as exc:
        assert "spark-avro" in str(exc)
        available = False
    if available:
        assert read_avro(spark, str(tmp_path / "a")).count() == 5
    else:
        with _pytest.raises(RuntimeError, match="spark-avro"):
            read_avro(spark, str(tmp_path / "a"))
    # classifier polarity: unrelated failures propagate untouched
    # (never masked as the gate); both known not-found message
    # variants chain to the actionable error
    from kinesis_alerts_consumer_spark.sources.formats import (
        _reraise_if_avro_missing,
    )

    with _pytest.raises(ValueError, match="connection reset"):
        _reraise_if_avro_missing(ValueError("connection reset by peer"))
    for msg in (
        "Failed to find data source: avro. Avro is built-in but ...",
        "[DATA_SOURCE_NOT_FOUND] Failed to find the data source: AVRO.",
    ):
        with _pytest.raises(RuntimeError, match="spark-avro"):
            _reraise_if_avro_missing(Exception(msg))
