"""Tuple-sketch aggregate: distinct-count + payload-sum estimation."""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_tuple_agg_exact_mode(spark):
    """With k >= distinct keys the sketch is exact."""
    from sparkdedup.operators.tuple_agg import tuple_sketch_agg

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    got = tuple_sketch_agg(ev.repartition(8), "event_type", "user_id",
                           "value", k=4096).toPandas()
    exact = (ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("nd"),
                  F.sum("value").alias("total"))).toPandas()
    m = got.merge(exact, on="event_type")
    assert len(m) == len(exact)
    assert (abs(m["n_distinct_est"] - m["nd"]) < 0.5).all()
    assert (abs(m["payload_total_est"] - m["total"]) < 1e-6 * m["total"].abs()
            + 1e-6).all()


def test_tuple_agg_estimation_mode(spark):
    """With k << distinct keys, estimates stay within sketch error."""
    from sparkdedup.operators.tuple_agg import tuple_sketch_agg

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "g", F.lit("all"))
    got = tuple_sketch_agg(ev.repartition(8), "g", "event_id", "value",
                           k=128).toPandas().iloc[0]
    nd = ev.select("event_id").distinct().count()
    total = ev.agg(F.sum("value")).first()[0]
    assert abs(got["n_distinct_est"] - nd) / nd < 0.30   # k=128 -> ~9% sd
    assert abs(got["payload_total_est"] - total) / abs(total) < 0.45
    assert got["n_retained"] == 128
