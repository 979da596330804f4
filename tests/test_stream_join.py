"""Stream-stream watermarked join: streamed result == batch twin on the
same input; attribution-window semantics."""

import datetime as dt

from ner_extractor_spark.streaming.joins import (event_attribution_batch,
                                                 stream_event_attribution)

EVENTS = ("event_id long, ts timestamp, user_id long, "
          "event_type string, value double, props string")

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _rows():
    m = dt.timedelta(minutes=1)
    return [
        # user 1: view at t0, purchase 10 min later -> attributed
        (1, T0, 1, "view", 0.0, "{}"),
        (2, T0 + 10 * m, 1, "purchase", 9.99, "{}"),
        # user 1: second view AFTER the purchase -> not attributed to it
        (3, T0 + 20 * m, 1, "view", 0.0, "{}"),
        # user 2: view, purchase 40 min later -> OUTSIDE the 30-min window
        (4, T0, 2, "view", 0.0, "{}"),
        (5, T0 + 40 * m, 2, "purchase", 5.0, "{}"),
        # user 3: two views before one purchase -> both attributed
        (6, T0, 3, "view", 0.0, "{}"),
        (7, T0 + 5 * m, 3, "view", 0.0, "{}"),
        (8, T0 + 15 * m, 3, "purchase", 1.0, "{}"),
        # user 4: purchase with no view at all
        (9, T0, 4, "purchase", 2.0, "{}"),
    ]


def test_batch_attribution_semantics(spark):
    ev = spark.createDataFrame(_rows(), EVENTS)
    got = {(r["view_id"], r["purchase_id"])
           for r in event_attribution_batch(ev, within_s=1800).collect()}
    assert got == {(1, 2), (6, 8), (7, 8)}


def test_stream_matches_batch(spark, tmp_path):
    ev = spark.createDataFrame(_rows(), EVENTS)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ev.repartition(2).write.parquet(src)

    stream = (spark.readStream.schema(EVENTS).format("parquet").load(src))
    joined = stream_event_attribution(stream, within_s=1800)
    q = (joined.writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()

    batch = event_attribution_batch(spark.read.parquet(src), within_s=1800)
    s = sorted(map(tuple, spark.read.parquet(out)
                   .select(*batch.columns).collect()))
    b = sorted(map(tuple, batch.collect()))
    assert s == b and len(s) == 3
