"""Watermarked stream-stream join (SURVEY §2.11 family): attribute each
``purchase`` event to the same user's ``view`` events within an
attribution window — the canonical impressions×clicks shape.

Scale posture: BOTH sides carry watermarks and the join condition
bounds event-time distance, so Spark provably evicts state once a row
can no longer match (state ∝ watermark horizon × arrival rate, never
the stream length).  The join key (user_id) is high-cardinality, so the
stateful shuffle is well spread; a hot user would be an AQE-skew /
salting case exactly like the batch joins.

``event_attribution_batch`` is the batch twin with the IDENTICAL
condition — the contract query runs it (oracle-checkable), and
tests/test_stream_join.py pins streamed == batch on the same input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _sides(events: DataFrame, left_type: str, right_type: str):
    v = (events.filter(F.col("event_type") == left_type)
         .select(F.col("user_id").alias("v_user"),
                 F.col("ts").alias("v_ts"),
                 F.col("event_id").alias("view_id")))
    p = (events.filter(F.col("event_type") == right_type)
         .select(F.col("user_id").alias("p_user"),
                 F.col("ts").alias("p_ts"),
                 F.col("event_id").alias("purchase_id"),
                 F.col("value")))
    return v, p


def _cond(within_s: int):
    return ((F.col("v_user") == F.col("p_user"))
            & (F.col("v_ts") <= F.col("p_ts"))
            & (F.col("p_ts") <= F.col("v_ts")
               + F.expr(f"INTERVAL {within_s} SECONDS")))


def _project(joined: DataFrame) -> DataFrame:
    return joined.select(F.col("p_user").alias("user_id"),
                         "view_id", "purchase_id", "v_ts", "p_ts", "value")


def stream_event_attribution(events_stream: DataFrame,
                             left_type: str = "view",
                             right_type: str = "purchase",
                             within_s: int = 1800,
                             watermark: str = "2 hours") -> DataFrame:
    """Stream-stream inner join; pass the SAME source stream (it is
    filtered into the two sides) or two distinct streams with the same
    schema."""
    v, p = _sides(events_stream, left_type, right_type)
    return _project(
        v.withWatermark("v_ts", watermark)
        .join(p.withWatermark("p_ts", watermark), _cond(within_s), "inner"))


def event_attribution_batch(events: DataFrame,
                            left_type: str = "view",
                            right_type: str = "purchase",
                            within_s: int = 1800) -> DataFrame:
    """Batch twin: identical condition, no watermarks."""
    v, p = _sides(events, left_type, right_type)
    return _project(v.join(p, _cond(within_s), "inner"))
