"""Interval (range) join: points ⋈ intervals containing them.

The reference engine has no interval joins (SURVEY §2.3); this is
engine breadth for event pipelines (event-in-session attribution,
shipment-in-window counting, time-band feature joins).

Scale design — bucketed equi-join, NOT an inequality join:

Catalyst plans a bare ``lo <= p AND p <= hi`` predicate (with no
equi-conjunct) as BroadcastNestedLoopJoin — quadratic work and a
broadcast of one whole side. Instead both sides are mapped onto a
fixed bucket grid of width ``bucket_seconds``:

  * each interval explodes into the buckets it covers —
    ``ceil(len/bucket) + 1`` rows, bounded when interval lengths are
    bounded (choose ``bucket_seconds`` ≈ the typical interval length
    so the blow-up is ~2×);
  * each point hashes to exactly ONE bucket, so a (point, interval)
    pair can meet in at most one bucket and the join needs no
    post-dedup;
  * the join becomes a plain hash equi-join on ``(*on, bucket)`` —
    one shuffle, AQE-sizeable, skew-splittable — followed by the
    exact ``lo <= p <= hi`` refinement filter.

Worst case degrades gracefully: an interval of length L costs
L/bucket exploded rows, so pathological long intervals show up as
data volume (visible, tunable) rather than as a nested-loop plan
(invisible, quadratic). Outer semantics compose on top: aggregate the
inner result and left-join it back to the interval side (see
``q_range_ship_window``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__range_bucket"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    lo_ts: str,
    hi_ts: str,
    on: Sequence[str] = (),
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Inner-join each ``points`` row to every ``intervals`` row whose
    ``[lo_ts, hi_ts]`` (inclusive both ends) contains ``point_ts``,
    optionally also matching the equi-keys ``on``.

    Timestamp columns only; pick ``bucket_seconds`` near the typical
    interval length.
    """
    on = list(on)
    bucket_micros = bucket_seconds * 1_000_000

    def bucket_of(col: str):
        # cast handles TIMESTAMP_NTZ inputs; the engine session runs in
        # UTC (session.ENGINE_CONFS) so the cast preserves the instant
        return F.floor(
            F.unix_micros(F.col(col).cast("timestamp")) / F.lit(bucket_micros)
        )

    # Guard malformed intervals BEFORE the explode: sequence(start, stop)
    # with start > stop generates a *descending* sequence, so an interval
    # inverted by years would silently explode into thousands of spurious
    # bucket rows (all later discarded by the refinement filter) —
    # hidden quadratic-ish work. Inner-join semantics make dropping them
    # exact: an inverted (or NULL-bounded) interval contains no point.
    iv = intervals.filter(F.col(lo_ts) <= F.col(hi_ts)).withColumn(
        _BUCKET,
        F.explode(F.sequence(bucket_of(lo_ts), bucket_of(hi_ts))),
    )
    pt = points.withColumn(_BUCKET, bucket_of(point_ts))

    contained = (F.col(point_ts) >= F.col(lo_ts)) & (
        F.col(point_ts) <= F.col(hi_ts)
    )
    return (
        pt.join(iv, on=on + [_BUCKET], how="inner")
        .filter(contained)
        .drop(_BUCKET)
    )
