"""Temporal joins Spark lacks as built-ins: as-of join and interval (range) join.

The reference has no joins at all (SURVEY.md §2.9 — single-stream job), so
these are beyond-parity operators, expressed as compositions of existing
DataFrame ops so Catalyst/AQE keep optimizing them. Both avoid the naive
formulations that die at 100 TB:

* ``asof_join`` — the obvious ``left.join(right, key) .filter(r.ts <= l.ts)
  .groupBy(...).agg(max_by(...))`` explodes to |left| x |right-rows-per-key|
  before aggregating. Instead we use the *union-merge* formulation: one
  UNION, one shuffle+sort on (key, ts), one window pass — identical
  asymptotics to a single sort-merge join, zero row blowup, no Python.

* ``bucketed_interval_join`` — a point-in-interval join with no equi key is
  a cross join in vanilla Spark (BroadcastNestedLoopJoin). Bucketizing time
  into fixed-width buckets turns it into an equi join on the bucket key:
  intervals explode into the few buckets they overlap, points map to
  exactly one bucket, the join is a plain hash/sort-merge shuffle on
  bucket, and the exact range predicate filters after the match. Row
  expansion is bounded by interval_span/bucket_width, chosen by the caller.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_LEFT = 1
_RIGHT = 0


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    ts: str = "ts",
    right_payload: Sequence[str] | None = None,
    right_ts_alias: str = "right_ts",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Backward as-of join: attach to every left row the payload of the
    latest right row with ``right.ts <= left.ts`` (``<`` when
    ``allow_exact_matches=False``) for the same key — pandas
    ``merge_asof`` semantics, distributed.

    Requirements: ``right`` must be unique per (key, ts) — pre-aggregate if
    not (ties would be nondeterministic in any engine); payload columns
    must be non-null (a null payload is indistinguishable from "no match"
    to the ignore-nulls carry; pre-coalesce sentinels if needed); payload
    names must not collide with left columns.

    Scale shape: one shuffle+sort of |left| + |right| rows on (key, ts) and
    a single running-window pass — the minimal cost for this semantics.
    Skewed keys are handled by AQE the same way any sort-merge join is.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in (*keys, ts)]

    r = right.select(
        *keys,
        F.col(ts).alias("_ats"),
        F.lit(_RIGHT).alias("_aside"),
        F.col(ts).alias(right_ts_alias),
        *right_payload,
    )
    l = left.select(
        "*",
        F.col(ts).alias("_ats"),
        F.lit(_LEFT).alias("_aside"),
        F.lit(None).cast(r.schema[right_ts_alias].dataType).alias(right_ts_alias),
        *[
            F.lit(None).cast(r.schema[c].dataType).alias(c)
            for c in right_payload
        ],
    )
    merged = l.unionByName(r, allowMissingColumns=True)

    # At equal ts, a right row sorts before (inclusive) or after (exclusive)
    # the left rows, which makes the running carry see or miss it.
    side_order = F.col("_aside").asc() if allow_exact_matches else F.col("_aside").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ats").asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "*",
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in (right_ts_alias, *right_payload)
        ],
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"_c_{c}").alias(c) for c in (right_ts_alias, *right_payload)
    ]
    return carried.filter(F.col("_aside") == _LEFT).select(*out_cols)


def bucketed_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start: str = "w_start",
    end: str = "w_end",
    bucket_seconds: int = 300,
    extra_on: Sequence[str] = (),
) -> DataFrame:
    """Point-in-interval join (``start <= ts < end``) without a cross join.

    Both sides get a synthetic ``_bucket = floor(epoch/bucket)`` key:
    intervals are exploded (``sequence``) into every bucket they overlap,
    points map to exactly one bucket, and the join becomes an equi join on
    (_bucket, *extra_on) followed by the exact range filter. Each
    (interval, point) pair can meet in at most one bucket, so no dedup is
    needed.

    Choose ``bucket_seconds`` near the typical interval span: expansion of
    the interval side is ~span/bucket + 1 rows, and the bucket key spreads
    the shuffle evenly over time, so the plan survives a 100x scale-up as
    long as no single bucket is pathologically hot (salt ``extra_on`` or
    shrink the bucket if one is).
    """
    # Guard malformed intervals BEFORE exploding: with end <= start,
    # F.sequence(hi, lo) silently generates a DESCENDING range (default
    # step -1) — one bad row could explode into a huge spurious bucket
    # list that the final range filter only discards after the join has
    # paid for it. Empty/inverted intervals match no point anyway.
    # micro precision: second-truncated bucketing would mis-bucket
    # fractional-second interval bounds
    ivals = intervals.filter(F.col(end) > F.col(start)).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.expr(f"unix_micros({start}) div {bucket_seconds * 1_000_000}"),
                # end is exclusive: last covered microsecond is end - 1us
                F.expr(f"(unix_micros({end}) - 1) div {bucket_seconds * 1_000_000}"),
            )
        ),
    )
    pts = points.withColumn(
        "_bucket", F.expr(f"unix_micros({point_ts}) div {bucket_seconds * 1_000_000}")
    )
    return (
        pts.join(ivals, ["_bucket", *extra_on])
        .filter((F.col(point_ts) >= F.col(start)) & (F.col(point_ts) < F.col(end)))
        .drop("_bucket")
    )
