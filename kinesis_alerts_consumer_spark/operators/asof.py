"""Backward as-of join (point-in-time lookup) as a union + window —
the shuffle-minimal Spark formulation.

Spark has no ASOF JOIN operator (DuckDB/Pandas do); the naive
translation — range join ``l.ts >= r.ts`` + argmax — explodes into
O(|L|·matches) intermediate rows before pruning. The scalable
formulation used here:

1. union the left and right streams into one keyed timeline
   (right rows carry the payload, left rows a null payload);
2. one window per key ordered by (ts, side) with
   ``last(payload, ignorenulls=True)`` over ROWS UNBOUNDED
   PRECEDING..CURRENT — each left row picks up the most recent right
   payload at-or-before its timestamp;
3. filter back to left rows.

Cost: ONE shuffle on the join key (same as any keyed join) plus a
per-key sort — no range cross product, no skew amplification beyond
what the key distribution already has. At 100 TB this is the standard
point-in-time-correct feature-lookup pattern (training-data joins);
for skewed keys AQE's skew-split handles the shuffle, and the window
sort spills via Tungsten.

Tie semantics: a right row AT the left timestamp matches
(``>=``, backward inclusive) — right rows sort before left rows on
equal timestamps. When the right side has several rows at the same
(key, ts), pass ``right_tiebreak`` (a column name); the row sorting
LAST by it wins — equivalent to pre-deduping with argmax(tiebreak)
but without the extra (key, ts) shuffle a dedup window would cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload_prefix: str = "r_",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[right_ts] <= left[left_ts]`` on the same ``key``.

    Returns all left columns plus every non-key right column renamed
    ``{payload_prefix}{col}`` (null when no right row precedes).
    ``right_tiebreak`` resolves duplicate right (key, ts) rows: the
    row with the greatest tiebreak value wins.
    """
    payload_cols = [c for c in right.columns if c not in (key, right_ts)]
    payload = F.struct(
        F.col(right_ts).alias(right_ts),
        *[F.col(c) for c in payload_cols],
    )

    left_cols = [c for c in left.columns]
    # Window order: (ts, side, tiebreak). Right rows (side 0) precede
    # left rows at equal ts (inclusive >=); among duplicate right
    # (key, ts) rows the greatest tiebreak sorts last and wins last().
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("double").alias("_tb"),
        F.struct(*[F.col(c) for c in left_cols]).alias("_lv"),
        F.lit(None).cast(
            right.select(payload.alias("p")).schema["p"].dataType.simpleString()
        ).alias("_rv"),
    )
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        (
            F.col(right_tiebreak).cast("double")
            if right_tiebreak
            else F.lit(0.0)
        ).alias("_tb"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left_cols]).alias("l")
            ).schema["l"].dataType.simpleString()
        ).alias("_lv"),
        payload.alias("_rv"),
    )

    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", F.col("_tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r)
        .withColumn("_m", F.last("_rv", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    out = matched.select(
        *[F.col("_lv").getField(c).alias(c) for c in left_cols],
        *[
            F.col("_m").getField(c).alias(f"{payload_prefix}{c}")
            for c in [right_ts, *payload_cols]
        ],
    )
    return out
