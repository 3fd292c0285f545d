"""Skew mitigation: salted two-phase aggregation and salted joins,
plus bucketed-table helpers for co-located (shuffle-free) joins.

AQE's skew-join splitting (enabled in session confs) handles most
runtime skew; these operators are for the cases planning can't fix:

- salted aggregation: a groupBy whose key distribution is pathological
  (one key >> everything else) bottlenecks on a single reducer even
  with AQE, because a single group can't be split. Salting splits each
  group into ``salt_n`` sub-groups (phase 1: partial agg on
  (key, salt)), then merges the partials (phase 2: agg on key). Both
  phases are algebraic (count/sum/min/max merge), so results are
  exactly the plain-groupBy results regardless of salt assignment.
- salted join: replicate the small side per salt value, spread the
  skewed big side uniformly across salts; the join key becomes
  (key, salt) and the hot key's rows land on ``salt_n`` reducers.
- bucketing: pre-shuffle a big table ONCE into N buckets by join key
  (``bucketBy``); subsequent joins/aggregations on that key read
  co-located buckets and skip the shuffle entirely — the 100 TB
  pattern for repeatedly-joined fact tables.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE = {
    "count": F.sum,  # counts merge by summing partials
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}
_PARTIAL = {
    "count": lambda c: F.count(c),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: Mapping[str, tuple[str, str]],
    salt_n: int = 16,
    salt_on: str | Column | None = None,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column -> (fn, input column) with fn in
    count|sum|min|max (algebraic, hence exactly mergeable). The salt
    is ``xxhash64(salt_on) % salt_n`` when ``salt_on`` is given (use a
    high-cardinality column, e.g. the row id) else a per-row uniform
    ``rand`` — either way the merged result is salt-invariant.

    PREFER ``salt_on``: seeded ``rand`` is partition-layout-dependent
    (two runs over differently-partitioned input salt differently), so
    only the hash path gives replay-deterministic phase-1 partials —
    required if partials are checkpointed, audited, or diffed across
    runs. The ``rand`` fallback survives for inputs with no content
    worth hashing.
    """
    for fn, _ in aggs.values():
        if fn not in _PARTIAL:
            raise ValueError(f"non-algebraic agg {fn!r} cannot be salted")
    if salt_on is not None:
        col = F.col(salt_on) if isinstance(salt_on, str) else salt_on
        salt = F.pmod(F.xxhash64(col), F.lit(salt_n))
    else:
        salt = (F.rand(seed=7) * salt_n).cast("int")

    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(
            *[
                _PARTIAL[fn](c).alias(f"_p_{out}")
                for out, (fn, c) in aggs.items()
            ]
        )
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGE[fn](f"_p_{out}").alias(out)
            for out, (fn, _c) in aggs.items()
        ]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_n: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi join with the left (big/skewed) side salted and the right
    (small) side replicated ``salt_n`` times. Output columns = left ++
    right-minus-key, exactly like ``left.join(right, key, how)``.

    Only ``inner`` and ``left`` are supported: with ``right``/``full``
    an unmatched right row would be emitted once per salt replica.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left', got {how!r}: "
            "right/full would duplicate unmatched right rows per salt"
        )
    l = left.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt_n))
    )
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    )
    out = l.join(r, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 32, mode: str = "overwrite"
) -> None:
    """Persist as a bucketed (and sorted-within-bucket) table; joins
    and aggregations on ``key`` against another table bucketed the
    same way plan WITHOUT an Exchange (asserted in tests)."""
    (
        df.write.mode(mode)
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )
