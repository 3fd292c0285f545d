"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_compute(df: DataFrame, min_factor: int = 2) -> DataFrame:
    """Repartition a DataFrame whose partition count is far below the
    cluster's parallelism before a CPU-heavy per-row stage.

    A small parquet table (one file < maxPartitionBytes) scans as ONE
    partition, serializing any expensive downstream map (observed:
    minhash over 5k docs ran on 1 of 32 cores). The repartition is a
    no-op whenever the source already has enough splits — i.e. at real
    scale, where inputs arrive as many files/row-groups — so this
    only fires in exactly the small-input/heavy-compute regime where
    the round-robin shuffle (cost: one pass over the small input) buys
    a parallelism factor equal to the core count.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() * min_factor <= target:
        return df.repartition(target)
    return df
