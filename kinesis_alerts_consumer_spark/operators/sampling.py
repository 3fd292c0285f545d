"""Sampling and sequence-packing operators for training-data curation.

- :func:`hash_sample` — DETERMINISTIC per-stratum Bernoulli sampling:
  keep a row iff ``hash60(key) % 100 < rate(stratum)``. Unlike
  ``DataFrame.sample`` the decision is a pure function of the row key,
  so it is reproducible across runs/engines (the DuckDB oracle
  replays it bit-for-bit), stable under retries/speculative tasks,
  and consistent when the same key reappears (a re-crawled doc keeps
  its fate). It is also a plain scan-side filter: no RNG state, no
  extra pass, no shuffle (the md5 predicate evaluates per row at the
  scan; it is not a parquet-level pushed filter since it is a
  function of the column).
- :func:`pack_sequences` — greedy sequence packing: within each
  group, docs (ordered by id) accumulate into bins of ~``budget``
  tokens (bin = floor(running-token-count-before / budget)) — the
  batch-planning step that turns a corpus into context-window-sized
  training groups. One window per group; at 100 TB the partition key
  (lang/source/shard) bounds each window's state.

Both are pure column expressions; hashes are md5-derived like
operators.dedup so the oracle comparison is exact.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _hash60


def hash_sample(
    df: DataFrame,
    key: Column,
    rate_pct: Column | int,
    modulus: int = 100,
) -> DataFrame:
    """Rows whose ``hash60(key) % modulus`` falls under ``rate_pct``.

    ``rate_pct`` may be a per-row Column (per-stratum rates via
    CASE/when) or a flat int percentage.
    """
    r = F.lit(rate_pct) if isinstance(rate_pct, int) else rate_pct
    return df.filter(_hash60(key.cast("string")) % modulus < r)


def stratified_rates(rates: Mapping[str, int], stratum: Column, default: int) -> Column:
    """Per-stratum percentage column from a literal {value: pct} map."""
    expr: Column | None = None
    for value, pct in sorted(rates.items()):
        cond = stratum == value
        expr = F.when(cond, pct) if expr is None else expr.when(cond, pct)
    return expr.otherwise(default) if expr is not None else F.lit(default)


def split_assign(
    df: DataFrame,
    key: Column,
    splits: Mapping[str, int],
    shards: int = 0,
    modulus: int = 1_000_000,
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split + export-shard assignment —
    the training-pipeline staple :func:`hash_sample` does not cover:
    every document gets exactly ONE ``split`` label by hash-range
    over ``hash60(salt:key) % modulus``, with ``splits`` mapping
    name → width in parts-of-``modulus`` (must sum to it exactly —
    no silent remainder bucket), in the caller's insertion order.

    Why hash-range and not count-based quotas: assignments are pure
    column math — zero shuffle, retry-stable, reproducible across
    engines — and APPEND-STABLE: adding documents to the corpus never
    moves an existing document's split, which is the leakage
    guarantee an eval set needs across corpus snapshots (a
    quota/ROW_NUMBER scheme reassigns on every re-run). ``shards``
    adds an export shard id from an INDEPENDENT hash (different salt
    domain), so shard membership is uncorrelated with split
    membership — sharding train data by the same hash that chose
    'train' would make every shard a biased slice of the key space.
    ``salt`` namespaces the whole assignment: two pipelines splitting
    the same corpus with different salts draw independent eval sets.

    NULL keys get NULL ``split`` (and NULL ``shard``) — quarantine
    them upstream. They are never silently routed into a range: the
    hash of a NULL key is NULL, so a CASE fallthrough would have
    assigned every NULL row to the LAST-named split deterministically
    — in a train/val/test layout, straight into an eval set (r13
    review).
    """
    widths = list(splits.items())
    if not widths:
        raise ValueError("splits must name at least one range")
    total = sum(w for _, w in widths)
    if total != modulus:
        raise ValueError(
            f"split widths must sum to modulus={modulus} exactly, "
            f"got {total} — no silent remainder bucket")
    if any(w <= 0 for _, w in widths):
        raise ValueError("every split width must be positive")
    h = _hash60(
        F.concat(F.lit(f"{salt}:"), key.cast("string"))) % modulus
    expr = None
    acc = 0
    for name, width in widths[:-1]:
        acc += width
        cond = h < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = widths[-1][0]
    tail = F.when(key.isNotNull(), F.lit(last))  # NULL key -> NULL split
    split_col = tail if expr is None else expr.otherwise(tail)
    out = df.withColumn("split", split_col)
    if shards:
        if shards < 0:
            raise ValueError(f"shards must be >= 0, got {shards}")
        out = out.withColumn(
            "shard",
            (_hash60(F.concat(F.lit(f"{salt}#shard:"),
                              key.cast("string"))) % shards).cast("int"),
        )
    return out


def pack_sequences(
    docs: DataFrame,
    token_count: Column,
    budget: int,
    group: str = "lang",
    order: str = "doc_id",
    shards: int | None = None,
) -> DataFrame:
    """Assign each doc a packing ``bin`` within its group: running
    token total (ordered by ``order``, exclusive of the current doc)
    integer-divided by ``budget``. Adds ``ntok`` and ``bin``.

    With ``shards`` set, a deterministic ``shard`` column
    (``hash60(order) % shards``) is added to the window key and the
    output, and packing runs within each (group, shard). A group key
    like ``lang`` alone has ~a handful of distinct values, so at
    100 TB the running-sum window would sort the whole corpus on a few
    partitions; sharding bounds each window's sort/state at
    corpus/(groups*shards) while keeping bins deterministic (the
    hash is a pure row function, so the oracle replays it).
    """
    out = docs.withColumn("ntok", token_count)
    keys = [group]
    if shards is not None:
        out = out.withColumn(
            "shard", (_hash60(F.col(order).cast("string")) % shards)
        )
        keys.append("shard")
    w = (
        Window.partitionBy(*keys)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return out.withColumn(
        "bin",
        F.floor(F.coalesce(F.sum("ntok").over(w), F.lit(0)) / budget).cast(
            "bigint"
        ),
    )


def mixture_plan(
    docs: DataFrame,
    stratum_col: str = "lang",
    temperature: float = 2.0,
    budget_frac: float = 0.5,
) -> DataFrame:
    """Temperature-weighted dataset-mixture plan (the standard
    multilingual mixing step): per stratum, the target weight is
    ``tokens^(1/T)`` normalized over strata — T=1 is proportional
    (high-resource strata dominate), T→∞ is uniform — and the
    acceptance rate is the one that hits ``weight * budget`` tokens,
    capped at 1 (a stratum smaller than its target share is taken
    whole; the standard mixing compromise). Feed the rates to
    :func:`hash_sample` to materialize the mix deterministically.

    Output per stratum: n_docs, n_tokens, weight, rate,
    expected_tokens.

    Determinism device: per-stratum scores are INTEGER floor(sqrt)
    values (T=2), so every cross-stratum sum is exact integer
    arithmetic — a float SUM's addition order differs between Spark
    partitions and the DuckDB oracle and can flip a ROUND at a ULP
    boundary; integers cannot. Only the final weight/rate divisions
    are floats, computed in a fixed expression order from exact
    integers. (A general-T variant would accept the float-sum risk or
    collect the tiny per-stratum frame; T=2 is the standard choice.)
    Scale shape: one integer-sum aggregation over the corpus plus
    arithmetic on the tiny per-stratum frame.
    """
    if temperature != 2.0:
        raise ValueError(
            "mixture_plan is specified for temperature=2.0 "
            "(integer-sqrt determinism device)"
        )
    per = (
        docs.select(
            F.col(stratum_col).alias("stratum"),
            F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("nt"),
        )
        .groupBy("stratum")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nt").cast("bigint").alias("n_tokens"),
        )
        .withColumn(
            "s", F.floor(F.sqrt(F.col("n_tokens").cast("double"))).cast("bigint")
        )
    )
    tot = per.agg(
        F.sum("s").cast("bigint").alias("z"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )
    weight = F.round(F.col("s") / F.col("z"), 6)
    out = per.crossJoin(F.broadcast(tot)).select(
        "stratum",
        "n_docs",
        "n_tokens",
        weight.alias("weight"),
        F.floor(F.col("total_tokens") * budget_frac)
        .cast("bigint")
        .alias("_budget"),
    )
    rate = F.round(
        F.least(
            F.lit(1.0),
            F.col("weight") * F.col("_budget") / F.col("n_tokens"),
        ),
        6,
    )
    return out.select(
        "stratum",
        "n_docs",
        "n_tokens",
        "weight",
        rate.alias("rate"),
    ).withColumn(
        "expected_tokens",
        F.floor(F.col("rate") * F.col("n_tokens")).cast("bigint"),
    )


def source_cap(
    docs: DataFrame,
    cap: int = 50,
    source_col: str = "source",
    quality_col: str = "n_chars",
    keep_columns: bool = False,
) -> DataFrame:
    """Per-source document cap — the over-representation guard every
    web-scale corpus applies (keep at most ``cap`` docs per
    domain/source so one crawl-heavy site can't dominate a mixture).
    Keeps the ``cap`` best docs per source, "best" = highest
    ``quality_col`` with doc_id tie-break, so the kept set is total-
    ordered and oracle-hashable. Returns (doc_id, source, rnk), or
    every input column plus ``rnk`` with ``keep_columns=True`` (the
    curation-pipeline composition wants the surviving rows, not a
    key list to join back — joining back would re-shuffle the rows a
    second time for nothing).

    Scale shape: the ``rank <= cap`` predicate over the window is
    planned as WindowGroupLimit (Spark >= 3.5): each input partition
    pre-prunes to its local top-``cap`` per source BEFORE the
    shuffle, so a hot source ships at most cap rows per upstream
    partition instead of its full row set — asserted in
    tests/test_plans.py. The shuffle key (source) is low-cardinality
    but the pre-prune bounds the skew.
    """
    w = Window.partitionBy(source_col).orderBy(
        F.col(quality_col).desc(), F.col("doc_id")
    )
    ranked = docs.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= cap
    )
    if keep_columns:
        return ranked
    return (
        ranked
        .select(
            "doc_id",
            F.col(source_col).alias("source"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )
