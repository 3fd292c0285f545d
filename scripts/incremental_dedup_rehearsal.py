"""Scale rehearsal for llm40's incremental near-dup (r13).

Measures the operator's economic claim: deduping a NEW ingest batch
against an EXISTING corpus through the prebuilt
:func:`lsh_build_index` table costs a per-batch PROBE (one map-side
scan of the index, no corpus shuffle), while the naive alternative —
re-running the full :func:`lsh_candidate_pairs` + verify over
corpus ∪ batch — re-pays the whole corpus's signature/bucket pass on
every batch. Both arms must find the planted mutant pairs (recall is
the non-negotiable part; the wall-clock ratio is the claim).

Protocol (the committed lsh_recall_probe protocol, two-corpus
flavor):

- OLD corpus: N deterministic docs synthesized IN SPARK — 30 tokens
  drawn from a 50k vocab via xxhash64(id:pos), so re-runs are
  byte-identical and trigram background Jaccard is ~0 (no RNG, no
  data files). Written once to /tmp parquet; every arm scans the
  same bytes.
- NEW batch: M docs = K mutants of corpus seeds (ONE mid-doc token
  replaced, position 15 of 30 -> kills the 3 trigrams covering it:
  J3 = 25/31 ~= 0.806, right AT suggest_lsh_sizing's 0.8 design
  threshold so its >=0.95 recall promise applies — the
  lsh_recall_probe lesson: measure a sizing against the similarity
  band it was derived for) + (M-K) fresh docs from a disjoint token
  stream (prefix f:) that near-dups nothing. Mutant ids sit 10^10
  beyond the corpus id space.
- arm BUILD (one-time): lsh_build_index at suggest_lsh_sizing(N),
  written partitionBy(band) — the durable-artifact cost, paid once
  per corpus, amortized over every future batch.
- arm PROBE (per-batch): lsh_incremental_pairs(new, old,
  index=read-back) — planted recall x/K, pair count, over-cap
  stats, wall. THIS is the recurring cost.
- arm FULL (the alternative): lsh_candidate_pairs(old ∪ new) +
  jaccard_pairs verify at the same sizing — the llm03 path over the
  whole corpus, which a reader without the index pays per batch.
  Planted recall read on the same K pairs. Skippable via arms.

Usage:
    python scripts/incremental_dedup_rehearsal.py [N [M [K [ARMS]]]]
Defaults: 5_000_000 20_000 100 BPF (B=build, P=probe, F=full).
Results recorded in BASELINE.md round-13.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from rehearsal_common import (  # noqa: E402
    MUTANT_OFFSET,
    check_marker,
    planted_pairs,
    planted_seeds,
    synth_docs,
    write_marker,
)

# env-overridable so smoke runs can coexist with a standing 5M scratch
SCRATCH = os.environ.get("INCDEDUP_SCRATCH", "/tmp/incdedup_rehearsal")
MUTATE_POS = 15  # one mid-doc token -> J3 = 25/31 ~= 0.806


def main() -> None:
    from kinesis_alerts_consumer_spark.operators.dedup import (
        jaccard_pairs,
        lsh_build_index,
        lsh_candidate_pairs,
        lsh_incremental_pairs,
        suggest_lsh_sizing,
    )
    from kinesis_alerts_consumer_spark.session import get_spark

    n_old = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    m_new = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    k_mut = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    arms = (sys.argv[4] if len(sys.argv) > 4 else "BPF").upper()
    spark = get_spark(master="local[32]", shuffle_partitions=32)

    seeds = planted_seeds(n_old, k_mut)
    planted = planted_pairs(n_old, k_mut)

    # Re-synthesize only when the corpus is missing or the index is
    # being rebuilt (arms with B). A P- or F-only run REUSES the
    # existing scratch — that is the whole point of re-measuring the
    # recurring arms against a standing index (r13 review: the first
    # cut wiped SCRATCH unconditionally, so any arms subset with P
    # but not B crashed on the missing index). Reuse requires the
    # SAME (N, M, K) AND the same synthesis formula as the run that
    # wrote the scratch: seeds and planted pairs are derived from the
    # CURRENT argv through rehearsal_common, so a mismatch would
    # silently report recall against the wrong planted set
    # (ADVICE r13) — the shared args marker turns that into a refusal.
    if "B" in arms or not os.path.exists(f"{SCRATCH}/old"):
        if os.path.exists(SCRATCH):
            shutil.rmtree(SCRATCH)
        old = synth_docs(spark, "o:", 0, n_old)
        old.write.parquet(f"{SCRATCH}/old")
        old = spark.read.parquet(f"{SCRATCH}/old")
        seed_df = old.filter(F.col("doc_id").isin(seeds))
        mutants = seed_df.select(
            (F.col("doc_id") + F.lit(MUTANT_OFFSET)).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split("text", " "),
                    lambda w, i: F.when(i == MUTATE_POS,
                                        F.lit("MUTANT")).otherwise(w),
                ),
                " ",
            ).alias("text"),
        )
        fresh = synth_docs(spark, "f:", n_old + 1_000_000,
                           m_new - k_mut)
        mutants.unionByName(fresh).write.parquet(f"{SCRATCH}/new")
        write_marker(SCRATCH, n_old, m_new, k_mut)
    else:
        check_marker(
            SCRATCH, n_old, m_new, k_mut,
            "Re-run with arm B to rebuild, or pass the original args.")
    if "P" in arms and "B" not in arms \
            and not os.path.exists(f"{SCRATCH}/index"):
        raise SystemExit(
            "arm P without B needs a standing index — run arms with "
            "B first (scratch at " + SCRATCH + ")")
    old = spark.read.parquet(f"{SCRATCH}/old")
    new = spark.read.parquet(f"{SCRATCH}/new")

    bands, rows = suggest_lsh_sizing(n_old + m_new)
    print(f"n_old={n_old} m_new={m_new} k_mut={k_mut} "
          f"sizing=({bands},{rows}) shingle=3", flush=True)

    if "B" in arms:
        t0 = time.monotonic()
        lsh_build_index(old, bands=bands, rows_per_band=rows, shingle=3) \
            .write.partitionBy("band").parquet(f"{SCRATCH}/index")
        print(f"[B build-index] wall={time.monotonic() - t0:.1f}s "
              "(one-time, amortized over every future batch)",
              flush=True)

    if "P" in arms:
        idx = spark.read.parquet(f"{SCRATCH}/index")
        stats: dict = {}
        t0 = time.monotonic()
        pairs_df = lsh_incremental_pairs(
            new, old, shingle=3, threshold=0.5, max_bucket=64,
            index=idx, stats=stats)
        pairs = {(r.a, r.b) for r in pairs_df.select("a", "b").collect()}
        wall = time.monotonic() - t0
        got = sum(p in pairs for p in planted)
        print(f"[P probe] pairs={len(pairs)} "
              f"planted_recall={got}/{k_mut} stats={stats} "
              f"wall={wall:.1f}s (per-batch recurring cost)", flush=True)

    if "F" in arms:
        union = old.unionByName(new)
        fstats: dict = {}
        t0 = time.monotonic()
        cands = lsh_candidate_pairs(
            union, bands=bands, rows_per_band=rows, shingle=3,
            max_bucket=64, stats=fstats)
        verified = jaccard_pairs(union, candidates=cands, shingle=3,
                                 threshold=0.5)
        fpairs = {(r.a, r.b) for r in verified.select("a", "b").collect()}
        wall = time.monotonic() - t0
        got = sum(p in fpairs for p in planted)
        print(f"[F full-rededup] pairs={len(fpairs)} "
              f"planted_recall={got}/{k_mut} stats={fstats} "
              f"wall={wall:.1f}s (what every batch costs WITHOUT the "
              "index)", flush=True)


if __name__ == "__main__":
    main()
