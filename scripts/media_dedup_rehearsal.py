"""Scale rehearsal for the multimodal byte-block dedup family (r14).

Completes the "scale-storied" treatment for the third modality: the
VERDICT r13 depth-gap note observed text and embedding dedup carried
probe certifications at 1M-5M while multimodal had no dedup operator
at all. mm04/mm06 added the operators; this script certifies them at
the same 5M scale as the other two families.

Protocol (the incremental_dedup_rehearsal protocol, payload flavor):

- OLD corpus: N deterministic payloads synthesized IN SPARK — the
  same 30-token/50k-vocab text device as the text rehearsal, cast to
  binary (the payloads are opaque bytes to the operator; using the
  shared synthesis keeps the corpora comparable across families).
- NEW batch: M payloads = K TAIL-APPENDED copies of corpus seeds
  (payload + a 25-byte trailer — the appended-metadata dup class the
  block fingerprint targets; offset-aligned blocks are prefix-stable
  so every complete block of the seed survives) + (M-K) fresh
  payloads from a disjoint token stream. Mutant ids sit 10^10 beyond
  the corpus id space.
- arm B (one-time): media_block_index at
  suggest_lsh_sizing(N + M), written partitionBy(band).
- arm P (per-batch): media_incremental_pairs(new, old,
  index=read-back) — planted recall x/K, pair count, skew/over-cap
  lights, wall. The recurring cost.
- arm F (the alternative): media_near_dup_pairs(old ∪ new) at the
  same sizing — what every batch costs WITHOUT the index.

Expected recall is read against the S-curve exactly as the text
rehearsal does: with block_bytes=16 a ~180-byte payload yields ~12
complete + 1 partial blocks; the trailer-append pair's block-Jaccard
is |complete|/|union| (printed per run), and
lsh_band_recall(J, bands, rows) is the promise to compare against.

Usage:
    python scripts/media_dedup_rehearsal.py [N [M [K [ARMS]]]]
Defaults: 5_000_000 20_000 100 BPF. Scratch at
$MEDIA_REHEARSAL_SCRATCH (default /tmp/media_rehearsal), args-marker
protected like the text rehearsal. Results in BASELINE.md round-14.
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

SCRATCH = os.environ.get("MEDIA_REHEARSAL_SCRATCH", "/tmp/media_rehearsal")
BLOCK_BYTES = 16
TRAILER = "~trailer:edited-metadata~"  # 25 ASCII bytes


def _payloads(spark, prefix: str, start: int, n: int):
    # the shared text synthesis cast to binary: payloads are opaque
    # bytes to the operator, and sharing the device keeps the corpora
    # comparable across the text/embedding/media families
    return synth_docs(spark, prefix, start, n, id_name="media_id",
                      text_name="payload", binary=True)


def main() -> None:
    from kinesis_alerts_consumer_spark.operators.dedup import (
        lsh_band_recall,
        suggest_lsh_sizing,
    )
    from kinesis_alerts_consumer_spark.operators.multimodal import (
        media_block_index,
        media_incremental_pairs,
        media_near_dup_pairs,
    )
    from kinesis_alerts_consumer_spark.session import get_spark

    n_old = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    m_new = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    k_mut = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    arms = (sys.argv[4] if len(sys.argv) > 4 else "BPF").upper()
    spark = get_spark(master="local[32]", shuffle_partitions=32)

    seeds = planted_seeds(n_old, k_mut)
    planted = planted_pairs(n_old, k_mut)

    if "B" in arms or not os.path.exists(f"{SCRATCH}/old"):
        if os.path.exists(SCRATCH):
            shutil.rmtree(SCRATCH)
        old = _payloads(spark, "o:", 0, n_old)
        old.write.parquet(f"{SCRATCH}/old")
        old = spark.read.parquet(f"{SCRATCH}/old")
        mutants = old.filter(F.col("media_id").isin(seeds)).select(
            (F.col("media_id") + F.lit(MUTANT_OFFSET)).alias("media_id"),
            F.concat(F.col("payload"),
                     F.lit(TRAILER.encode())).alias("payload"),
        )
        fresh = _payloads(spark, "f:", n_old + 1_000_000, m_new - k_mut)
        mutants.unionByName(fresh).write.parquet(f"{SCRATCH}/new")
        write_marker(SCRATCH, n_old, m_new, k_mut)
    else:
        check_marker(
            SCRATCH, n_old, m_new, k_mut,
            "Re-run with arm B, or pass the original args.")
    if "P" in arms and "B" not in arms \
            and not os.path.exists(f"{SCRATCH}/index"):
        raise SystemExit("arm P without B needs a standing index")
    old = spark.read.parquet(f"{SCRATCH}/old")
    new = spark.read.parquet(f"{SCRATCH}/new")

    bands, rows = suggest_lsh_sizing(n_old + m_new)
    # the planted pair's block-Jaccard and the S-curve promise at it:
    # a seed payload of L bytes has c = L//B complete blocks (+1
    # partial); the trailered copy keeps all c, replaces the partial,
    # and appends ~(len(TRAILER)+L%B)/B more
    probe_len = old.select(
        F.avg(F.length("payload")).alias("l")).collect()[0]["l"]
    c = int(probe_len) // BLOCK_BYTES
    t1 = -(-int(probe_len) // BLOCK_BYTES)
    t2 = -(-(int(probe_len) + len(TRAILER)) // BLOCK_BYTES)
    j_est = c / (t1 + t2 - c)
    promise = lsh_band_recall(j_est, bands, rows)
    print(f"n_old={n_old} m_new={m_new} k_mut={k_mut} "
          f"sizing=({bands},{rows}) block_bytes={BLOCK_BYTES} "
          f"avg_len={probe_len:.0f} J_est={j_est:.3f} "
          f"s_curve_promise={promise:.3f}", flush=True)

    if "B" in arms:
        t0 = time.monotonic()
        media_block_index(
            old, block_bytes=BLOCK_BYTES, bands=bands,
            rows_per_band=rows,
        ).write.partitionBy("band").parquet(f"{SCRATCH}/index")
        print(f"[B build media_block_index] "
              f"wall={time.monotonic() - t0:.1f}s (one-time)",
              flush=True)

    if "P" in arms:
        idx = spark.read.parquet(f"{SCRATCH}/index")
        stats: dict = {}
        t0 = time.monotonic()
        pairs_df = media_incremental_pairs(
            new, old, block_bytes=BLOCK_BYTES, threshold=0.5,
            max_bucket=64, index=idx, stats=stats)
        pairs = {(r.a, r.b) for r in pairs_df.select("a", "b").collect()}
        wall = time.monotonic() - t0
        got = sum(p in pairs for p in planted)
        print(f"[P media probe] pairs={len(pairs)} "
              f"planted_recall={got}/{k_mut} stats={stats} "
              f"wall={wall:.1f}s (per-batch recurring cost)", flush=True)

    if "F" in arms:
        union = old.unionByName(new)
        fstats: dict = {}
        t0 = time.monotonic()
        verified = media_near_dup_pairs(
            union, block_bytes=BLOCK_BYTES, bands=bands,
            rows_per_band=rows, threshold=0.5, max_bucket=64,
            stats=fstats)
        fpairs = {(r.a, r.b) for r in verified.select("a", "b").collect()}
        wall = time.monotonic() - t0
        got = sum(p in fpairs for p in planted)
        print(f"[F full media re-dedup] pairs={len(fpairs)} "
              f"planted_recall={got}/{k_mut} stats={fstats} "
              f"wall={wall:.1f}s (per batch WITHOUT the index)",
              flush=True)


if __name__ == "__main__":
    main()
