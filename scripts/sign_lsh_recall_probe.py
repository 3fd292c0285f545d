"""Planted-recall probe for the sign-LSH embedding dedup surface.

VERDICT r11 item 5: the r11 probe (scripts/lsh_recall_probe.py)
certified the MinHash path's recall at 5M docs, but the sign-LSH
family — ``embedding_near_dup_pairs`` (llm05) and ``semantic_dedup``
(llm27) share the bucket machinery — has the same structural hazard:
``max_bucket`` drops over-occupied buckets WHOLESALE, and recall at
the 0.9-cosine threshold was asserted only at fixture scale (2k
vectors). This probe measures it at >= 1M vectors and exercises the
r12 ``stats`` warning light on both functions.

Protocol (the committed lsh_recall_probe protocol, embedding flavor):

- synthesize N deterministic pseudo-random vectors IN SPARK (hash-
  based uniform [-1, 1] per coordinate — no data files needed, no RNG
  so re-runs are byte-identical), write once to /tmp parquet so every
  arm scans the same bytes;
- plant 20 pairs at an EXACT target cosine: mutant = cos(t)*v_hat +
  sin(t)*w_hat with w a deterministic unit vector orthogonal to v
  (Gram-Schmidt on a hash vector), so cosine(v, mutant) == COS_TARGET
  to float precision — planted similarity is a construction, not a
  hope (the text probe had to reason J3 from mutation rate; here the
  geometry is exact). Mutant ids sit 10^10 beyond the corpus id
  space;
- arm A (the promise): adaptive sizing (sign_bits=None — llm05's
  gated default) with the default cap; report planted recall x/20,
  candidate-pair count, over-cap stats, wall;
- arm B (the hazard): a fixed sign_bits=4 at the same cap — at 1M
  vectors every one of the 16 buckets holds ~65k members, the cap
  drops ALL of them, recall is 0/20, and the ONLY signal is the
  stats light (before r12 this was silent). The uncapped fixed-4-bit
  arm is deliberately NOT run: n^2/16 pairs is ~7e10 at 1M — the
  exact explosion the cap exists to prevent;
- arm C (llm27): semantic_dedup at adaptive sizing must drop >= the
  20 planted mutants (each mutant's seed has a lower id in the same
  bucket when bucketing keeps them together);
- arm D (the remedy): hyperplane_lsh_pairs with sizing="auto" — the
  banded random-hyperplane form whose suggest_hyperplane_sizing
  holds the stated recall target as n grows (S-curve with ``bands``
  independent chances, vs the single band whose recall is p^k).

Perturbation vs sign buckets: a cos-0.93 rotation flips any leading
coordinate whose magnitude is under ~sin(t)~0.37/sqrt(D); with k
adaptive bits a planted pair lands in one bucket only if NO flip hits
the leading k dims — that survival probability IS the recall this
probe measures (multi-probe, similarity.lsh_topk, is the recall lever
when it must be higher).

Usage:
    python scripts/sign_lsh_recall_probe.py [N [DIM [COS_TARGET [ARMS]]]]
Defaults: 1_050_000 24 0.93 ABCD (ARMS selects which arms run, e.g.
"D" to re-run only the banded arm). Results recorded in BASELINE.md
round-12 notes.
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SCRATCH = "/tmp/sign_lsh_probe"
MUTANT_OFFSET = 10_000_000_000


def _hash_coord(vid_col, j: int):
    """Deterministic uniform [-1, 1): (xxhash64(id:j) mod 2e6)/1e6 - 1."""
    h = F.xxhash64(F.concat(vid_col.cast("string"), F.lit(f":{j}")))
    return (F.pmod(h, F.lit(2_000_000)) / F.lit(1_000_000.0)) - F.lit(1.0)


def _np_vector(vid: int, dim: int, spark) -> np.ndarray:
    """The same coordinates, read back from Spark for exactness (the
    SQL xxhash64 seed/mix is not worth reimplementing in numpy)."""
    row = (
        spark.range(vid, vid + 1)
        .select(F.array(*[_hash_coord(F.col("id"), j)
                          for j in range(dim)]).alias("v"))
        .collect()[0]
    )
    return np.asarray(row["v"], dtype=np.float64)


def main() -> None:
    from kinesis_alerts_consumer_spark.operators.dedup import (
        adaptive_sign_bits,
        embedding_near_dup_pairs,
    )
    from kinesis_alerts_consumer_spark.operators.similarity import (
        semantic_dedup,
    )
    from kinesis_alerts_consumer_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_050_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    cos_t = float(sys.argv[3]) if len(sys.argv) > 3 else 0.93
    arms = (sys.argv[4] if len(sys.argv) > 4 else "ABCD").upper()
    spark = get_spark(master="local[32]", shuffle_partitions=32)

    # --- corpus: n deterministic vectors + 20 planted mutants -------
    base = spark.range(0, n, 1, 32).select(
        F.col("id").alias("vec_id"),
        F.array(*[_hash_coord(F.col("id"), j).alias(f"c{j}")
                  for j in range(dim)]).alias("embedding"),
    )
    seeds = [k * (n // 20) + 7 for k in range(20)]
    theta = math.acos(cos_t)
    mutant_rows = []
    for vid in seeds:
        v = _np_vector(vid, dim, spark)
        v_hat = v / np.linalg.norm(v)
        # deterministic direction, orthogonalized against v
        w = np.asarray([math.sin(1.0 + 0.7 * j + 0.013 * vid)
                        for j in range(dim)])
        w = w - (w @ v_hat) * v_hat
        w_hat = w / np.linalg.norm(w)
        m = math.cos(theta) * v_hat + math.sin(theta) * w_hat
        # scale back to |v| so coordinate magnitudes stay corpus-like
        m = m * np.linalg.norm(v)
        assert abs(float(m @ v / (np.linalg.norm(m) * np.linalg.norm(v)))
                   - cos_t) < 1e-9
        mutant_rows.append((vid + MUTANT_OFFSET, [float(x) for x in m]))
    mutants = spark.createDataFrame(
        mutant_rows, "vec_id long, embedding array<double>")
    planted = [(vid, vid + MUTANT_OFFSET) for vid in seeds]

    if os.path.exists(SCRATCH):
        shutil.rmtree(SCRATCH)
    base.unionByName(mutants).write.parquet(SCRATCH)
    emb = spark.read.parquet(SCRATCH)
    n_total = emb.count()
    k_adaptive = adaptive_sign_bits(n_total)
    print(f"n={n_total} dim={dim} cos_target={cos_t} "
          f"adaptive_sign_bits={k_adaptive}", flush=True)

    def arm(label: str, sign_bits, max_bucket) -> None:
        stats: dict = {}
        t0 = time.monotonic()
        pairs_df = embedding_near_dup_pairs(
            emb, sign_bits=sign_bits, threshold=0.9,
            max_bucket=max_bucket, stats=stats)
        hits = {
            (r.a, r.b)
            for r in pairs_df.filter(
                F.col("b") >= MUTANT_OFFSET).collect()
        }
        n_pairs = pairs_df.count()
        wall = time.monotonic() - t0
        got = sum(p in hits for p in planted)
        print(f"[{label}] sign_bits={stats.get('sign_bits', sign_bits)} "
              f"max_bucket={max_bucket} pairs={n_pairs} "
              f"planted_recall={got}/20 stats={stats} wall={wall:.1f}s",
              flush=True)

    # A: the gated default — adaptive bits, default cap
    if "A" in arms:
        arm("A adaptive", None, 1024)
    # B: the hazard — fixed coarse bits; the cap eats EVERYTHING and
    # the stats light is the only witness
    if "B" in arms:
        arm("B fixed-4", 4, 1024)

    # C: semantic_dedup (llm27) — planted mutants must be dropped
    if "C" in arms:
        sstats: dict = {}
        t0 = time.monotonic()
        rows = semantic_dedup(emb, threshold=0.9, stats=sstats).collect()
        wall = time.monotonic() - t0
        dropped = sum(r.n_members - r.n_kept for r in rows)
        members = sum(r.n_members for r in rows)
        print(f"[C semdedup] clusters={len(rows)} members={members} "
              f"dropped={dropped} (planted=20) stats={sstats} "
              f"wall={wall:.1f}s", flush=True)

    # D: the banded remedy at its own suggested sizing (threshold 0.9
    # — the operator default; the planted 0.93 pairs sit above it, so
    # the S-curve promise at 0.93 is even higher than target_recall).
    # The planted-recall read and the pair count are SEPARATE jobs so
    # a count-side failure cannot take the recall number with it.
    if "D" in arms:
        from kinesis_alerts_consumer_spark.operators.dedup import (
            hyperplane_lsh_pairs,
        )

        dstats: dict = {}
        t0 = time.monotonic()
        dpairs = hyperplane_lsh_pairs(
            emb, sizing="auto", threshold=0.9, dim=dim, stats=dstats)
        hits = {
            (r.a, r.b)
            for r in dpairs.filter(F.col("b") >= MUTANT_OFFSET).collect()
        }
        got = sum(p in hits for p in planted)
        print(f"[D banded auto] sizing=({dstats.get('bands')},"
              f"{dstats.get('bits_per_band')}) "
              f"planted_recall={got}/20 stats={dstats} "
              f"recall_wall={time.monotonic() - t0:.1f}s", flush=True)
        # The diagnostic total-pair count is a SECOND full execution
        # of the pre-distinct candidate volume; at 1.05M it filled
        # this box's 69G shuffle scratch (BASELINE round-12 footnote
        # b). PROBE_SKIP_COUNT=1 runs the recall read only — the 5M
        # certification (VERDICT r12 item 6) needs recall + stats,
        # not the occupancy-model check the count re-measures.
        if os.environ.get("PROBE_SKIP_COUNT"):
            print("[D banded auto] pairs=skipped (PROBE_SKIP_COUNT)",
                  flush=True)
        else:
            t0 = time.monotonic()
            n_pairs = dpairs.count()
            print(f"[D banded auto] pairs={n_pairs} "
                  f"count_wall={time.monotonic() - t0:.1f}s", flush=True)

    # I: the r13 incremental form — the 20 mutants arrive as a NEW
    # batch probing a prebuilt hyperplane index of the base corpus
    # (llm41's serving shape). Same planted pairs, so recall is
    # directly comparable to arm D; the walls split into the one-time
    # index build and the per-batch probe — the whole point of the
    # operator vs re-running D on corpus ∪ batch per batch.
    if "I" in arms:
        from kinesis_alerts_consumer_spark.operators.dedup import (
            hyperplane_build_index,
            hyperplane_incremental_pairs,
            hll_buffered_count,
            suggest_hyperplane_sizing,
        )

        # slice BOTH sides from the shared parquet (r13 review: the
        # pre-write base/mutants frames are synthesis LINEAGES — the
        # build and every verify consumer would re-run the xxhash
        # coordinate expressions instead of scanning the same bytes
        # as arms A-D, and the walls would measure synthesis, not
        # the serving shape)
        old_emb = emb.filter(F.col("vec_id") < MUTANT_OFFSET)
        new_emb = emb.filter(F.col("vec_id") >= MUTANT_OFFSET)
        ib, ir = suggest_hyperplane_sizing(hll_buffered_count(n))
        idx_path = SCRATCH + "_hpindex"
        if os.path.exists(idx_path):
            shutil.rmtree(idx_path)
        t0 = time.monotonic()
        hyperplane_build_index(
            old_emb, bands=ib, bits_per_band=ir, dim=dim
        ).write.partitionBy("band").parquet(idx_path)
        t_build = time.monotonic() - t0
        idx = spark.read.parquet(idx_path)
        istats: dict = {}
        t0 = time.monotonic()
        ip = hyperplane_incremental_pairs(
            new_emb, old_emb, dim=dim, threshold=0.9, index=idx,
            stats=istats)
        got_pairs = {(r.a, r.b) for r in ip.collect()}
        t_probe = time.monotonic() - t0
        got = sum((a, b) in got_pairs for a, b in planted)
        print(f"[I incremental] sizing=({ib},{ir}) "
              f"build_wall={t_build:.1f}s probe_wall={t_probe:.1f}s "
              f"pairs={len(got_pairs)} planted_recall={got}/20 "
              f"stats={istats}", flush=True)


if __name__ == "__main__":
    main()
