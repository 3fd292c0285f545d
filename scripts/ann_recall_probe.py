"""Recall-at-scale probe for the ANN ladder (llm06/07/13).

The gated ANN queries pin fixture-scale sizings — llm13 IVF with 8
centroids / nprobe 2, llm07 sign-LSH with 4 bits / radius 1 — and the
recall@5 >= 0.8 pytest gate runs at 2k vectors. Same hazard class the
r12 sign-LSH probe closed for the dedup family: does the sizing story
hold at 1M, and what must scale with n?

Corpus: the dedup probe's uniform vectors are the WRONG venue for ANN
— with iid coordinates all pairwise distances concentrate and no
index can prune at high recall (measured here too: see the uniform
caveat in BASELINE.md). ANN exists for CLUSTERED data, so this probe
builds it: K cluster centers (hash-derived), vector i belongs to
cluster hash(i) mod K with coordinates center + NOISE_SCALE * noise,
all deterministic column math (no RNG, no files besides one parquet
snapshot). In-cluster cosine ~0.85-0.9, cross-cluster ~0.5 at the
default NOISE_SCALE.

Queries: the 20 lowest vec_ids (brute/IVF/LSH all use the same
query_filter device as the gated queries). Ground truth = brute-force
cosine top-k (exact, 20 x n cosines). Each arm reports recall@5 vs
brute and its candidate volume per query.

Arms:
- IVF at the gated literal (8, 2) — at 1M this probes 2 cells of 8,
  i.e. scores ~25% of the corpus: weak pruning, recall depends on how
  well 8 arbitrary members span K clusters;
- IVF at the sqrt rule (n_centroids ~ sqrt(n) = 1024, nprobe 32) —
  the standard inverted-file sizing: ~3% of the corpus scored;
- LSH at the gated literal (4 bits, radius 1) — probes 5 of 16
  buckets = ~31% of the corpus: cost, not recall, is its failure;
- LSH at adaptive bits (dedup.adaptive_sign_bits ~ 15-16 at 1M,
  radius 2) — probes 1+k+C(k,2) of 2^k buckets: ~0.4% of the corpus.

Usage:
    python scripts/ann_recall_probe.py [N [DIM [K_CLUSTERS [ARMS]]]]
Defaults: 1_000_000 24 1000 ALL (ARMS substring-selects:
B=brute-only-sanity, I=ivf-literal, J=ivf-sqrt, L=lsh-literal,
M=lsh-adaptive, P=pq; ALL = BIJLM — P opt-in, its dim-24/m=8
sub_len=3 differs from the dim-64 gated venue). Results in
BASELINE.md round-12.
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

SCRATCH = "/tmp/ann_probe"
NOISE_SCALE = 0.35


def _h(col_or_lit, tag: str):
    """Deterministic uniform [-1, 1) from xxhash64(x:tag)."""
    h = F.xxhash64(F.concat(col_or_lit.cast("string"), F.lit(f":{tag}")))
    return (F.pmod(h, F.lit(2_000_000)) / F.lit(1_000_000.0)) - F.lit(1.0)


def main() -> None:
    from kinesis_alerts_consumer_spark.operators.dedup import (
        adaptive_sign_bits,
    )
    from kinesis_alerts_consumer_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_ivf,
        cosine_topk_lsh,
    )
    from kinesis_alerts_consumer_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    k_clusters = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    arms = (sys.argv[4] if len(sys.argv) > 4 else "ALL").upper()
    if arms == "ALL":
        arms = "BIJLM"
    spark = get_spark(master="local[32]", shuffle_partitions=32)

    cl = F.pmod(F.xxhash64(F.col("id")), F.lit(k_clusters))
    coords = [
        (_h(cl, f"c{j}") + F.lit(NOISE_SCALE) * _h(F.col("id"), f"n{j}"))
        .alias(f"x{j}")
        for j in range(dim)
    ]
    base = spark.range(0, n, 1, 32).select(
        F.col("id").alias("vec_id"),
        F.array(*coords).alias("embedding"),
        F.lit(0).alias("label"),
    )
    if os.path.exists(SCRATCH):
        shutil.rmtree(SCRATCH)
    base.write.parquet(SCRATCH)
    emb = spark.read.parquet(SCRATCH)
    n_total = emb.count()
    print(f"n={n_total} dim={dim} k_clusters={k_clusters}", flush=True)

    k, num_q = 5, 20

    t0 = time.monotonic()
    truth_rows = cosine_topk(emb, k=k, num_queries=num_q).collect()
    truth = {}
    for r in truth_rows:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    t_brute = time.monotonic() - t0
    # sanity: a query's top-5 should be in-cluster at this noise scale
    print(f"[brute] wall={t_brute:.1f}s queries={len(truth)} "
          f"(ground truth)", flush=True)

    def recall(rows) -> float:
        got = {}
        for r in rows:
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        per_q = [len(truth[q] & got.get(q, set())) / len(truth[q])
                 for q in truth]
        return sum(per_q) / len(per_q)

    def arm(label: str, fn) -> None:
        t0 = time.monotonic()
        rows = fn().collect()
        wall = time.monotonic() - t0
        print(f"[{label}] recall@{k}={recall(rows):.2f} wall={wall:.1f}s",
              flush=True)

    if "I" in arms:
        arm("IVF gated (8,2) ~25% scored",
            lambda: cosine_topk_ivf(emb, k=k, num_queries=num_q,
                                    n_centroids=8, nprobe=2))
    if "J" in arms:
        c = max(8, int(math.isqrt(n_total)))
        arm(f"IVF sqrt ({c},32) ~{32 / c:.1%} scored",
            lambda: cosine_topk_ivf(emb, k=k, num_queries=num_q,
                                    n_centroids=c, nprobe=32))
    if "L" in arms:
        arm("LSH gated (4 bits, r1) ~31% scored",
            lambda: cosine_topk_lsh(emb, k=k, num_queries=num_q,
                                    sign_bits=4, probe_radius=1))
    if "M" in arms:
        bits = adaptive_sign_bits(n_total)
        frac = (1 + bits + bits * (bits - 1) // 2) / 2 ** bits
        arm(f"LSH adaptive ({bits} bits, r2) ~{frac:.2%} scored",
            lambda: cosine_topk_lsh(emb, k=k, num_queries=num_q,
                                    sign_bits=bits, probe_radius=2))
    if "P" in arms:
        from kinesis_alerts_consumer_spark.operators.similarity import (
            cosine_topk_pq,
        )

        # PQ scans every code (100% of rows, ~16x fewer bytes): the
        # gated llm24 sizing, then a deeper shortlist — ADC coarseness
        # (16 centroids/subspace) is the recall limit, shortlist the
        # recovery lever
        arm("PQ gated (m=8,k=16,sl=200)",
            lambda: cosine_topk_pq(emb, k=k, num_queries=num_q,
                                   m=8, codebook_k=16, shortlist=200))
        arm("PQ deep shortlist (m=8,k=16,sl=2000)",
            lambda: cosine_topk_pq(emb, k=k, num_queries=num_q,
                                   m=8, codebook_k=16, shortlist=2000))


if __name__ == "__main__":
    main()
