"""Planted-recall probe for the MinHash-LSH near-dup surface.

End-to-end validation of the two r11 additions on REAL corpus scale:
``lsh_candidate_pairs``'s ``stats`` warning light (does the bucket cap
fire where recall is actually lost?) and ``suggest_lsh_sizing`` (does
the derived (bands, rows_per_band) hold recall where the fixed (2, 2)
drops it?).

Protocol (the r9/r10 sfdoc lever protocol, now committed instead of
ad-hoc): plant 20 near-dup pairs by mutating every Nth token of 20
seed documents spread across the corpus by doc_id hash (NOT the 20
lowest ids — those all land in replica 0 and share boilerplate
clusters that depress recall for every sizing; mutant doc_id =
original + 10^11 — BEYOND the corpus id space:
make_scale_data replica offsets reach ~10^10, and a 10^9 offset
collides with the id of the seed's own replica+100 twin, silently
aliasing two texts under one doc_id), run
candidates -> exact-Jaccard verify >= 0.5, report candidate count,
over-cap stats, verified-pair count, planted recall x/20, and wall.
Shingle defaults to 3 — llm03's gated parameter. The mutation rate
maps to shingle Jaccard: each mutated token kills the 3 trigrams
covering it, so every-12th gives J3 ~= (9/12)/(15/12) = 0.6, above
the 0.5 verify threshold with margin. (Every-7th, the first draft,
gives J3 ~= 0.4 — planted pairs that cannot even pass verify; and a
shingle=1 run is a DEGENERATE venue on these fixtures, whose unigram
background Jaccard is ~0.6 — at that level near-dup search is
structurally meaningless and every banding drowns in over-cap
buckets, which the r11 probe measured: 0/20 at both (2,2) and (8,5)
with the stats light reporting 10-37M dropped member slots.)

Usage:
    python scripts/lsh_recall_probe.py DOCS_DIR [BANDS ROWS [MAX_BUCKET [SHINGLE [MUTATE_EVERY]]]]

MUTATE_EVERY sets the planted-pair similarity (default 12 -> J3 ~0.6,
just above llm03's 0.5 verify line; 33 -> J3 ~0.83, at the sizing
helper's default 0.8 threshold where its >=0.95 recall promise
applies — measure each sizing against the similarity band it was
derived for, or the S-curve makes the result look like a failure).

With BANDS/ROWS omitted, the sizing comes from
``suggest_lsh_sizing(n_docs)`` — the probe then certifies the
helper's own suggestion.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from kinesis_alerts_consumer_spark.operators.dedup import (
        jaccard_pairs,
        lsh_candidate_pairs,
        suggest_lsh_sizing,
    )
    from kinesis_alerts_consumer_spark.session import get_spark
    from kinesis_alerts_consumer_spark.sources.tables import load_table

    docs_dir = sys.argv[1]
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    base = load_table(spark, docs_dir, "documents").select("doc_id", "text")
    n_docs = base.count()

    if len(sys.argv) > 3:
        bands, rows = int(sys.argv[2]), int(sys.argv[3])
        source = "cli"
    else:
        bands, rows = suggest_lsh_sizing(n_docs + 20)
        source = "suggest_lsh_sizing"
    max_bucket = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    shingle = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    every = int(sys.argv[6]) if len(sys.argv) > 6 else 12
    print(f"n_docs={n_docs} sizing=({bands},{rows}) from {source} "
          f"max_bucket={max_bucket} shingle={shingle} "
          f"mutate_every={every}", flush=True)

    # plant: every Nth token replaced; killing 3 trigrams per hit
    # puts the pair at J3 ~= (N-3)/(N+3). Seeds spread across the
    # corpus by hash order (lowest-doc_id seeds all land in replica 0
    # and can share one boilerplate cluster — measured r11: they
    # depressed recall for EVERY sizing)
    seeds = base.orderBy(F.xxhash64("doc_id")).limit(20)
    mutants = seeds.select(
        (F.col("doc_id") + F.lit(100_000_000_000)).alias("doc_id"),
        F.array_join(
            F.transform(
                F.split("text", " "),
                lambda w, i: F.when(i % every == every - 1,
                                    F.lit("MUTANT")).otherwise(w),
            ),
            " ",
        ).alias("text"),
    )
    planted = [(r.doc_id, r.doc_id + 100_000_000_000)
               for r in seeds.select("doc_id").collect()]
    docs = base.unionByName(mutants)

    stats: dict = {}
    t0 = time.monotonic()
    cands = lsh_candidate_pairs(
        docs, bands=bands, rows_per_band=rows, shingle=shingle,
        max_bucket=max_bucket, stats=stats)
    n_cands = cands.count()
    t_cand = time.monotonic() - t0
    print(f"candidates={n_cands} ({n_cands / max(n_docs, 1):.2f}/doc) "
          f"cand_stage={t_cand:.1f}s stats={stats}", flush=True)

    t0 = time.monotonic()
    verified = jaccard_pairs(
        docs, candidates=cands, shingle=shingle, threshold=0.5)
    pairs = {(r.a, r.b) for r in
             verified.select("a", "b").collect()}
    t_ver = time.monotonic() - t0
    got = sum((a, b) in pairs for a, b in planted)
    print(f"pairs>=0.5={len(pairs)} verify_stage={t_ver:.1f}s "
          f"planted_recall={got}/20 wall={t_cand + t_ver:.1f}s", flush=True)


if __name__ == "__main__":
    main()
