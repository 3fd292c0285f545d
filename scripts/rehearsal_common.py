"""Shared synthesis + planted-set + args-marker helpers for the
rehearsal scripts (r14 review finding).

incremental_dedup_rehearsal.py, stream_incremental_rehearsal.py, and
media_dedup_rehearsal.py previously each carried a verbatim copy of
the corpus-synthesis device (30 tokens from a 50k vocab via
xxhash64(id:pos)), the planted-seed formula, and the args-marker
stamp/refuse logic. That duplication was the exact silent-mis-scoring
hazard the marker exists to refuse: the STREAM script re-derives the
planted set for a scratch written by the TEXT script, and the marker
compared only (N, M, K) argv — a drift in the seed formula or the
synthesis constants in one copy would score recall against a planted
set the scratch does not contain, silently. One definition site
closes that surface: every script now derives seeds, corpora, and
marker stamps from HERE, and the marker stamp embeds a formula
version so a future change to the synthesis invalidates standing
scratches instead of mis-scoring against them.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

MUTANT_OFFSET = 10_000_000_000
VOCAB = 50_000
DOC_TOKENS = 30

# Bumped whenever the synthesis device or the planted-seed formula
# changes; part of the marker stamp, so a standing scratch written by
# an older formula is REFUSED rather than mis-scored.
SYNTH_VERSION = "v1"


def token_expr(prefix: str, vid_col, j: int):
    """Deterministic token j of doc vid: t<pmod(xxhash64,VOCAB)>."""
    h = F.xxhash64(F.concat(F.lit(prefix), vid_col.cast("string"),
                            F.lit(f":{j}")))
    return F.concat(F.lit("t"), F.pmod(h, F.lit(VOCAB)).cast("string"))


def synth_docs(spark, prefix: str, start: int, n: int,
               id_name: str = "doc_id", text_name: str = "text",
               binary: bool = False):
    """N deterministic 30-token docs synthesized IN SPARK (no RNG, no
    data files; re-runs are byte-identical). ``binary=True`` casts the
    text to binary for the media family — same bytes, opaque type."""
    text = F.concat_ws(
        " ", *[token_expr(prefix, F.col("id"), j)
               for j in range(DOC_TOKENS)])
    if binary:
        text = text.cast("binary")
    return spark.range(start, start + n, 1, 32).select(
        F.col("id").alias(id_name), text.alias(text_name))


def planted_seeds(n_old: int, k_mut: int) -> list[int]:
    """Corpus ids whose mutants are planted into the new batch."""
    return [k * (n_old // k_mut) + 3 for k in range(k_mut)]


def planted_pairs(n_old: int, k_mut: int) -> list[tuple[int, int]]:
    """(seed_id, mutant_id) ground truth; mutants sit MUTANT_OFFSET
    beyond the corpus id space."""
    return [(s, s + MUTANT_OFFSET) for s in planted_seeds(n_old, k_mut)]


def marker_stamp(n_old: int, m_new: int, k_mut: int) -> str:
    return f"{n_old} {m_new} {k_mut} {SYNTH_VERSION}"


def write_marker(scratch: str, n_old: int, m_new: int,
                 k_mut: int) -> None:
    with open(os.path.join(scratch, "args_marker.txt"), "w") as fh:
        fh.write(marker_stamp(n_old, m_new, k_mut))


def read_marker(scratch: str) -> str:
    marker = os.path.join(scratch, "args_marker.txt")
    if not os.path.exists(marker):
        return "<missing>"
    return open(marker).read().strip()


def check_marker(scratch: str, n_old: int, m_new: int, k_mut: int,
                 hint: str) -> None:
    """Refuse to score against a scratch written under different args
    or an older synthesis formula (ADVICE r13)."""
    stamp = marker_stamp(n_old, m_new, k_mut)
    written = read_marker(scratch)
    if written != stamp:
        raise SystemExit(
            f"scratch at {scratch} was written for ({written}), run "
            f"asked for ({stamp}) — recall would be scored against "
            f"the wrong planted set. {hint}")
