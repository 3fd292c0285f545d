"""Build an sf1-scale dataset (10x sf0.1) for scale rehearsals.

Replicates /root/testdata/sf0.1 ``REPLICAS`` times into ``OUT_DIR``
with per-replica key offsets so the workload CHARACTER is preserved,
not just the byte count:

- fact keys (orders/lineitem/part/supplier/customer/events ids) get a
  ``replica * 10_000_000`` offset -> joins fan out over 10x distinct
  keys instead of 10x-duplicated keys (which would inflate every group
  by 10x and understate shuffle width);
- dimension tables (region/nation) stay as-is, exactly like TPC-H
  scale factors keep dims fixed;
- document text gets a replica token interleaved every 5 words, so
  shingle/minhash/simhash near-dup structure sees 10x more DISTINCT
  docs rather than 10 near-identical copies of each (replica 0 is the
  untouched original);
- embeddings are rotated by the replica index -- norm-preserving but
  direction-changing, so ANN/near-dup sees 10x distinct vectors;
- event timestamps shift ``replica * 7s`` to avoid 10x ties on every
  window boundary.

Usage: python scripts/make_scale_data.py [OUT_DIR] [REPLICAS]
Defaults: /tmp/sf1 10. Writes one parquet file per table; safe to
re-run (overwrites). Runs in ~1 min with pandas; output ~10x sf0.1.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OFFSET = 10_000_000

KEY_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIM_TABLES = ("region", "nation")


def _interleave_token(text: str, token: str, every: int = 5) -> str:
    words = text.split(" ")
    out: list[str] = []
    for i, w in enumerate(words):
        if i and i % every == 0:
            out.append(token)
        out.append(w)
    return " ".join(out)


def _replica(name: str, df: pd.DataFrame, i: int) -> pd.DataFrame:
    if i == 0:
        return df
    rep = df.copy()
    for col in KEY_COLS.get(name, ()):
        rep[col] = rep[col] + i * OFFSET
    if name == "events":
        rep["ts"] = rep["ts"] + pd.Timedelta(seconds=7 * i)
    elif name == "documents":
        tok = f"r{i}"
        rep["text"] = rep["text"].map(lambda t: _interleave_token(t, tok))
        rep["n_chars"] = rep["text"].str.len()
    elif name == "embeddings":
        rep["embedding"] = rep["embedding"].map(
            lambda v: np.roll(np.asarray(v), i).tolist()
        )
    return rep


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    # Optional comma-separated table filter (4th arg): replicate only
    # the named fact tables at full scale and copy the sf0.1 ORIGINAL
    # for the rest, so table registration (which eagerly reads every
    # footer) still works. For a spot-check family that provably only
    # touches e.g. documents+events, this keeps a 1000x build to
    # minutes. The mixed-scale dir must only be used for queries bound
    # to the replicated tables — record which in the rehearsal notes.
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    os.makedirs(out_dir, exist_ok=True)

    for name in DIM_TABLES:
        src = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(src, f"{out_dir}/{name}.parquet")
        print(f"{name}: {src.num_rows} rows (dim, copied)")

    for name in KEY_COLS:
        src_tbl = pq.read_table(f"{SRC}/{name}.parquet")
        if only is not None and name not in only:
            pq.write_table(src_tbl, f"{out_dir}/{name}.parquet")
            print(f"{name}: {src_tbl.num_rows} rows (stand-in, sf0.1)")
            continue
        src = src_tbl.to_pandas()
        # Realistic row groups (128k rows): pyarrow's 1M-row default
        # wrote documents as ONE row group, and a Spark scan can only
        # parallelize down to row-group granularity — every byte-range
        # split whose midpoint misses the single group reads nothing,
        # so one task scanned all 500k docs while 29 idled (and
        # spread_for_compute's partition-count probe was fooled,
        # because the SPLIT count looked plentiful). Real ingest
        # pipelines control this at write time; the fixture must too.
        #
        # Replicas stream through one ParquetWriter (RAM stays at one
        # replica) — the pd.concat-everything form needs ~100 GB at
        # 1000 replicas.
        with pq.ParquetWriter(
            f"{out_dir}/{name}.parquet", src_tbl.schema
        ) as writer:
            for i in range(replicas):
                chunk = pa.Table.from_pandas(
                    _replica(name, src, i),
                    schema=src_tbl.schema,
                    preserve_index=False,
                )
                writer.write_table(chunk, row_group_size=131_072)
        n = pq.read_metadata(f"{out_dir}/{name}.parquet").num_rows
        print(f"{name}: {src_tbl.num_rows} -> {n} rows")


if __name__ == "__main__":
    main()
