#!/usr/bin/env python3
"""Chunked embeddings-only fixture generator for the >=10^7-vector scale
probes (VERDICT_r16 #5: the 3*10^7 hier exponent point). tools/gen_sf.py
builds the whole table as Python lists before one pq.write_table — at
30M x 64-dim that is ~50 GB of boxed floats, past this box's comfort —
so this variant streams numpy row-group chunks through a ParquetWriter:
O(chunk) memory, same schema (vec_id int64, embedding list<float32>,
label int32) and the same STRUCTURE (5% of vectors are +-0.01/dim
perturbations of one of the previous 1,000 — the planted near-dup
class), but a numpy RNG stream, NOT gen_sf.py's random.Random stream.
Like gen_sf.py --embeddings-only this is therefore a completion/
exponent-probe fixture, not an extension of any hash record.

Usage: python3 tools/gen_vec_chunked.py <n_vectors> <outdir>
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DIM = 64
CHUNK = 250_000
WINDOW = 1_000  # near-dup bases come from the trailing window


def main():
    n = int(sys.argv[1])
    out = sys.argv[2]
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    schema = pa.schema([
        ("vec_id", pa.int64()),
        ("embedding", pa.list_(pa.float32())),
        ("label", pa.int32()),
    ])
    writer = pq.ParquetWriter(f"{out}/embeddings.parquet", schema)
    tail = np.empty((0, DIM), dtype=np.float32)  # last WINDOW rows
    written = 0
    while written < n:
        m = min(CHUNK, n - written)
        vecs = rng.standard_normal((m, DIM)).astype(np.float32)
        # 5% near-dups: rows past the warmup window get replaced by a
        # perturbed copy of a vector in the preceding WINDOW rows. Bases
        # are resolved in index order within the chunk so an in-chunk
        # base that is itself a near-dup is already final — same
        # sequential semantics as gen_sf.py's vecs[i-1000..i-1] lookup.
        dup_mask = rng.random(m) < 0.05
        for i in np.flatnonzero(dup_mask):
            gi = written + i
            if gi <= 50:
                continue
            back = int(rng.integers(1, min(WINDOW, gi) + 1))
            bi = i - back
            base = vecs[bi] if bi >= 0 else tail[bi]
            vecs[i] = base + rng.uniform(-0.01, 0.01, DIM).astype(np.float32)
        writer.write_table(pa.table({
            "vec_id": pa.array(np.arange(written, written + m, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1), pa.float32()), DIM).cast(
                pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, m, dtype=np.int32)),
        }, schema=schema))
        tail = np.concatenate([tail, vecs])[-WINDOW:]
        written += m
        if written % 5_000_000 < CHUNK:
            print(f"  {written}/{n}", flush=True)
    writer.close()
    print(f"wrote {n} embeddings to {out}")


if __name__ == "__main__":
    main()
