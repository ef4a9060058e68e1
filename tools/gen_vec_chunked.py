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

Usage: python3 tools/gen_vec_chunked.py <n_vectors> <outdir> [--pairs-only]

--pairs-only replays the SAME RNG stream but writes only the
planted_pairs side table (base_id, dup_id) — for retrofitting a fixture
generated before the side table existed (VERDICT_r17 #6) without
rewriting gigabytes of identical vectors. The replay consumes every
draw the vector path consumes, so the recorded pairs are exactly the
ones in the existing embeddings.parquet.
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
    pairs_only = len(sys.argv) > 3 and sys.argv[3] == "--pairs-only"
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    schema = pa.schema([
        ("vec_id", pa.int64()),
        ("embedding", pa.list_(pa.float32())),
        ("label", pa.int32()),
    ])
    pairs_schema = pa.schema([
        ("base_id", pa.int64()),
        ("dup_id", pa.int64()),
    ])
    writer = (None if pairs_only
              else pq.ParquetWriter(f"{out}/embeddings.parquet", schema))
    pwriter = pq.ParquetWriter(f"{out}/planted_pairs.parquet", pairs_schema)
    tail = np.empty((0, DIM), dtype=np.float32)  # last WINDOW rows
    written = 0
    n_pairs = 0
    while written < n:
        m = min(CHUNK, n - written)
        vecs = rng.standard_normal((m, DIM)).astype(np.float32)
        # 5% near-dups: rows past the warmup window get replaced by a
        # perturbed copy of a vector in the preceding WINDOW rows. Bases
        # are resolved in index order within the chunk so an in-chunk
        # base that is itself a near-dup is already final — same
        # sequential semantics as gen_sf.py's vecs[i-1000..i-1] lookup.
        # The planted pair (base gi, dup gi) is recorded as a side table;
        # recording consumes no RNG draws (VERDICT_r17 #6).
        dup_mask = rng.random(m) < 0.05
        chunk_pairs = []
        for i in np.flatnonzero(dup_mask):
            gi = written + i
            if gi <= 50:
                continue
            back = int(rng.integers(1, min(WINDOW, gi) + 1))
            bi = i - back
            base = vecs[bi] if bi >= 0 else tail[bi]
            vecs[i] = base + rng.uniform(-0.01, 0.01, DIM).astype(np.float32)
            chunk_pairs.append((written + bi, gi))  # tail[-k] is id written-k
        if writer is not None:
            writer.write_table(pa.table({
                "vec_id": pa.array(np.arange(written, written + m, dtype=np.int64)),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(vecs.reshape(-1), pa.float32()), DIM).cast(
                    pa.list_(pa.float32())),
                "label": pa.array(rng.integers(0, 10, m, dtype=np.int32)),
            }, schema=schema))
        else:
            # consume the label draws so the replayed stream stays aligned
            rng.integers(0, 10, m, dtype=np.int32)
        if chunk_pairs:
            pwriter.write_table(pa.table({
                "base_id": pa.array([p[0] for p in chunk_pairs], pa.int64()),
                "dup_id": pa.array([p[1] for p in chunk_pairs], pa.int64()),
            }, schema=pairs_schema))
            n_pairs += len(chunk_pairs)
        tail = np.concatenate([tail, vecs])[-WINDOW:]
        written += m
        if written % 5_000_000 < CHUNK:
            print(f"  {written}/{n}", flush=True)
    if writer is not None:
        writer.close()
    pwriter.close()
    print(f"wrote {'(pairs only) ' if pairs_only else ''}{n} embeddings, "
          f"{n_pairs} planted pairs to {out}")


if __name__ == "__main__":
    main()
