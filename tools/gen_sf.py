#!/usr/bin/env python3
"""Generate scale-headroom test tables (documents + embeddings) in the same
schema and spirit as the driver's /root/testdata tables, at an arbitrary
scale factor. Used for the sf1 evidence runs (SCALE_r4.md): ~10x sf0.1.

Deterministic (seed fixed): word-salad documents over the same small
vocabulary style, with an explicit duplicate structure so the dedup
operators have something to find --
  - 90% unique docs,
  - 7% near-duplicates (a base doc with a few token substitutions),
  - 3% exact duplicates of an earlier doc.
Embeddings: 64-dim float32 vectors; 5% are small perturbations of an
earlier vector (near-dup structure for emb_neardup).

Usage: python3 tools/gen_sf.py <sf> <outdir>
  e.g. python3 tools/gen_sf.py 1 /tmp/sf1
Row counts scale from the driver's sf0.1 shape: documents = 50000*sf,
embeddings = 20000*sf.
"""
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ("spark line column order small sort fast value scan hash slow group "
         "batch part query agg table key stream filter customer the window "
         "join vector a b c shuffle broadcast codegen plan stage task row "
         "page cache disk merge read write commit log index range scale").split()
LANGS = ["en", "es", "de", "fr", "it"]


def gen_documents(n, rnd):
    docs = []
    for i in range(n):
        r = rnd.random()
        if i > 100 and r < 0.03:  # exact duplicate
            base = docs[rnd.randrange(max(1, i - 5000), i)]
            text = base[1]
        elif i > 100 and r < 0.10:  # near duplicate: swap a few tokens
            base = docs[rnd.randrange(max(1, i - 5000), i)]
            toks = base[1].split()
            for _ in range(max(1, len(toks) // 20)):
                toks[rnd.randrange(len(toks))] = rnd.choice(VOCAB)
            text = " ".join(toks)
        else:
            length = rnd.randint(15, 90)
            text = " ".join(rnd.choice(VOCAB) for _ in range(length))
        docs.append((i, text, rnd.choice(LANGS), f"src{i % 20}", len(text)))
    return docs


def gen_embeddings(n, rnd):
    vecs = []
    for i in range(n):
        if i > 50 and rnd.random() < 0.05:  # near-dup vector
            base = vecs[rnd.randrange(max(1, i - 1000), i)]
            v = [x + rnd.uniform(-0.01, 0.01) for x in base[1]]
        else:
            v = [rnd.gauss(0.0, 1.0) for _ in range(64)]
        vecs.append((i, v, rnd.randrange(10)))
    return vecs


def main():
    sf = float(sys.argv[1])
    out = sys.argv[2]
    rnd = random.Random(42)
    n_docs = int(50000 * sf)
    n_vecs = int(20000 * sf)

    docs = gen_documents(n_docs, rnd)
    t = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
        "lang": pa.array([d[2] for d in docs], pa.string()),
        "source": pa.array([d[3] for d in docs], pa.string()),
        "n_chars": pa.array([d[4] for d in docs], pa.int64()),
    })
    pq.write_table(t, f"{out}/documents.parquet")

    vecs = gen_embeddings(n_vecs, rnd)
    t2 = pa.table({
        "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
        "embedding": pa.array([v[1] for v in vecs], pa.list_(pa.float32())),
        "label": pa.array([v[2] for v in vecs], pa.int32()),
    })
    pq.write_table(t2, f"{out}/embeddings.parquet")
    print(f"wrote {n_docs} documents, {n_vecs} embeddings to {out}")


if __name__ == "__main__":
    main()
