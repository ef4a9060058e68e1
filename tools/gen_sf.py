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


def gen_embeddings(n, rnd, pairs_out=None):
    """pairs_out (list or None): the generator KNOWS which near-dup pairs
    it plants (VERDICT_r17 #6) — append (base_id, dup_id) for each
    perturbation so the planted class costs the probe a semi-join on a
    side table instead of a box-infeasible LSH sketch at >=2M vectors.
    Recording pairs consumes no RNG draws, so the vector stream is
    byte-identical with or without it."""
    vecs = []
    for i in range(n):
        if i > 50 and rnd.random() < 0.05:  # near-dup vector
            bi = rnd.randrange(max(1, i - 1000), i)
            base = vecs[bi]
            v = [x + rnd.uniform(-0.01, 0.01) for x in base[1]]
            if pairs_out is not None:
                pairs_out.append((base[0], i))
        else:
            v = [rnd.gauss(0.0, 1.0) for _ in range(64)]
        vecs.append((i, v, rnd.randrange(10)))
    return vecs


def write_planted_pairs(pairs, out):
    pq.write_table(pa.table({
        "base_id": pa.array([p[0] for p in pairs], pa.int64()),
        "dup_id": pa.array([p[1] for p in pairs], pa.int64()),
    }), f"{out}/planted_pairs.parquet")
    print(f"wrote {len(pairs)} planted pairs to {out}")


REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
ADJ = ["large", "hot", "small", "cold", "bright", "dark", "smooth", "rough"]
NOUN = ["ring", "bolt", "cog", "plate", "tube", "wheel", "pin", "lever"]
PTYPES = ["LARGE", "ECONOMY", "STANDARD", "SMALL", "MEDIUM", "PROMO"]


def gen_relational(sf, rnd, out, hot_share=0.30):
    """The gun_*/graph_* family's tables (events + the order->customer->
    nation->region star) at 10x-per-sf the driver's shapes, with a
    POWER-LAW degree fixture: user 0 owns `hot_share` of events and
    customer 0 owns `hot_share` of orders -- the one-soul-with-30%-of-
    edges skew shape the graph/gun scale evidence runs against
    (VERDICT_r5 missing #4). hot_share=0 generates the uniform CONTROL
    for skew-cost comparisons.
    """
    pq.write_table(pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(REGIONS, pa.string()),
    }), f"{out}/region.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)], pa.string()),
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }), f"{out}/nation.parquet")

    n_cust = int(150000 * sf)
    pq.write_table(pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(
            [rnd.randrange(25) for _ in range(n_cust)], pa.int32()),
        "c_acctbal": pa.array(
            [round(rnd.uniform(-999.99, 9999.99), 2) for _ in range(n_cust)]),
        "c_mktsegment": pa.array([rnd.choice(SEGMENTS) for _ in range(n_cust)]),
    }), f"{out}/customer.parquet")

    n_ord = int(1500000 * sf)
    day_us = 86400 * 10**6
    base_date = 788918400 * 10**6  # 1995-01-01 UTC, microseconds
    custkeys = [0 if rnd.random() < hot_share else rnd.randrange(n_cust)
                for _ in range(n_ord)]
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(custkeys, pa.int64()),
        "o_orderstatus": pa.array([rnd.choice("OPF") for _ in range(n_ord)]),
        "o_totalprice": pa.array(
            [round(rnd.uniform(1000.0, 500000.0), 2) for _ in range(n_ord)]),
        "o_orderdate": pa.array(
            [base_date + rnd.randrange(2400) * day_us for _ in range(n_ord)],
            pa.timestamp("us")),
        "o_orderpriority": pa.array(
            [rnd.choice(PRIORITIES) for _ in range(n_ord)]),
    }), f"{out}/orders.parquet")

    n_ev = int(1000000 * sf)
    n_users = int(15000 * sf)
    base_ns = 1704067200 * 10**9  # 2024-01-01 UTC
    pq.write_table(pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        # nanosecond timestamps like the driver's events table (Spark reads
        # them as raw longs via nanosAsLong; `ts div 1000` == epoch_us)
        "ts": pa.array(
            [base_ns + i * 26 * 10**9 + rnd.randrange(10**9)
             for i in range(n_ev)], pa.timestamp("ns")),
        "user_id": pa.array(
            [0 if rnd.random() < hot_share else rnd.randrange(max(1, n_users))
             for _ in range(n_ev)], pa.int64()),
        "event_type": pa.array([rnd.choice(EVENT_TYPES) for _ in range(n_ev)]),
        "value": pa.array(
            [round(rnd.uniform(0.0, 200.0), 2) for _ in range(n_ev)]),
        "props": pa.array(
            ['{"k": %d}' % rnd.randrange(100) for _ in range(n_ev)]),
    }), f"{out}/events.parquet")
    # part/supplier/lineitem draw AFTER events so the round-6 recorded
    # fixtures (customer/orders/events content) stay byte-reproducible
    n_part = int(200000 * sf)
    pq.write_table(pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": pa.array([f"{rnd.choice(ADJ)} {rnd.choice(NOUN)}"
                            for _ in range(n_part)]),
        "p_brand": pa.array([f"Brand#{rnd.randrange(1, 26)}" for _ in range(n_part)]),
        "p_type": pa.array([rnd.choice(PTYPES) for _ in range(n_part)]),
        "p_size": pa.array([rnd.randrange(1, 51) for _ in range(n_part)], pa.int32()),
        "p_retailprice": pa.array(
            [round(900.0 + i / 10.0, 2) for i in range(n_part)]),
    }), f"{out}/part.parquet")

    n_supp = int(10000 * sf)
    pq.write_table(pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(
            [rnd.randrange(25) for _ in range(n_supp)], pa.int32()),
        "s_acctbal": pa.array(
            [round(rnd.uniform(0.0, 9999.99), 2) for _ in range(n_supp)]),
    }), f"{out}/supplier.parquet")

    n_li = int(6000000 * sf)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(
            [rnd.randrange(n_ord) for _ in range(n_li)], pa.int64()),
        "l_partkey": pa.array(
            [rnd.randrange(n_part) for _ in range(n_li)], pa.int64()),
        "l_suppkey": pa.array(
            [rnd.randrange(n_supp) for _ in range(n_li)], pa.int64()),
        "l_linenumber": pa.array(
            [1 + i % 7 for i in range(n_li)], pa.int32()),
        "l_quantity": pa.array(
            [float(rnd.randrange(1, 51)) for _ in range(n_li)]),
        "l_extendedprice": pa.array(
            [round(rnd.uniform(1000.0, 105000.0), 2) for _ in range(n_li)]),
        "l_discount": pa.array(
            [rnd.randrange(0, 11) / 100.0 for _ in range(n_li)]),
        "l_tax": pa.array(
            [rnd.randrange(0, 9) / 100.0 for _ in range(n_li)]),
        "l_returnflag": pa.array([rnd.choice("RAN") for _ in range(n_li)]),
        "l_linestatus": pa.array([rnd.choice("OF") for _ in range(n_li)]),
        "l_shipdate": pa.array(
            [base_date + rnd.randrange(2600) * day_us for _ in range(n_li)],
            pa.timestamp("us")),
    }), f"{out}/lineitem.parquet")


    print(f"wrote {n_cust} customers, {n_ord} orders, {n_ev} events, {n_li} lineitems to {out}")


def main():
    sf = float(sys.argv[1])
    out = sys.argv[2]
    rnd = random.Random(42)
    n_docs = int(50000 * sf)
    n_vecs = int(20000 * sf)

    if len(sys.argv) > 3 and sys.argv[3] == "--relational":
        hot = float(sys.argv[4]) if len(sys.argv) > 4 else 0.30
        gen_relational(sf, rnd, out, hot)
        return

    # Embeddings-only fixture for ANN/dedup completion probes at scales
    # where generating 50000*sf documents would dominate the wall. NOTE:
    # the random stream is NOT the docs+embeddings stream (docs normally
    # draw first), so this fixture is for completion/shuffle probes, not
    # for extending a hash record generated the standard way.
    if len(sys.argv) > 3 and sys.argv[3] == "--embeddings-only":
        import os
        os.makedirs(out, exist_ok=True)
        pairs = []
        vecs = gen_embeddings(n_vecs, rnd, pairs_out=pairs)
        pq.write_table(pa.table({
            "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
            "embedding": pa.array([v[1] for v in vecs], pa.list_(pa.float32())),
            "label": pa.array([v[2] for v in vecs], pa.int32()),
        }), f"{out}/embeddings.parquet")
        write_planted_pairs(pairs, out)
        print(f"wrote {n_vecs} embeddings to {out}")
        return

    docs = gen_documents(n_docs, rnd)
    t = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
        "lang": pa.array([d[2] for d in docs], pa.string()),
        "source": pa.array([d[3] for d in docs], pa.string()),
        "n_chars": pa.array([d[4] for d in docs], pa.int64()),
    })
    pq.write_table(t, f"{out}/documents.parquet")

    pairs = []
    vecs = gen_embeddings(n_vecs, rnd, pairs_out=pairs)
    t2 = pa.table({
        "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
        "embedding": pa.array([v[1] for v in vecs], pa.list_(pa.float32())),
        "label": pa.array([v[2] for v in vecs], pa.int32()),
    })
    pq.write_table(t2, f"{out}/embeddings.parquet")
    write_planted_pairs(pairs, out)
    print(f"wrote {n_docs} documents, {n_vecs} embeddings to {out}")


if __name__ == "__main__":
    main()
