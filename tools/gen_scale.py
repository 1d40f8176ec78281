#!/usr/bin/env python3
"""Local scale-testing data generator (driver-side tooling, not library code).

The driver ships sf{0.001,0.01,0.1} only; the 100-TB scale story needs at
least one decade of LOCAL scaling evidence (r11 verdict ask #5). This
generates the same table shapes at an arbitrary scale factor so the heavy
operator family can be measured at sf0.1-equivalent AND sf1 with the SAME
generator — the sf1/sf0.1 ratio then isolates scaling behavior from
generator drift. Distributions mirror /root/testdata/sf0.1 (measured):
31-word vocabulary, ~54 tokens/doc, 5 langs (en-heavy), 20 uniform sources,
~0.2% exact dups plus ~4% near-dup mutations and a boilerplate-sharing
cohort; TPC-H-ish keys are dense 0-based with the driver's cardinality
ratios (cust:orders:lineitem = 1:10:40 per sf0.1).

Usage: python3 tools/gen_scale.py <outDir> <sf>   # sf=1.0 -> 6M lineitem
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = np.array([
    "spark", "query", "table", "column", "row", "join", "filter", "scan",
    "sort", "hash", "group", "agg", "window", "stream", "batch", "part",
    "order", "line", "customer", "key", "value", "data", "merge", "big",
    "small", "fast", "slow", "the", "a", "vector", "fingerprint"])
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
SEGMENTS = ["MACHINERY", "HOUSEHOLD", "BUILDING", "FURNITURE", "AUTOMOBILE"]


def gen_documents(rng, n):
    texts = []
    base = []
    boiler = " ".join(rng.choice(VOCAB, 8))
    for i in range(n):
        k = max(5, int(rng.normal(54, 18)))
        words = list(rng.choice(VOCAB, k))
        r = rng.random()
        if i > 20 and r < 0.002:                     # exact dup
            t = texts[int(rng.integers(0, i))]
        elif i > 20 and r < 0.04:                    # near dup: mutate ~12%
            src = texts[int(rng.integers(0, i))].split(" ")
            for j in range(len(src)):
                if rng.random() < 0.12:
                    src[j] = str(rng.choice(VOCAB))
            t = " ".join(src)
        elif i > 20 and r < 0.055:                   # containment: subset
            src = texts[int(rng.integers(0, i))].split(" ")
            t = " ".join(src[: max(3, int(len(src) * 0.95))])
        elif r < 0.105:                              # boilerplate cohort
            t = boiler + " " + " ".join(words)
        else:
            t = " ".join(words)
        texts.append(t)
        base.append(t)
    return pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(rng.choice(LANGS, n, p=LANG_P), pa.string()),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, n)], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def ts_us(days_from_1995):
    base = np.datetime64("1995-01-01", "us")
    return base + (days_from_1995 * 86_400_000_000).astype("timedelta64[us]")


def main(out, sf):
    rng = np.random.default_rng(1234)
    n_cust, n_ord, n_li = int(150_000 * sf), int(1_500_000 * sf), int(6_000_000 * sf)
    n_part, n_supp, n_doc = int(200_000 * sf), int(10_000 * sf), int(50_000 * sf)
    import os
    os.makedirs(out, exist_ok=True)

    pq.write_table(pa.table({
        "r_regionkey": pa.array(np.arange(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]}),
        f"{out}/region.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array(np.arange(25), pa.int32()),
        "n_name": [f"NATION_{i:02d}" for i in range(25)],
        "n_regionkey": pa.array(np.arange(25) % 5, pa.int32())}),
        f"{out}/nation.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": rng.choice(SEGMENTS, n_cust)}),
        f"{out}/customer.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2)}),
        f"{out}/supplier.parquet")
    pq.write_table(pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [f"part {i} {VOCAB[i % 31]}" for i in range(n_part)],
        "p_brand": [f"Brand#{i % 25:02d}" for i in range(n_part)],
        "p_type": rng.choice(["STANDARD", "SMALL", "MEDIUM", "LARGE",
                              "ECONOMY", "PROMO"], n_part),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 2000, n_part), 2)}),
        f"{out}/part.parquet")
    odate = rng.integers(0, 2404, n_ord)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": rng.choice(["O", "P", "F"], n_ord),
        "o_totalprice": np.round(rng.uniform(1000, 450_000, n_ord), 2),
        "o_orderdate": pa.array(ts_us(odate), pa.timestamp("us")),
        "o_orderpriority": rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"], n_ord)}),
        f"{out}/orders.parquet")
    lo = rng.integers(0, n_ord, n_li)
    lo.sort()
    ldate = rng.integers(0, 2404, n_li)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(lo, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 100_000, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
        "l_returnflag": rng.choice(["R", "N", "A"], n_li),
        "l_linestatus": rng.choice(["O", "F"], n_li),
        "l_shipdate": pa.array(ts_us(ldate), pa.timestamp("us"))}),
        f"{out}/lineitem.parquet")
    pq.write_table(gen_documents(rng, n_doc), f"{out}/documents.parquet")

    n_emb, n_ev = int(20_000 * sf), int(1_000_000 * sf)
    emb = rng.normal(0, 1, (n_emb, 64)).astype(np.float32)
    dup = rng.integers(0, n_emb, max(1, n_emb // 50))
    emb[dup] = emb[rng.integers(0, n_emb, len(dup))] + \
        rng.normal(0, 0.05, (len(dup), 64)).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32())}),
        f"{out}/embeddings.parquet")
    ev_ts = np.sort(rng.integers(0, 90 * 86_400_000_000, n_ev))
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(np.datetime64("2024-01-01", "us") +
                       ev_ts.astype("timedelta64[us]"), pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, max(1, n_ev // 10), n_ev), pa.int64()),
        "event_type": rng.choice(["view", "click", "purchase", "signup", "error"],
                                 n_ev, p=[0.6, 0.25, 0.07, 0.05, 0.03]),
        "value": np.round(rng.uniform(0, 100, n_ev), 2),
        "props": [f'{{"k": {int(k)}}}' for k in rng.integers(0, 1000, n_ev)]}),
        f"{out}/events.parquet")
    print(f"wrote {out}: lineitem={n_li} documents={n_doc} "
          f"embeddings={n_emb} events={n_ev}")


if __name__ == "__main__":
    main(sys.argv[1], float(sys.argv[2]))
