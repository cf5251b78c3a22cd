#!/usr/bin/env python3
"""Generate an sf1 (10x sf0.1) documents+embeddings corpus for the
scale-up evidence run (BENCH_sf1.json). Distribution-matched to the
driver's sf0.1 tables (measured, not copied):

- documents: 31-word vocab, 8-100 words/doc (n_chars ~44-580), langs
  en 41% / zh,es,fr,de ~15% each, 20 sources; ~0.5% exact-dup copies
  and ~2% near-dup copies (1-5 token mutations of an earlier doc) so
  the dedup family has realistic work at scale.
- embeddings: unit-normalized 64-dim float32 vectors, label uniform
  0..9 (matches sf0.1: random directions, label is a tag).

Deterministic (fixed seed). Writes <outdir>/documents.parquet and
<outdir>/embeddings.parquet. Usage:
  python3 tools/gen_sf1.py /tmp/sf1 [n_docs n_vecs]
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ["the", "query", "row", "stream", "line", "small", "group", "spark",
         "fast", "customer", "batch", "data", "sort", "value", "hash",
         "filter", "big", "dup", "column", "order", "a", "vector", "part",
         "scan", "slow", "agg", "key", "window", "table", "merge", "join"]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.1525, 0.1475, 0.1475, 0.1425]


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
    n_vecs = int(sys.argv[3]) if len(sys.argv) > 3 else 20000

    # SAFETY: refuse to write through a symlink. Running as root ignores
    # read-only file bits, so a symlinked table name here would silently
    # overwrite its TARGET (this bit /root/testdata/sf0.1 once — round-8
    # incident, see ROADMAP.md). Only region/nation may be symlinked into
    # the output dir; everything this script writes must be a fresh file.
    import os
    for t in ("documents", "embeddings", "events", "orders", "lineitem",
              "customer", "part", "supplier"):
        p = f"{outdir}/{t}.parquet"
        if os.path.islink(p):
            sys.exit(f"refusing to overwrite symlink {p} -> "
                     f"{os.path.realpath(p)}; remove it first")
    rng = np.random.default_rng(4242)

    import os
    os.makedirs(outdir, exist_ok=True)

    texts = []
    for i in range(n_docs):
        r = rng.random()
        if i > 100 and r < 0.005:           # exact-dup copy of an earlier doc
            texts.append(texts[int(rng.integers(0, i))])
        elif i > 100 and r < 0.025:         # near-dup copy, 1-5 token edits
            base = texts[int(rng.integers(0, i))].split(" ")
            for _ in range(int(rng.integers(1, 6))):
                base[int(rng.integers(0, len(base)))] = \
                    VOCAB[int(rng.integers(0, len(VOCAB)))]
            texts.append(" ".join(base))
        else:
            nw = int(rng.integers(8, 101))
            texts.append(" ".join(
                VOCAB[int(k)] for k in rng.integers(0, len(VOCAB), nw)))
    langs = rng.choice(LANGS, size=n_docs, p=LANG_P)
    sources = [f"src{int(k)}" for k in rng.integers(0, 20, n_docs)]
    docs = pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs.tolist(), pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(docs, f"{outdir}/documents.parquet")

    x = rng.standard_normal((n_vecs, 64)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    emb = pa.table({
        "vec_id": pa.array(range(n_vecs), pa.int64()),
        "embedding": pa.array([v.tolist() for v in x],
                              pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_vecs).tolist(), pa.int32()),
    })
    pq.write_table(emb, f"{outdir}/embeddings.parquet")

    # events: distribution-matched to the driver's sf0.1 table (measured:
    # 100k rows / 30 days of Jan 2024 / 1500 users / 5 uniform event types /
    # value ~ exp(mean 50) / props {"k": 0-99}), scaled 10x in BOTH rows and
    # users so per-user temporal density — what sessionization and the as-of
    # joins key on — stays comparable while total work grows 10x. ts is
    # written as timestamp[us], the current physical encoding.
    n_events = n_docs * 20          # 1M at the default 50k docs (sf0.1: 100k)
    n_users = max(1, n_events // 67)  # sf0.1 ratio: ~67 events/user (100k/1500)
    start_us = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = np.sort(start_us + (rng.random(n_events) * span_us).astype(np.int64))
    etypes = np.array(["click", "view", "purchase", "signup", "error"])
    events = pa.table({
        "event_id": pa.array(range(n_events), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_events).tolist(), pa.int64()),
        "event_type": pa.array(
            etypes[rng.integers(0, 5, n_events)].tolist(), pa.string()),
        "value": pa.array(np.round(rng.exponential(50.0, n_events), 2).tolist(),
                          pa.float64()),
        "props": pa.array([f'{{"k": {int(k)}}}'
                           for k in rng.integers(0, 100, n_events)], pa.string()),
    })
    pq.write_table(events, f"{outdir}/events.parquet")

    # relational star schema, 10x sf0.1 row counts, distribution-matched
    # (measured on the driver's sf0.1 tables): orders 1.5M (totalprice ~
    # uniform 1k-500k, dates 1995-01..2001-08, 3 statuses / 5 priorities
    # uniform), lineitem ~6M (lines/order ~ Poisson(4) zero-dropped,
    # quantity uniform 1-50, extendedprice uniform ~0.9k-105k, discount
    # 0-0.1, tax 0-0.08, shipdate = orderdate + lag averaging ~48 days),
    # customer 150k / part 200k / supplier 10k with the same key domains,
    # segment/brand/type/size distributions. nation/region stay symlinked
    # (fixed 25/5 rows at every TPC-H scale).
    n_orders, n_cust, n_part, n_supp = n_docs * 30, n_docs * 3, n_docs * 4, n_docs // 5
    odate_us = np.datetime64("1995-01-01", "us").astype(np.int64)
    ospan_us = int(6.6 * 365.25 * 86400) * 1_000_000
    o_dates = odate_us + (rng.random(n_orders) * ospan_us).astype(np.int64)
    orders = pa.table({
        "o_orderkey": pa.array(range(n_orders), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_orders).tolist(), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(["P", "O", "F"])[rng.integers(0, 3, n_orders)].tolist()),
        "o_totalprice": pa.array(
            np.round(1000 + rng.random(n_orders) * 499000, 2).tolist(), pa.float64()),
        "o_orderdate": pa.array(o_dates, pa.timestamp("us")),
        "o_orderpriority": pa.array(np.array(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
        )[rng.integers(0, 5, n_orders)].tolist()),
    })
    pq.write_table(orders, f"{outdir}/orders.parquet")

    lines_per = rng.poisson(4.0, n_orders)
    okeys = np.repeat(np.arange(n_orders, dtype=np.int64), lines_per)
    n_li = len(okeys)
    lag_us = ((rng.random(n_li) * 296 - 100) * 86400 * 1e6).astype(np.int64)
    lineitem = pa.table({
        "l_orderkey": pa.array(okeys, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li).tolist(), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li).tolist(), pa.int64()),
        "l_linenumber": pa.array(
            np.concatenate([np.arange(k) for k in lines_per if k > 0]).tolist(),
            pa.int64()),
        "l_quantity": pa.array(
            rng.integers(1, 51, n_li).astype(np.float64).tolist(), pa.float64()),
        "l_extendedprice": pa.array(
            np.round(900 + rng.random(n_li) * 104100, 2).tolist(), pa.float64()),
        "l_discount": pa.array(
            np.round(rng.random(n_li) * 0.1, 2).tolist(), pa.float64()),
        "l_tax": pa.array(np.round(rng.random(n_li) * 0.08, 2).tolist(), pa.float64()),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)].tolist()),
        "l_linestatus": pa.array(
            np.array(["O", "F"])[rng.integers(0, 2, n_li)].tolist()),
        "l_shipdate": pa.array(o_dates[okeys] + lag_us, pa.timestamp("us")),
    })
    pq.write_table(lineitem, f"{outdir}/lineitem.parquet")

    customer = pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust).tolist(), pa.int64()),
        "c_acctbal": pa.array(
            np.round(-1000 + rng.random(n_cust) * 11000, 2).tolist(), pa.float64()),
        "c_mktsegment": pa.array(np.array(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
        )[rng.integers(0, 5, n_cust)].tolist()),
    })
    pq.write_table(customer, f"{outdir}/customer.parquet")

    adjs = ["small", "red", "blue", "hot", "cold", "dark", "pale", "big"]
    nouns = ["ring", "widget", "bolt", "gear", "gizmo", "cog", "valve", "pin"]
    part = pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": pa.array([f"{adjs[int(a)]} {nouns[int(b)]}" for a, b in
                            zip(rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))]),
        "p_brand": pa.array([f"Brand#{int(k) + 1}"
                             for k in rng.integers(0, 25, n_part)]),
        "p_type": pa.array(np.array(
            ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
        )[rng.integers(0, 6, n_part)].tolist()),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32).tolist(),
                           pa.int32()),
        "p_retailprice": pa.array(
            np.round(100 + rng.random(n_part) * 1700, 2).tolist(), pa.float64()),
    })
    pq.write_table(part, f"{outdir}/part.parquet")

    supplier = pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp).tolist(), pa.int64()),
        "s_acctbal": pa.array(
            np.round(-1000 + rng.random(n_supp) * 11000, 2).tolist(), pa.float64()),
    })
    pq.write_table(supplier, f"{outdir}/supplier.parquet")

    print(f"wrote {outdir}: {n_docs} docs, {n_vecs} embeddings, "
          f"{n_events} events / {n_users} users, {n_orders} orders, "
          f"{n_li} lineitems, {n_cust} customers, {n_part} parts, "
          f"{n_supp} suppliers")


if __name__ == "__main__":
    main()
