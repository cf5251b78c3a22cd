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
    print(f"wrote {outdir}: {n_docs} docs, {n_vecs} embeddings, "
          f"{n_events} events / {n_users} users")


if __name__ == "__main__":
    main()
