#!/usr/bin/env python3
"""Zipf-reuse rehearsal fixtures (VERDICT r12 next-1): kill the
replica-vocabulary artifact at the source.

The round-9 sf1 recipe prefixed every token with `r{k}` per replica, so
the gram vocabulary grew the FULL 10x with zero reuse — every
vocabulary-sized frame (gram-df joins, bigram LM, decontamination gram
sets) then scaled with corpus size instead of saturating, and six
queries' 10x ratios were excused by that artifact rather than measured
on realistic data. These fixtures draw every token from ONE shared
Zipf pool (10k types, alpha = 1.1, the 8 Gopher stopwords pinned as the
head so quality gates stay non-trivial), and HALF of each document's
tokens arrive as stock PHRASES from a shared 3k-phrase pool (Zipf-
ranked phrase popularity) — the boilerplate-recombination structure
real web text has, and the reason natural gram vocabularies grow
sublinearly (Heaps' law): independent Zipf tokens alone leave trigrams
nearly all-distinct (measured 8.4x gram vocab for 10x tokens on a
first cut), while phrase-interior grams saturate at pool size.

Layout: benchdata/zipf0p1 (5,000 docs — the sf0.1 shape: uniform 5-100
token lengths, en/zh/es/fr/de at the observed 40/15/15/15/15 mix,
sources src0..src19) and benchdata/zipf1 (50,000 docs, a SUPERSET —
docs 0..4999 are bit-identical to zipf0p1), both with real row groups.
Only documents.parquet: the six artifact-shielded queries read nothing
else. Perf-only (gitignored), never used for oracles. The script
prints the measured type/gram vocabulary growth as the sublinearity
evidence.

Dev-only tool, driver-side stack (numpy/pyarrow/duckdb), like
localverify.py.
"""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import duckdb

DST = "/root/repo/benchdata"
N1, R = 5000, 10          # 1x docs; 10x = N1 * R
V, ALPHA = 10000, 1.1     # shared Zipf pool
STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]
LANGS = ["en", "zh", "es", "fr", "de"]

rng = np.random.default_rng(42)
vocab = np.array(STOPS + [f"w{i}" for i in range(V - len(STOPS))])
weights = 1.0 / np.arange(1, V + 1) ** ALPHA
weights /= weights.sum()

# shared phrase pool: 3k phrases of 6-12 Zipf tokens, phrase popularity
# itself Zipf-ranked — repeated phrases are where gram reuse comes from
P = 3000
phrase_lens = rng.integers(6, 13, size=P)
phrase_toks = rng.choice(V, size=int(phrase_lens.sum()), p=weights)
poff = np.concatenate([[0], np.cumsum(phrase_lens)])
phrases = [vocab[phrase_toks[poff[i]:poff[i + 1]]].tolist() for i in range(P)]
pweights = 1.0 / np.arange(1, P + 1) ** ALPHA
pweights /= pweights.sum()

n_docs = N1 * R
lengths = rng.integers(5, 101, size=n_docs)
# pre-drawn streams (per-call rng.choice with p is O(V) — too slow)
fresh_stream = rng.choice(V, size=int(lengths.sum()) + 64, p=weights)
phrase_stream = rng.choice(P, size=n_docs * 12, p=pweights)
mix_stream = rng.random(n_docs * 24)
fi = pi = mi = 0
texts = []
for i in range(n_docs):
    toks, L = [], int(lengths[i])
    while len(toks) < L:
        if mix_stream[mi] < 0.5:
            toks += phrases[phrase_stream[pi]]
            pi += 1
        else:
            k = 1 + int(mix_stream[mi] * 8) % 4
            toks += vocab[fresh_stream[fi:fi + k]].tolist()
            fi += k
        mi += 1
    texts.append(" ".join(toks[:L]))
# 40% en, 15% each other (the observed sf0.1 mix), deterministic by id
lang_pick = rng.random(n_docs)
langs = np.where(lang_pick < 0.4, "en",
                 np.array(LANGS)[1 + (np.arange(n_docs) % 4)])
sources = np.array([f"src{i % 20}" for i in rng.integers(0, 20, size=n_docs)])

table = pa.table({
    "doc_id": pa.array(np.arange(n_docs), pa.int64()),
    "text": pa.array(texts),
    "lang": pa.array(langs.tolist()),
    "source": pa.array(sources.tolist()),
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
})

import os
for name, tbl in [("zipf0p1", table.slice(0, N1)), ("zipf1", table)]:
    os.makedirs(f"{DST}/{name}", exist_ok=True)
    pq.write_table(tbl, f"{DST}/{name}/documents.parquet",
                   row_group_size=100000 // 20)  # ~5k rows/group
    print(f"{name}: {tbl.num_rows} rows")

con = duckdb.connect()
for name in ["zipf0p1", "zipf1"]:
    row = con.execute(f"""
      WITH w AS (SELECT string_split(text, ' ') AS w
                 FROM read_parquet('{DST}/{name}/documents.parquet')),
      t AS (SELECT unnest(w) AS t FROM w),
      g AS (SELECT unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
            FROM w)
      SELECT (SELECT count(*) FROM t) AS tokens,
             (SELECT count(DISTINCT t) FROM t) AS types,
             (SELECT count(DISTINCT g) FROM g) AS trigrams""").fetchone()
    print(f"{name}: tokens={row[0]} types={row[1]} trigram_vocab={row[2]}")
