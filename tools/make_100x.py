#!/usr/bin/env python3
"""100x rehearsal fixtures (round 14): a THIRD scale point for the
bounded-output family, whose whole claim is flat/linear behavior
("would this survive 100x?" measured, not extrapolated).

 - benchdata/zipf10: 500,000 documents from the SAME Zipf+phrase
   recipe as make_zipf_docs.py (shared 10k-type pool, 3k stock
   phrases, half-phrase mix) — 100x of zipf0p1, Heaps-law gram reuse
   preserved. Independent draw (seed 43), same distributions.
 - benchdata/sf10: 10,000,000 events = 100 replicas of sf0.1 events
   with per-replica user_id/event_id offsets (distinct users scale
   100x — the DAU family must chase a moving target, not recount one)
   and a tiny value perturbation; ts kept, so the same day axis gets
   100x denser, which is what a 100x corpus on a fixed window is.

Perf-only (gitignored), never used for oracles. Dev-only tool,
driver-side stack (numpy/pyarrow/duckdb), like make_zipf_docs.py.
"""
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import duckdb

DST = "/root/repo/benchdata"

# ---------------------------------------------------------- zipf10
N, V, ALPHA, P = 500000, 10000, 1.1, 3000
STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]
LANGS = ["en", "zh", "es", "fr", "de"]

rng = np.random.default_rng(43)
vocab = np.array(STOPS + [f"w{i}" for i in range(V - len(STOPS))])
weights = 1.0 / np.arange(1, V + 1) ** ALPHA
weights /= weights.sum()
phrase_lens = rng.integers(6, 13, size=P)
phrase_toks = rng.choice(V, size=int(phrase_lens.sum()), p=weights)
poff = np.concatenate([[0], np.cumsum(phrase_lens)])
phrases = [vocab[phrase_toks[poff[i]:poff[i + 1]]].tolist() for i in range(P)]
pweights = 1.0 / np.arange(1, P + 1) ** ALPHA
pweights /= pweights.sum()

lengths = rng.integers(5, 101, size=N)
fresh_stream = rng.choice(V, size=int(lengths.sum()) + 64, p=weights)
phrase_stream = rng.choice(P, size=N * 12, p=pweights)
mix_stream = rng.random(N * 24)
fi = pi = mi = 0
texts = []
for i in range(N):
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
lang_pick = rng.random(N)
langs = np.where(lang_pick < 0.4, "en", np.array(LANGS)[1 + (np.arange(N) % 4)])
sources = np.array([f"src{i % 20}" for i in rng.integers(0, 20, size=N)])
table = pa.table({
    "doc_id": pa.array(np.arange(N), pa.int64()),
    "text": pa.array(texts),
    "lang": pa.array(langs.tolist()),
    "source": pa.array(sources.tolist()),
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
})
os.makedirs(f"{DST}/zipf10", exist_ok=True)
pq.write_table(table, f"{DST}/zipf10/documents.parquet", row_group_size=25000)
print(f"zipf10: {table.num_rows} rows")

# ----------------------------------------------------------- sf10
os.makedirs(f"{DST}/sf10", exist_ok=True)
con = duckdb.connect()
R = 100
con.execute(f"""
  COPY (
    SELECT e.event_id + r.r * 10000000 AS event_id,
           e.ts,
           e.user_id + r.r * 1000000 AS user_id,
           e.event_type,
           e.value * (1.0 + r.r * 1e-7) AS value,
           e.props
    FROM read_parquet('/root/testdata/sf0.1/events.parquet') e
    CROSS JOIN (SELECT unnest(range({R})) AS r) r
  ) TO '{DST}/sf10/events.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 200000)
""")
n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/sf10/events.parquet')").fetchone()[0]
print(f"sf10 events: {n} rows")

row = con.execute(f"""
  WITH w AS (SELECT string_split(text, ' ') AS w
             FROM read_parquet('{DST}/zipf10/documents.parquet')),
  t AS (SELECT unnest(w) AS t FROM w)
  SELECT count(*), count(DISTINCT t) FROM t""").fetchone()
print(f"zipf10: tokens={row[0]} types={row[1]}")
