#!/usr/bin/env python3
"""zipf100 rehearsal fixture (round 20, VERDICT r19 next-6): ONE tier
beyond zipf10 for the dedup_incremental_assign_capped plateau question
— 5,000,000 documents from the SAME Zipf+phrase recipe as
make_zipf_docs.py / make_100x.py (shared 10k-type pool, 3k stock
phrases, half-phrase mix, Heaps-law gram reuse preserved). Independent
draw (seed 44), same distributions. Perf-only (gitignored), never used
for oracles. Dev-only tool, driver-side stack (numpy/pyarrow), like
its siblings."""
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DST = "/root/repo/benchdata"
N, V, ALPHA, P = 5000000, 10000, 1.1, 3000
STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]
LANGS = ["en", "zh", "es", "fr", "de"]

rng = np.random.default_rng(44)
vocab = np.array(STOPS + [f"w{i}" for i in range(V - len(STOPS))])
weights = 1.0 / np.arange(1, V + 1) ** ALPHA
weights /= weights.sum()
phrase_lens = rng.integers(6, 13, size=P)
phrase_toks = rng.choice(V, size=int(phrase_lens.sum()), p=weights)
poff = np.concatenate([[0], np.cumsum(phrase_lens)])
phrases = [" ".join(vocab[phrase_toks[poff[i]:poff[i + 1]]].tolist())
           for i in range(P)]
phrase_ntok = phrase_lens.copy()
pweights = 1.0 / np.arange(1, P + 1) ** ALPHA
pweights /= pweights.sum()

lengths = rng.integers(5, 101, size=N)
fresh_stream = rng.choice(V, size=int(lengths.sum()) + 64, p=weights)
phrase_stream = rng.choice(P, size=N * 12, p=pweights)
mix_stream = rng.random(N * 24)
fi = pi = mi = 0
texts = []
for i in range(N):
    toks_n, parts = 0, []
    L = int(lengths[i])
    while toks_n < L:
        if mix_stream[mi] < 0.5:
            p = phrase_stream[pi]
            parts.append(phrases[p])
            toks_n += int(phrase_ntok[p])
            pi += 1
        else:
            k = 1 + int(mix_stream[mi] * 8) % 4
            parts.append(" ".join(vocab[fresh_stream[fi:fi + k]].tolist()))
            toks_n += k
            fi += k
        mi += 1
    texts.append(" ".join(" ".join(parts).split(" ")[:L]))
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
os.makedirs(f"{DST}/zipf100", exist_ok=True)
pq.write_table(table, f"{DST}/zipf100/documents.parquet",
               row_group_size=25000)
print(f"zipf100: {table.num_rows} rows")
