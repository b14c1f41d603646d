#!/usr/bin/env python3
"""Multi-LINE rehearsal fixtures (round 14): every shipped corpus
fixture is single-line, so the line-grain operators (`text_line_dedup`,
`text_lang_mix`) measured only their overhead floor. These rewrap the
zipf corpora into 8-15-token lines and inject SHARED banner lines
(200 stock lines, Zipf-ranked popularity, ~25% of line slots) — the
chrome-heavy structure the line filter exists for.

Layout: benchdata/lines0p1 (from zipf0p1) and lines1 (from zipf1),
documents.parquet only. Perf-only (gitignored), never used for
oracles. Dev-only tool, driver-side stack.
"""
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import duckdb

SRC = "/root/repo/benchdata"
rng = np.random.default_rng(7)

B = 200
banners = [f"banner line b{i} " + " ".join(f"nav{j}" for j in range(3 + i % 4))
           for i in range(B)]
bw = 1.0 / np.arange(1, B + 1) ** 1.1
bw /= bw.sum()

for src, dst in [("zipf0p1", "lines0p1"), ("zipf1", "lines1")]:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text, lang, source FROM read_parquet('{SRC}/{src}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    n = len(rows)
    bstream = rng.choice(B, size=n * 16, p=bw)
    mix = rng.random(n * 16)
    linelen = rng.integers(8, 16, size=n * 16)
    bi = mi = li = 0
    out = []
    for doc_id, text, lang, source in rows:
        toks = text.split(" ")
        lines, pos = [], 0
        while pos < len(toks):
            if mix[mi] < 0.25:
                lines.append(banners[bstream[bi]])
                bi += 1
            L = int(linelen[li])
            lines.append(" ".join(toks[pos:pos + L]))
            pos += L
            mi += 1
            li += 1
        out.append((doc_id, "\n".join(lines), lang, source))
    table = pa.table({
        "doc_id": pa.array([r[0] for r in out], pa.int64()),
        "text": pa.array([r[1] for r in out]),
        "lang": pa.array([r[2] for r in out]),
        "source": pa.array([r[3] for r in out]),
        "n_chars": pa.array([len(r[1]) for r in out], pa.int64()),
    })
    os.makedirs(f"{SRC}/{dst}", exist_ok=True)
    pq.write_table(table, f"{SRC}/{dst}/documents.parquet",
                   row_group_size=max(2500, n // 20))
    nl = con.execute(
        f"SELECT avg(len(string_split(text, chr(10)))) FROM read_parquet('{SRC}/{dst}/documents.parquet')"
    ).fetchone()[0]
    print(f"{dst}: {n} docs, avg {nl:.1f} lines/doc")
