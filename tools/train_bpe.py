#!/usr/bin/env python3
"""One-shot deterministic BPE trainer for the frozen b122 vocab.

Learns N merges from the sf0.01 documents corpus (whitespace
pre-tokenization, merges never cross word boundaries) and writes them in
rank order to src/main/resources/graft/bpe_merges.txt — one merge per
line, "left right". Determinism: pairs ranked by (count DESC, left ASC,
right ASC); re-running on the same corpus reproduces the file byte for
byte. The repo never re-trains at runtime: the checked-in file IS the
tokenizer, applied unchanged to every SF (train once, apply anywhere).

Usage: python3 tools/train_bpe.py [n_merges] [sf_dir]
"""
import sys
from collections import Counter

import duckdb

N = int(sys.argv[1]) if len(sys.argv) > 1 else 64
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
OUT = "src/main/resources/graft/bpe_merges.txt"

texts = [r[0] for r in duckdb.sql(
    f"SELECT text FROM read_parquet('{SF}/documents.parquet')").fetchall()]
words = Counter()
for t in texts:
    for w in t.split(" "):
        if w:
            words[tuple(w)] += 1

merges = []
for _ in range(N):
    pairs = Counter()
    for syms, c in words.items():
        for i in range(len(syms) - 1):
            pairs[(syms[i], syms[i + 1])] += c
    if not pairs:
        break
    best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
    merges.append(best)
    merged = Counter()
    for syms, c in words.items():
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        merged[tuple(out)] += c
    words = merged

with open(OUT, "w") as f:
    for l, r in merges:
        f.write(f"{l} {r}\n")
print(f"wrote {len(merges)} merges to {OUT}")
