#!/usr/bin/env python3
"""One-shot deterministic unigram-LM (SentencePiece-style) vocab trainer
for the frozen b152 tokenizer (Kudo, ACL'18 — subword regularization's
unigram model, here trained deterministically and frozen).

Pipeline (all ties broken lexicographically → byte-reproducible):
  1. seed candidates: every substring of length 2..4 of every corpus word
     (weighted by word count) with weighted count >= 2, plus all 26
     letters (full coverage);
  2. EM-style refinement (3 rounds): Viterbi-segment every distinct word
     under the current integer costs (min total cost, ties -> min
     cut-position bitmask — the same DP the runtime expression runs),
     re-estimate piece probabilities from usage counts, re-derive
     integer costs cost = round(-100 * ln p), drop unused multi-char
     pieces;
  3. prune to the top N multi-char pieces by (usage desc, piece asc);
  4. final re-score with the pruned vocab; letters never pruned (coverage),
     unused letters get the max observed cost + 100.

Writes src/main/resources/graft/unigram_vocab.txt — one "piece cost" per
line, letters a..z first, then kept pieces sorted by (cost asc, piece
asc); the 1-based line number IS the token id. The repo never re-trains
at runtime: the checked-in file IS the tokenizer.

Usage: python3 tools/train_unigram.py [n_pieces] [sf_dir]
"""
import math
import sys
from collections import Counter

import duckdb

N = int(sys.argv[1]) if len(sys.argv) > 1 else 64
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
OUT = "src/main/resources/graft/unigram_vocab.txt"
MAXLEN = 4

texts = [r[0] for r in duckdb.sql(
    f"SELECT text FROM read_parquet('{SF}/documents.parquet')").fetchall()]
words = Counter()
for t in texts:
    for w in t.split(" "):
        if w:
            words[w] += 1

# 1. seed candidates
cand = Counter()
for w, c in words.items():
    for i in range(len(w)):
        for ln in range(2, MAXLEN + 1):
            if i + ln <= len(w):
                cand[w[i:i + ln]] += c
pieces = {p for p, c in cand.items() if c >= 2}
pieces |= {chr(ord('a') + i) for i in range(26)}


def costs_from_counts(counts, vocab):
    total = sum(counts[p] for p in vocab) or 1
    out = {}
    for p in vocab:
        c = counts[p]
        if c > 0:
            out[p] = max(1, round(-100 * math.log(c / total)))
    mx = max(out.values(), default=100)
    for p in vocab:
        if p not in out:
            out[p] = mx + 100  # unused but kept (letters): worst cost
    return out


def viterbi(w, costs):
    """Min total cost; ties -> min interior-cut bitmask (bit i = cut at
    position i). Returns the piece list."""
    L = len(w)
    INF = (1 << 60, 1 << 60)
    dp = [INF] * (L + 1)
    back = [None] * (L + 1)
    dp[0] = (0, 0)
    for i in range(L):
        if dp[i] == INF:
            continue
        ci, mi = dp[i]
        for ln in range(1, min(MAXLEN, L - i) + 1):
            p = w[i:i + ln]
            if p in costs:
                nm = mi + ((1 << i) if i > 0 else 0)
                cand = (ci + costs[p], nm)
                if cand < dp[i + ln]:
                    dp[i + ln] = cand
                    back[i + ln] = (i, p)
    assert dp[L] != INF, f"word {w!r} not coverable"
    out, j = [], L
    while j > 0:
        i, p = back[j]
        out.append(p)
        j = i
    return out[::-1]


# 2. EM-style refinement
counts = Counter({p: cand[p] for p in pieces})
counts.update({chr(ord('a') + i): 1 for i in range(26)})
vocab = set(pieces)
for _ in range(3):
    costs = costs_from_counts(counts, vocab)
    usage = Counter()
    for w, c in words.items():
        for p in viterbi(w, costs):
            usage[p] += c
    vocab = {p for p in vocab if usage[p] > 0 or len(p) == 1}
    counts = usage
    counts.update({chr(ord('a') + i): counts.get(chr(ord('a') + i), 0) or 1
                   for i in range(26)})

# 3. prune to top-N multi-char by (usage desc, piece asc)
multi = sorted((p for p in vocab if len(p) > 1),
               key=lambda p: (-counts[p], p))[:N]
vocab = set(multi) | {chr(ord('a') + i) for i in range(26)}

# 4. final re-score
usage = Counter()
costs = costs_from_counts(counts, vocab)
for w, c in words.items():
    for p in viterbi(w, costs):
        usage[p] += c
final = costs_from_counts(usage, vocab)

letters = [chr(ord('a') + i) for i in range(26)]
rest = sorted((p for p in vocab if len(p) > 1),
              key=lambda p: (final[p], p))
with open(OUT, "w") as f:
    for p in letters + rest:
        f.write(f"{p} {final[p]}\n")
print(f"wrote {26 + len(rest)} pieces to {OUT}")
