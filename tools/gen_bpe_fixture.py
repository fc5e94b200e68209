#!/usr/bin/env python3
"""Independent BPE oracle fixture generator for p34_bpe_tokenize.

A from-scratch Python implementation of byte-pair encoding (Sennrich,
Haddow, Birch 2016, arXiv:1508.07909, word-final `</w>` variant) used to
verify the engine's Scala tokenizer: it reads documents.parquet for each
given scale dir, trains 50 merges, tokenizes every document, and writes
`src/main/resources/graft/bpe_expected_<tag>.csv` with one line per doc:
`doc_id,n_tokens,tokens_md5`. CorpusQueries embeds these as a VALUES
table in p34's oracle SQL, so DuckDB compares the Scala tokenizer's
output against THIS implementation's answers (two independent
implementations of the public algorithm must agree bit-for-bit).

Determinism contract (must match BpeTokenizer.scala, both follow the
paper): most-frequent pair wins, ties break on lexicographically
smallest (first, second); merges apply to non-overlapping occurrences
left-to-right; encoding repeatedly merges the lowest-rank adjacent pair.
Training applies the MIN_COUNT frequency floor (the engine's
`minCount = 2` query contract — word types occurring fewer times are
pruned before training; they are still tokenized at apply time).

Usage: python3 tools/gen_bpe_fixture.py sf0.001 sf0.01
"""
import hashlib
import re
import sys

import duckdb

NUM_MERGES = 50
MIN_COUNT = 2
EOW = "</w>"


def words_of(text):
    norm = re.sub(r"[^a-z0-9]+", " ", (text or "").lower()).strip()
    return [w for w in norm.split(" ") if w]


def train(word_counts, num_merges):
    vocab = {}
    for w, c in word_counts.items():
        syms = tuple(list(w) + [EOW])
        vocab[syms] = vocab.get(syms, 0) + c
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append(best)
        vocab = {merge_pair(syms, best): c for syms, c in vocab.items()}
    return merges


def merge_pair(syms, pair):
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def encode_word(word, ranks):
    syms = tuple(list(word) + [EOW])
    while len(syms) > 1:
        ranked = [(ranks.get(p, 1 << 30), p) for p in zip(syms, syms[1:])]
        r, best = min(ranked, key=lambda x: x[0])
        if r >= 1 << 30:
            break
        syms = merge_pair(syms, best)
    return list(syms)


def main():
    con = duckdb.connect()
    for tag in sys.argv[1:]:
        rows = con.execute(
            f"SELECT doc_id, text FROM '/root/testdata/{tag}/documents.parquet' "
            "ORDER BY doc_id").fetchall()
        counts = {}
        for _, text in rows:
            for w in words_of(text):
                counts[w] = counts.get(w, 0) + 1
        pruned = {w: c for w, c in counts.items() if c >= MIN_COUNT}
        ranks = {p: i for i, p in enumerate(train(pruned, NUM_MERGES))}
        memo = {}
        out = []
        lensum = 0
        for doc_id, text in rows:
            lensum += len(text or "")
            toks = []
            for w in words_of(text):
                if w not in memo:
                    memo[w] = encode_word(w, ranks)
                toks.extend(memo[w])
            digest = hashlib.md5(" ".join(toks).encode()).hexdigest()
            out.append(f"{doc_id},{len(toks)},{digest}")
        path = f"src/main/resources/graft/bpe_expected_{tag}.csv"
        with open(path, "w") as f:
            f.write("\n".join(out) + "\n")
        print(f"{tag}: {len(out)} docs, text length sum {lensum} -> {path}")


if __name__ == "__main__":
    main()
