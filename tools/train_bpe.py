"""Train the frozen BPE merges table (functions/bpe.py:_MERGES).

Standard byte-pair-encoding training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") over the
synthetic documents corpus: words are lowercased [a-z0-9]+ runs, each
starts as a character sequence, and each round merges the globally
most-frequent adjacent unit pair (ties broken lexicographically so the
table is fully deterministic). The resulting ranked merges are FROZEN
as a literal in functions/bpe.py — at 100 TB the merges table is
exactly this kind of artifact: trained once offline, then broadcast
(here: folded into the row-local expression as constants).

Run: python tools/train_bpe.py [sf_dir] [n_merges]
Prints the _MERGES literal to paste into functions/bpe.py.
"""

from __future__ import annotations

import collections
import re
import sys

import duckdb


def train(sf_dir: str = "/root/testdata/sf0.01", n_merges: int = 48) -> list[tuple[str, str]]:
    con = duckdb.connect()
    texts = con.execute(
        f"SELECT coalesce(text, '') FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    con.close()
    word_freq: collections.Counter[tuple[str, ...]] = collections.Counter()
    for (t,) in texts:
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            word_freq[tuple(w)] += 1

    merges: list[tuple[str, str]] = []
    vocab = dict(word_freq)
    for _ in range(n_merges):
        pairs: collections.Counter[tuple[str, str]] = collections.Counter()
        for word, freq in vocab.items():
            for a, b in zip(word, word[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        # deterministic: max count, then lexicographically smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for word, freq in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(word):
                if i + 1 < len(word) and word[i] == best[0] and word[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + freq
        vocab = new_vocab
    return merges


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    merges = train(sf_dir, n)
    print("_MERGES: tuple[tuple[str, str], ...] = (")
    for a, b in merges:
        print(f'    ("{a}", "{b}"),')
    print(")")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
