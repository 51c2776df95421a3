"""Train the frozen BPE merges table (functions/bpe.py:_MERGES and
the large-vocab artifact functions/data/bpe_merges_1k.json).

Standard byte-pair-encoding training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") over the
synthetic documents corpus: words are lowercased [a-z0-9]+ runs, each
starts as a character sequence, and each round merges the globally
most-frequent adjacent unit pair (ties broken lexicographically so the
table is fully deterministic). The resulting ranked merges are FROZEN
as artifacts — at 100 TB the merges table is exactly this kind of
artifact: trained once offline, then broadcast (the 48-merge table
folds into a row-local expression; the >=1k-merge table ships as a
JSON artifact consumed by functions/bpe_fast.py's Arrow path).

Corpus modes:
- default: documents.text words only. The synthetic corpus has just
  31 distinct words (~107 possible merges), which caps the vocab —
  fine for the frozen 48-merge expression-chain table.
- --extended: additionally tokenizes the decimal renderings of
  orders.o_orderkey as words. Numeric identifiers give the deep,
  wide merge hierarchy of a real corpus (thousands of distinct
  digit-string "words"), letting training run past 1k merges; real
  training corpora tokenize numbers and ids the same way.

The training loop is the standard incremental one: a global pair
counter plus a pair->words index, updating only the words that
contain the merged pair each round — O(occurrences) per merge, not
O(corpus), so a 1k-merge train finishes in seconds.

Run: python tools/train_bpe.py [sf_dir] [n_merges] [--extended]
     [--json OUT.json]
Prints the _MERGES literal (or writes the JSON artifact).
"""

from __future__ import annotations

import collections
import os
import re
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(sf_dir: str, extended: bool = False) -> collections.Counter:
    con = duckdb.connect()
    texts = con.execute(
        f"SELECT coalesce(text, '') FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    word_freq: collections.Counter[str] = collections.Counter()
    for (t,) in texts:
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            word_freq[w] += 1
    if extended:
        keys = con.execute(
            f"SELECT CAST(o_orderkey AS VARCHAR) FROM read_parquet('{sf_dir}/orders.parquet')"
        ).fetchall()
        for (k,) in keys:
            word_freq[k] += 1
    con.close()
    return word_freq


def train_from_words(
    word_freq: collections.Counter, n_merges: int
) -> list[tuple[str, str]]:
    # vocab: word key -> (units tuple, freq)
    vocab: dict[str, tuple[tuple[str, ...], int]] = {
        w: (tuple(w), f) for w, f in word_freq.items()
    }
    pair_counts: collections.Counter[tuple[str, str]] = collections.Counter()
    pair_words: dict[tuple[str, str], set[str]] = collections.defaultdict(set)
    for w, (units, f) in vocab.items():
        for p in zip(units, units[1:]):
            pair_counts[p] += f
            pair_words[p].add(w)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        live = [(p, c) for p, c in pair_counts.items() if c > 0]
        if not live:
            break
        # deterministic: max count, then lexicographically smallest pair
        best = min(live, key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        merged = a + b
        for w in list(pair_words.get(best, ())):
            units, f = vocab[w]
            # retract old pair contributions
            for p in zip(units, units[1:]):
                pair_counts[p] -= f
                s = pair_words.get(p)
                if s is not None:
                    s.discard(w)
            out: list[str] = []
            i = 0
            while i < len(units):
                if i + 1 < len(units) and units[i] == a and units[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(units[i])
                    i += 1
            new_units = tuple(out)
            vocab[w] = (new_units, f)
            for p in zip(new_units, new_units[1:]):
                pair_counts[p] += f
                pair_words[p].add(w)
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
    return merges


def train(
    sf_dir: str = "/root/testdata/sf0.01",
    n_merges: int = 48,
    extended: bool = False,
) -> list[tuple[str, str]]:
    return train_from_words(build_corpus(sf_dir, extended), n_merges)


def main() -> int:
    argv = [a for a in sys.argv[1:]]
    extended = "--extended" in argv
    if extended:
        argv.remove("--extended")
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print(
                "usage: train_bpe.py [sf_dir] [n_merges] [--extended]"
                " [--json OUT.json]",
                file=sys.stderr,
            )
            return 2
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    n = int(argv[1]) if len(argv) > 1 else 48
    merges = train(sf_dir, n, extended=extended)
    if json_out:
        from monday_etl_automation_spark.functions.bpe_fast import save_merges

        save_merges(merges, json_out)
        print(f"wrote {len(merges)} merges -> {json_out}")
        return 0
    print("_MERGES: tuple[tuple[str, str], ...] = (")
    for a, b in merges:
        print(f'    ("{a}", "{b}"),')
    print(")")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
