"""Vectorized large-vocabulary BPE tokenizer (Arrow pandas-UDF path).

``functions/bpe.py`` folds the frozen merges table into one scalar
expression chain — exact, whole-stage-codegen'd, cross-engine
(Spark == DuckDB hash-identical), but structurally O(|merges|)
nested ``replace`` calls: right for the frozen 48-merge table, and
impossible for a production 32k-merge vocabulary (the expression tree
itself would be tens of thousands of nodes deep).

This module is the production-vocab path: the SAME ranked merges
table applied by the standard per-word merge loop (Sennrich et al.
2016's encoder — each merge rank applied as one left-to-right pass
inside each word, in rank order, exactly the semantics of the
expression chain and of ``tools/train_bpe.py``'s training loop)
inside an Arrow-batched pandas UDF.

Scale posture (100 TB): the merges table is an offline-trained
artifact (a few MB at 32k merges) shipped once per executor via an
explicit Spark broadcast; tokenization stays a map-only stage — no
shuffle, Arrow both directions, and a per-task distinct-word memo
(natural text is Zipfian, so the memo hit rate is high and per-row
cost collapses to a dict lookup for common words).

Path selection across the codebase (the two implementations are
pinned token-identical at the frozen 48 merges in
tests/test_bpe_fast.py::test_fast_ids_match_expression_chain):

- **small frozen vocab (<= ~64 merges)** — ``text_profile``,
  ``token_count_bpe``, chunking and packing (``counter='bpe'``) use
  the bpe.py expression chain: zero Python, codegen'd, and DuckDB
  can run the identical SQL, which is what the driver's strict hash
  compare needs.
- **production vocab (>= ~1k merges)** — this module. Exercised at
  1,000 trained merges (``tools/train_bpe.py --extended``, artifact
  ``functions/data/bpe_merges_1k.json``) with the UDF output pinned
  to an independently-implemented iterative min-rank encoder.

Reference behavior parity: the reference tokenizes nothing (it is a
webhook ETL), so this family is part of the training-data-pipeline
surface mandated by the build brief, not a ported operator.
"""

from __future__ import annotations

import json
import os
from typing import Iterable, Mapping, Sequence

# module scope, NOT function-local: `from __future__ import annotations`
# stringifies the pandas-UDF type hints, and PySpark's infer_eval_type
# resolves them against THIS module's globals — a function-local import
# makes @pandas_udf raise [UNSUPPORTED_SIGNATURE] at definition time.
import pandas as pd

from .bpe import _MERGES as FROZEN_MERGES

_BASE_CHARS = tuple("0123456789abcdefghijklmnopqrstuvwxyz")

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
MERGES_1K_PATH = os.path.join(_DATA_DIR, "bpe_merges_1k.json")
# production-scale artifact (8,192 merges, extended corpus at sf0.1):
# real vocabs are 32k-100k; the word-memo design makes throughput
# ~flat in vocab size (tests/test_bpe_fast.py pins parity + timing)
MERGES_8K_PATH = os.path.join(_DATA_DIR, "bpe_merges_8k.json")


# ---------------------------------------------------------------- core


def merge_word(word: str, merges: Sequence[tuple[str, str]]) -> tuple[str, ...]:
    """Apply the ranked merges to one ``[a-z0-9]+`` word: for each
    rank in order, one left-to-right pass replacing every adjacent
    (a, b) occurrence with ``a+b`` — the Sennrich encoder, identical
    to bpe.py's ``replace`` chain restricted to this word.

    The unit-presence set makes the common case (merge touches
    nothing in this word) two set lookups instead of a scan, so cost
    is ~O(applied merges x word length), not O(|merges| x length).
    """
    units: list[str] = list(word)
    if len(units) < 2:
        return tuple(units)
    present = set(units)
    for a, b in merges:
        if len(units) < 2:
            break
        if a not in present or b not in present:
            continue
        out: list[str] = []
        i = 0
        n = len(units)
        ab = a + b
        merged = False
        while i < n:
            if i + 1 < n and units[i] == a and units[i + 1] == b:
                out.append(ab)
                i += 2
                merged = True
            else:
                out.append(units[i])
                i += 1
        if merged:
            units = out
            present = set(units)
    return tuple(units)


def bpe_tokens_fast(
    text: str | None,
    merges: Sequence[tuple[str, str]],
    cache: dict[str, tuple[str, ...]] | None = None,
) -> list[str]:
    """Tokenize free text: lowercase, split on non-[a-z0-9] runs
    (word isolation — merges never cross words, same as bpe.py), BPE
    each word. ``cache`` memoizes distinct words across calls."""
    import re

    out: list[str] = []
    for w in re.findall(r"[a-z0-9]+", (text or "").lower()):
        if cache is not None:
            units = cache.get(w)
            if units is None:
                units = merge_word(w, merges)
                cache[w] = units
        else:
            units = merge_word(w, merges)
        out.extend(units)
    return out


def vocab_for(merges: Sequence[tuple[str, str]]) -> tuple[str, ...]:
    """Deterministic vocabulary induced by a merges table: 36 base
    chars in lexical order, then one product per merge in rank order
    (same scheme as bpe.py:bpe_vocab; ids are 1-based positions)."""
    return _BASE_CHARS + tuple(a + b for a, b in merges)


def vocab_ids(merges: Sequence[tuple[str, str]]) -> dict[str, int]:
    return {u: i + 1 for i, u in enumerate(vocab_for(merges))}


def bpe_token_ids_fast(
    text: str | None,
    merges: Sequence[tuple[str, str]],
    ids: Mapping[str, int] | None = None,
    cache: dict[str, tuple[str, ...]] | None = None,
) -> list[int]:
    if ids is None:
        ids = vocab_ids(merges)
    return [ids[t] for t in bpe_tokens_fast(text, merges, cache)]


# ---------------------------------------------------------- artifacts


def save_merges(merges: Sequence[tuple[str, str]], path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(
            {"n_merges": len(merges), "merges": [[a, b] for a, b in merges]},
            f,
            separators=(",", ":"),
        )


def load_merges(path: str = MERGES_1K_PATH) -> tuple[tuple[str, str], ...]:
    """Load a trained merges artifact (rank order preserved)."""
    with open(path, encoding="utf-8") as f:
        doc = json.load(f)
    return tuple((a, b) for a, b in doc["merges"])


# ------------------------------------------------------------- spark


def bpe_ids_udf(spark, merges: Sequence[tuple[str, str]] | None = None):
    """Arrow-batched pandas UDF ``string -> array<bigint>`` encoding
    text to 1-based vocab ids under ``merges`` (default: the frozen
    48-merge table, for parity pins against the expression chain).

    The merges + id table ride an explicit SparkContext broadcast —
    one executor-side copy regardless of task count; the UDF closure
    holds only the broadcast handle. The per-task ``cache`` dict
    persists across Arrow batches within a task. The (broadcast, UDF)
    pair is memoized per (session, merges identity): repeated calls in
    a long-lived session reuse one broadcast instead of accumulating
    executor-side blocks per call.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    table = tuple((a, b) for a, b in (merges if merges is not None else FROZEN_MERGES))
    store = getattr(spark, "_mea_bpe_fast_udfs", None)
    if store is None:
        store = {}
        spark._mea_bpe_fast_udfs = store  # noqa: SLF001
    cached = store.get(table)
    if cached is not None:
        return cached

    bc = spark.sparkContext.broadcast({"merges": table, "ids": vocab_ids(table)})

    @pandas_udf(ArrayType(LongType()))
    def encode(texts: pd.Series) -> pd.Series:
        m = bc.value["merges"]
        ids = bc.value["ids"]
        cache: dict[str, tuple[str, ...]] = {}
        return pd.Series(
            [bpe_token_ids_fast(t, m, ids, cache) for t in texts]
        )

    store[table] = encode
    return encode


def with_bpe_ids_fast(df, text_col: str, out_col: str = "token_ids", merges=None):
    """Map-only stage adding ``out_col`` = array<bigint> token ids of
    ``text_col`` via the vectorized tokenizer. No shuffle: this is a
    projection, so it pipelines into whatever scan/exchange the input
    plan already has."""
    udf = bpe_ids_udf(df.sparkSession, merges)
    return df.withColumn(out_col, udf(df[text_col]))


# ----------------------------------------------- independent checker


def bpe_tokens_min_rank(
    text: str | None, merges: Sequence[tuple[str, str]]
) -> list[str]:
    """Independent GPT-2-style encoder: per word, repeatedly merge
    the lowest-rank adjacent pair until none applies. Equivalent to
    the rank-order pass while merge products are distinct strings
    (same argument as bpe.py's module docstring); used by tests as a
    cross-implementation check, never in production paths."""
    import re

    rank = {tuple(m): i for i, m in enumerate(merges)}
    out: list[str] = []
    for w in re.findall(r"[a-z0-9]+", (text or "").lower()):
        units = list(w)
        while len(units) > 1:
            best_i = -1
            best_r = len(rank)
            for i, pair in enumerate(zip(units, units[1:])):
                r = rank.get(pair)
                if r is not None and r < best_r:
                    best_r = r
                    best_i = i
            if best_i < 0:
                break
            a, b = merges[best_r]
            ab = a + b
            nxt: list[str] = []
            i = 0
            while i < len(units):
                if i + 1 < len(units) and units[i] == a and units[i + 1] == b:
                    nxt.append(ab)
                    i += 2
                else:
                    nxt.append(units[i])
                    i += 1
            units = nxt
        out.extend(units)
    return out
