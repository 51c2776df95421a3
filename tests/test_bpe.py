"""Frozen-merges BPE tokenizer (functions/bpe.py): exactness
preconditions, equivalence to the iterative GPT-2 algorithm, Spark ==
DuckDB == Python parity, and the BPE-budgeted chunk/pack path."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from monday_etl_automation_spark.functions.bpe import (
    _MERGES,
    bpe_token_count_py,
    bpe_tokens_py,
)
from monday_etl_automation_spark.plans.text_ops import (
    TOKEN_COUNT_ORACLE,
    chunk_documents,
    chunk_oracle,
    token_count_bpe,
)
from oracle_compare import assert_matches_oracle

_CASES = (
    "The vector merge is slow, slow scan!",
    "a b a b",
    "tab c",
    "",
    "???",
    "customerorder batch123  hash hash",
    "filterfilter smallsmall",
    "aaa",
    None,
)


def _gpt2_tokens(text: str | None) -> list[str]:
    """Reference: the ITERATIVE min-rank merge loop (GPT-2 bpe())."""
    ranks = {pair: i for i, pair in enumerate(_MERGES)}

    def word_bpe(w: str) -> list[str]:
        word = list(w)
        while len(word) > 1:
            best = min(
                (ranks.get(p, 10**9) for p in zip(word, word[1:])), default=10**9
            )
            if best == 10**9:
                break
            a, b = _MERGES[best]
            out: list[str] = []
            i = 0
            while i < len(word):
                if i + 1 < len(word) and word[i] == a and word[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = out
        return word

    toks: list[str] = []
    for w in re.findall(r"[a-z0-9]+", (text or "").lower()):
        toks.extend(word_bpe(w))
    return toks


def test_merge_products_distinct():
    """The one-pass-ranked-replace == iterative-min-rank equivalence
    holds only while all merge products are distinct strings (a rank-r
    product string-equal to an earlier pair's part would let rank r
    create a missed earlier match). Guard the precondition."""
    products = [a + b for a, b in _MERGES]
    assert len(set(products)) == len(products)
    # rules are alnum-only: the '|' boundary and '@' marker never merge
    assert all(re.fullmatch(r"[a-z0-9]+", a + b) for a, b in _MERGES)


def test_one_pass_equals_gpt2_iterative(spark, sf_dir):
    for t in _CASES:
        assert bpe_tokens_py(t) == _gpt2_tokens(t), t
    # corpus-wide: every document tokenizes identically under both
    from monday_etl_automation_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    for (text,) in spark.sql("SELECT text FROM documents").collect():
        assert bpe_tokens_py(text) == _gpt2_tokens(text)


def test_token_count_matches_oracle_and_python(spark, sf_dir):
    df = token_count_bpe(spark, sf_dir)
    assert_matches_oracle(df, TOKEN_COUNT_ORACLE, sf_dir)
    rows = df.collect()
    texts = {
        r.doc_id: r.text
        for r in spark.sql("SELECT doc_id, text FROM documents").collect()
    }
    for r in rows:
        text = texts[r.doc_id]
        assert r.n_bpe_tokens == bpe_token_count_py(text)
        # subword count is bounded below by the alnum WORD count (>= 1
        # unit per word) and above by the alnum character count
        words = re.findall(r"[a-z0-9]+", (text or "").lower())
        assert len(words) <= r.n_bpe_tokens <= sum(len(w) for w in words)


def test_chunk_bpe_counter_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        chunk_documents(spark, sf_dir, counter="bpe"),
        chunk_oracle(counter="bpe"),
        sf_dir,
    )


def test_pack_sequences_on_bpe_budget(spark, sf_dir):
    """Packing on BPE counts: every sequence respects the budget, every
    chunk is packed exactly once, and totals equal the chunk totals."""
    from monday_etl_automation_spark.plans.packing_ops import pack_sequences

    budget = 512
    packed = pack_sequences(spark, sf_dir, budget=budget, counter="bpe")
    per_seq = packed.groupBy("shard", "seq_idx").agg(
        F.sum("n_chunk_tokens").alias("seq_tokens")
    )
    assert per_seq.where(F.col("seq_tokens") > budget).count() == 0
    chunks = chunk_documents(spark, sf_dir, counter="bpe")
    assert packed.count() == chunks.count()
    got = packed.agg(F.sum("n_chunk_tokens")).collect()[0][0]
    want = chunks.agg(F.sum("n_chunk_tokens")).collect()[0][0]
    assert got == want


def test_encode_documents_matches_oracle_and_python(spark, sf_dir):
    from monday_etl_automation_spark.plans.tokenize_ops import (
        encode_documents,
        encode_oracle,
    )
    from monday_etl_automation_spark.functions.bpe import bpe_token_ids_py

    df = encode_documents(spark, sf_dir)
    assert_matches_oracle(df, encode_oracle(), sf_dir)
    texts = {
        r.doc_id: r.text
        for r in spark.sql("SELECT doc_id, text FROM documents").collect()
    }
    got: dict[int, list[int]] = {}
    for r in df.collect():
        got.setdefault(r.doc_id, []).append((r.pos, r.token_id))
    for doc_id, pairs in list(got.items())[:50]:
        ids = [t for _, t in sorted(pairs)]
        assert ids == bpe_token_ids_py(texts[doc_id])


def test_packed_token_sequences_invariants(spark, sf_dir):
    """Real input_ids assembly: sequence id-counts equal the packer's
    token totals, never exceed the budget, and cover every chunk id."""
    from monday_etl_automation_spark.plans.tokenize_ops import packed_token_sequences

    budget = 512
    seqs = packed_token_sequences(spark, sf_dir, budget=budget).collect()
    assert seqs
    for r in seqs:
        assert len(r.token_ids) == r.n_tokens <= budget
        # doc_spans partition token_ids: each span is one chunk's run,
        # so an attention mask can reset at every cumulative boundary
        assert sum(r.doc_spans) == r.n_tokens
        assert all(n > 0 for n in r.doc_spans)
    from monday_etl_automation_spark.plans.text_ops import chunk_documents
    total = (
        chunk_documents(spark, sf_dir, counter="bpe")
        .groupBy().sum("n_chunk_tokens").collect()[0][0]
    )
    assert sum(r.n_tokens for r in seqs) == total


def test_one_pass_equals_gpt2_on_random_text():
    """Property: the one-pass ranked replace equals the iterative
    min-rank algorithm on arbitrary text (not just corpus-shaped),
    including adversarial runs of mergeable characters."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = st.sampled_from(list("abcdefghijklmnopqrstuvwxyz0123456789 .!?\t\n") )

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet=alphabet, max_size=80))
    def prop(t):
        assert bpe_tokens_py(t) == _gpt2_tokens(t)

    prop()
    # adversarial: long runs of pair-forming chars (overlap handling)
    for t in ("er" * 30, "e r " * 20, "ororor or or", "v e c t o r" * 5,
              "scanscan scan can an n", "slowslowslow", "a" * 50):
        assert bpe_tokens_py(t) == _gpt2_tokens(t), t


def test_packed_token_sequences_eod(spark, sf_dir):
    """eod=True: the reserved terminator id sits exactly AT every
    cumulative doc_span boundary, nowhere else, budgets include the
    terminators, and stripping EOD recovers the eod=False ids."""
    from monday_etl_automation_spark.plans.tokenize_ops import (
        eod_token_id,
        packed_token_sequences,
    )

    budget = 512
    eid = eod_token_id()
    assert eid == 36 + 48 + 1
    plain_rows = packed_token_sequences(spark, sf_dir, budget=budget).collect()
    seqs = packed_token_sequences(spark, sf_dir, budget=budget, eod=True).collect()
    assert seqs
    for r in seqs:
        ids = list(r.token_ids)
        assert len(ids) == r.n_tokens <= budget
        assert sum(r.doc_spans) == r.n_tokens
        bounds = []
        c = 0
        for n in r.doc_spans:
            c += n
            bounds.append(c)
        # EOD exactly at the cumulative boundaries, nowhere else
        assert [i + 1 for i, t in enumerate(ids) if t == eid] == bounds
    # same packing problem (+1 per chunk can shift FFD assignments, so
    # compare content globally): stripped ids == plain ids, chunk-set-wise
    stripped = []
    for r in seqs:
        c = 0
        for n in r.doc_spans:
            stripped.append(tuple(r.token_ids[c : c + n - 1]))
            c += n
    plain_chunks = []
    for r in plain_rows:
        c = 0
        for n in r.doc_spans:
            plain_chunks.append(tuple(r.token_ids[c : c + n]))
            c += n
    assert sorted(stripped) == sorted(plain_chunks)
