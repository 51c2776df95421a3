"""Parity + wiring pins for the vectorized large-vocab BPE path
(functions/bpe_fast.py), promised by its module docstring:

- the fast per-word merge loop is token-identical to the frozen
  48-merge expression chain (functions/bpe.py) over the corpus and
  randomized strings;
- at the 1k-merge trained artifact it matches the independent
  GPT-2-style min-rank encoder;
- the Spark pandas-UDF path round-trips on the documents table with a
  map-only plan (no exchange) and in-bounds ids, matches the pure
  Python reference row for row, and memoizes the (session, merges)
  broadcast;
- the production call sites (encode_documents /
  packed_token_sequences) select the fast path above the vocab
  threshold and keep their invariants under the 1k vocab.
"""

from __future__ import annotations

import os
import random
import string

import pytest

from monday_etl_automation_spark.functions import bpe_fast
from monday_etl_automation_spark.functions.bpe import (
    _MERGES as FROZEN_MERGES,
    bpe_token_ids_py,
    bpe_tokens_py,
)

MERGES_1K = bpe_fast.load_merges()


def _corpus_texts(sf_dir: str) -> list[str]:
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT coalesce(text, '') FROM read_parquet('{sf_dir}/documents.parquet')"
        " ORDER BY doc_id"
    ).fetchall()
    con.close()
    return [t for (t,) in rows]


def _random_texts(n: int, seed: int = 12) -> list[str]:
    rng = random.Random(seed)
    alphabet = string.ascii_lowercase + "0123456789 .,-_|@ABZ"
    out = []
    for _ in range(n):
        out.append("".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 80))))
    return out


def test_fast_ids_match_expression_chain(sf_dir):
    """The pin cited by bpe_fast.py's docstring: at the frozen 48
    merges, the fast encoder == the expression-chain reference, tokens
    AND ids, over the whole corpus plus randomized/edge strings."""
    cache: dict[str, tuple[str, ...]] = {}
    samples = _corpus_texts(sf_dir) + _random_texts(300) + [
        "", None, "   ", "@@@", "a", "join hash partition JOIN",
        "0matchmatch", "ababab row row row",
    ]
    for t in samples:
        assert bpe_fast.bpe_tokens_fast(t, FROZEN_MERGES, cache) == bpe_tokens_py(t)
        assert bpe_fast.bpe_token_ids_fast(
            t, FROZEN_MERGES, cache=cache
        ) == bpe_token_ids_py(t)


def test_1k_merges_match_min_rank_encoder(sf_dir):
    """At the 1,000-merge trained artifact the rank-order pass equals
    the independent min-rank (GPT-2-style) encoder — valid because all
    merge products are distinct strings (asserted here too)."""
    products = [a + b for a, b in MERGES_1K]
    assert len(MERGES_1K) == 1000
    assert len(set(products)) == len(products)
    cache: dict[str, tuple[str, ...]] = {}
    for t in _corpus_texts(sf_dir) + _random_texts(300, seed=34) + [
        "", None, "1409 1410 999999", "order 58368 order 58368",
    ]:
        assert bpe_fast.bpe_tokens_fast(t, MERGES_1K, cache) == (
            bpe_fast.bpe_tokens_min_rank(t, MERGES_1K)
        )


def test_vocab_ids_are_contiguous_and_1_based():
    ids = bpe_fast.vocab_ids(MERGES_1K)
    assert sorted(ids.values()) == list(range(1, 36 + len(MERGES_1K) + 1))
    # base chars occupy the same 36 leading slots as bpe.py's vocab
    assert ids["a"] == 11 and ids["0"] == 1


def test_spark_round_trip_map_only(spark, sf_dir):
    """with_bpe_ids_fast on documents: map-only plan (no exchange),
    ids in vocab bounds, and row-identical to the Python reference."""
    from monday_etl_automation_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    out = bpe_fast.with_bpe_ids_fast(docs, "text", "token_ids", merges=MERGES_1K)
    plan = out._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        out._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan  # projection pipelines into the scan
    rows = out.collect()
    assert rows
    vocab_hi = 36 + len(MERGES_1K)
    cache: dict[str, tuple[str, ...]] = {}
    ids_map = bpe_fast.vocab_ids(MERGES_1K)
    for r in rows:
        assert all(1 <= t <= vocab_hi for t in r.token_ids)
        assert list(r.token_ids) == bpe_fast.bpe_token_ids_fast(
            r.text, MERGES_1K, ids_map, cache
        )


def test_udf_broadcast_memoized(spark):
    """Repeated bpe_ids_udf calls with the same merges table reuse one
    (broadcast, UDF) pair — no per-call executor broadcast leak."""
    u1 = bpe_fast.bpe_ids_udf(spark, MERGES_1K)
    u2 = bpe_fast.bpe_ids_udf(spark, MERGES_1K)
    assert u1 is u2
    u3 = bpe_fast.bpe_ids_udf(spark)  # frozen table: distinct entry
    assert u3 is not u1
    assert u3 is bpe_fast.bpe_ids_udf(spark, FROZEN_MERGES)


def test_encode_documents_fast_path(spark, sf_dir):
    """encode_documents(merges=1k) routes through the Arrow path and
    produces the same long format as the Python reference."""
    from monday_etl_automation_spark.plans.tokenize_ops import encode_documents

    df = encode_documents(spark, sf_dir, merges=MERGES_1K)
    assert [f.name for f in df.schema.fields] == ["doc_id", "pos", "token_id"]
    texts = {
        r.doc_id: r.text
        for r in spark.sql("SELECT doc_id, text FROM documents").collect()
    }
    got: dict[int, list[tuple[int, int]]] = {}
    for r in df.collect():
        got.setdefault(r.doc_id, []).append((r.pos, r.token_id))
    assert got
    cache: dict[str, tuple[str, ...]] = {}
    ids_map = bpe_fast.vocab_ids(MERGES_1K)
    for doc_id, pairs in list(got.items())[:50]:
        ids = [t for _, t in sorted(pairs)]
        assert ids == bpe_fast.bpe_token_ids_fast(
            texts[doc_id], MERGES_1K, ids_map, cache
        )


def test_packed_token_sequences_fast_path_invariants(spark, sf_dir):
    """packed_token_sequences(merges=1k): budgets and ids come from the
    SAME fast-path array — spans partition token_ids, totals respect
    the budget, ids stay in the 1k vocab bounds, and every chunk id is
    covered exactly once."""
    from monday_etl_automation_spark.plans.tokenize_ops import packed_token_sequences

    budget = 512
    seqs = packed_token_sequences(
        spark, sf_dir, budget=budget, merges=MERGES_1K
    ).collect()
    assert seqs
    vocab_hi = 36 + len(MERGES_1K)
    for r in seqs:
        assert len(r.token_ids) == r.n_tokens <= budget
        assert sum(r.doc_spans) == r.n_tokens
        assert all(n > 0 for n in r.doc_spans)
        assert all(1 <= t <= vocab_hi for t in r.token_ids)
    # coverage: total packed ids == total ids of every chunk under the
    # fast tokenizer (ws-chunked, same as the packing input)
    from monday_etl_automation_spark.plans.text_ops import chunk_documents
    import pyspark.sql.functions as F

    udf = bpe_fast.bpe_ids_udf(spark, MERGES_1K)
    total = (
        chunk_documents(spark, sf_dir, counter="ws")
        .select(F.size(udf(F.col("chunk_text"))).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert sum(r.n_tokens for r in seqs) == total


@pytest.mark.parametrize("argv", [["--json"]])
def test_train_bpe_json_flag_requires_value(argv, monkeypatch, capsys):
    import sys
    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
    )
    import train_bpe

    monkeypatch.setattr(sys, "argv", ["train_bpe.py", *argv])
    assert train_bpe.main() == 2
    assert "usage" in capsys.readouterr().err


def test_save_merges_bare_filename(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    bpe_fast.save_merges([("a", "b")], "m.json")
    assert bpe_fast.load_merges(str(tmp_path / "m.json")) == (("a", "b"),)


def test_packed_token_sequences_eod_fast_path(spark, sf_dir):
    """eod=True at the 1k vocab: terminator id = 36+1000+1, at every
    cumulative span boundary and nowhere else, budget respected."""
    from monday_etl_automation_spark.plans.tokenize_ops import (
        eod_token_id,
        packed_token_sequences,
    )

    budget = 512
    eid = eod_token_id(MERGES_1K)
    assert eid == 36 + 1000 + 1
    seqs = packed_token_sequences(
        spark, sf_dir, budget=budget, merges=MERGES_1K, eod=True
    ).collect()
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
        assert [i + 1 for i, t in enumerate(ids) if t == eid] == bounds
        # every non-EOD id stays inside the text vocab
        assert all(1 <= t <= 1036 for t in ids if t != eid)


MERGES_8K = bpe_fast.load_merges(bpe_fast.MERGES_8K_PATH)


def test_8k_merges_match_min_rank_encoder(sf_dir):
    """Production-scale artifact (8,192 merges): the rank-order pass
    equals the independent min-rank encoder — the vocab-dimension
    scale pin (1k proved the algorithm; real vocabs are 32k-100k).
    Valid because all merge products are distinct strings."""
    products = [a + b for a, b in MERGES_8K]
    assert len(MERGES_8K) == 8192
    assert len(set(products)) == len(products)
    cache: dict[str, tuple[str, ...]] = {}
    for t in _corpus_texts(sf_dir) + _random_texts(300, seed=88) + [
        "", None, "1409 1410 999999", "105788 105790 1057",
        "0" * 40, "12345678901234567890",
    ]:
        assert bpe_fast.bpe_tokens_fast(t, MERGES_8K, cache) == (
            bpe_fast.bpe_tokens_min_rank(t, MERGES_8K)
        )


def test_8k_udf_ids_in_bounds(spark, sf_dir):
    """The Arrow path at the 8k vocab: map-only round trip, ids in
    [1, 36+8192], and row-identical to the Python reference on a
    sample (same shape pin as the 1k test — the point is the vocab
    size changes nothing structurally)."""
    from monday_etl_automation_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text").limit(200)
    out = bpe_fast.with_bpe_ids_fast(docs, "text", "token_ids", merges=MERGES_8K)
    rows = out.collect()
    assert rows
    vocab_hi = 36 + len(MERGES_8K)
    cache: dict[str, tuple[str, ...]] = {}
    ids_map = bpe_fast.vocab_ids(MERGES_8K)
    for r in rows:
        assert all(1 <= t <= vocab_hi for t in r.token_ids)
        assert list(r.token_ids) == bpe_fast.bpe_token_ids_fast(
            r.text, MERGES_8K, ids_map, cache
        )
