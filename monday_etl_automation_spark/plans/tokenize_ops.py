"""Corpus tokenization to token IDS (SURVEY.md §2.12 extension): the
step a real pretraining pipeline runs between text and tensors. Builds
on the frozen-merges BPE (functions/bpe.py) — same row-local
expression chain, so encoding is a map stage at any corpus size.

- ``encode_documents``: (doc_id, pos, token_id) long format — one row
  per token, 1-based ids into the deterministic vocab
  (36 base chars + 48 merge products). Long format keeps the DuckDB
  twin strict-comparable (BIGINT rows, no array columns in the hash).
- ``packed_token_sequences``: the packing assignment
  (plans/packing_ops.py, BPE budgets) joined back to per-chunk token
  ids and assembled into per-(shard, seq) id arrays in the exact FFD
  visit order — what a shard writer would serialize as input_ids.
  Assembly is one grouped collect over the packing's own deterministic
  order; the heavy work (tokenize, pack) happened upstream.

Cross-engine: ids are array positions in a shared literal vocab;
everything else is the proven BPE chain — integer-exact throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from monday_etl_automation_spark.functions.bpe import (
    bpe_token_ids_expr,
    bpe_unit_string_expr,
)
from monday_etl_automation_spark.sources.tables import register_views


def _encode_sql(dialect: str) -> str:
    u = bpe_unit_string_expr(dialect, "text")
    ids = bpe_token_ids_expr(dialect, "bpe_u")
    if dialect == "spark":
        ex = "SELECT doc_id, posexplode(ids) AS (pos, token_id) FROM ids_t"
        pos = "CAST(pos AS BIGINT) AS pos, CAST(token_id AS BIGINT) AS token_id"
    else:
        ex = (
            "SELECT doc_id, unnest(generate_series(1, len(ids))) - 1 AS pos, ids"
            " FROM ids_t"
        )
        pos = "CAST(pos AS BIGINT) AS pos, CAST(ids[pos + 1] AS BIGINT) AS token_id"
    return f"""
WITH t AS (
  SELECT doc_id, {u} AS bpe_u FROM documents
),
ids_t AS (
  SELECT doc_id, {ids} AS ids FROM t
),
ex AS ({ex})
SELECT doc_id, {pos}
FROM ex
ORDER BY doc_id, pos
""".strip()


def encode_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_encode_sql("spark"))


def encode_oracle() -> str:
    return _encode_sql("duckdb")


def packed_token_sequences(
    spark: SparkSession,
    sf_dir: str,
    budget: int = 512,
    n_shards: int = 8,
    chunk_size: int = 64,
    overlap: int = 16,
    doc_ids: DataFrame | None = None,
) -> DataFrame:
    """(shard, seq_idx, token_ids, n_tokens): training sequences with
    REAL token ids, assembled in the packer's deterministic FFD visit
    order (tokens DESC, doc_id, chunk_idx) so re-runs byte-match.
    ``doc_ids`` restricts to those documents (the release pipeline
    passes its released train split).

    The chunk's ids derive from the SAME materialized unit string the
    packer's counter used — assignment and content cannot drift."""
    from monday_etl_automation_spark.plans.packing_ops import pack_sequences
    from monday_etl_automation_spark.plans.text_ops import chunk_documents

    # ONE tokenize pass: the chunker computes the merged unit string
    # per chunk (with_units=True) and is materialized before its two
    # consumers (packer + id derivation) — without this, the packer,
    # the chunk re-read, and a unit-string re-derivation each re-ran
    # the 48-replace BPE chain over every chunk (3x the corpus cost;
    # round-9 code-review finding).
    chunks = chunk_documents(
        spark, sf_dir, chunk_size, overlap, counter="bpe", with_units=True
    )
    if doc_ids is not None:
        chunks = chunks.join(doc_ids.select("doc_id"), "doc_id", "left_semi")
    chunks = chunks.localCheckpoint(eager=True)
    packed = pack_sequences(
        spark, sf_dir, budget=budget, n_shards=n_shards, chunks=chunks
    )
    chunks.createOrReplaceTempView("_tok_chunks")
    ids = spark.sql(
        "SELECT doc_id, chunk_idx, "
        + bpe_token_ids_expr("spark", "bpe_u")
        + " AS chunk_ids FROM _tok_chunks"
    )
    return (
        packed.join(ids, ["doc_id", "chunk_idx"])
        .groupBy("shard", "seq_idx")
        .agg(
            F.flatten(
                # array_sort on (DESC-able key via negation, then asc
                # tie-breaks) reproduces the FFD visit order exactly
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                (-F.col("n_chunk_tokens")).alias("k1"),
                                F.col("doc_id").alias("k2"),
                                F.col("chunk_idx").alias("k3"),
                                F.col("chunk_ids").alias("ids"),
                            )
                        )
                    ),
                    lambda s: s["ids"],
                )
            ).alias("token_ids"),
            # per-chunk lengths in the same visit order: the attention
            # mask resets at each boundary — cumulative sums of
            # doc_spans are the segment starts inside token_ids
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col("n_chunk_tokens")).alias("k1"),
                            F.col("doc_id").alias("k2"),
                            F.col("chunk_idx").alias("k3"),
                            F.col("n_chunk_tokens").alias("n"),
                        )
                    )
                ),
                lambda s: s["n"],
            ).alias("doc_spans"),
            F.sum("n_chunk_tokens").alias("n_tokens"),
        )
        .orderBy("shard", "seq_idx")
    )
