"""Training-shard writer: materialize packed sequences as
size-targeted parquet shards (SURVEY.md §2.12 — the last hop of the
pretraining data pipeline: chunk → pack → SHARD FILES that the
training job streams).

Trainers want shard files of roughly equal token payload: file count
drives dataloader parallelism, and a long-tail file stalls the final
wave of an epoch. The writer assigns whole packed sequences to output
files by a SHARD-LOCAL greedy token cumsum — file f of a shard takes
the sequences whose exclusive running total lands in
[f·budget, (f+1)·budget) — so:

- assignment is deterministic (ordered by seq_idx inside the md5
  shard; no rand(), retry-stable);
- no global state: each packing shard maps independently onto its own
  file sequence, parallelism = n_shards, identical at 100 TB;
- a file's payload overshoots the budget by at most one sequence
  (< the pack budget, i.e. bounded by construction — never by data).

Physical layout: ``out_dir/shard=S/file_seq=F/part-*.parquet`` with
EXACTLY ONE parquet file per (shard, file_seq): the frame is hash-
repartitioned on precisely the partition keys before a partitionBy
write, so each group lands in one task and each task writes one file
per directory it owns — the standard one-file-per-partition recipe.

Returns the manifest (shard, file_seq, n_seqs, n_tokens) — the
dataloader's index, KB-sized at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def plan_shard_files(packed: DataFrame, tokens_per_file: int) -> DataFrame:
    """(shard, seq_idx) -> file_seq by shard-local greedy cumsum."""
    per_seq = packed.groupBy("shard", "seq_idx").agg(
        F.sum("n_chunk_tokens").cast("bigint").alias("seq_tokens")
    )
    w = Window.partitionBy("shard").orderBy("seq_idx")
    cum_excl = F.coalesce(
        F.sum("seq_tokens").over(w) - F.col("seq_tokens"), F.lit(0)
    )
    return per_seq.withColumn(
        "file_seq", (cum_excl / F.lit(tokens_per_file)).cast("bigint")
    )


def write_training_shards(
    packed: DataFrame, out_dir: str, tokens_per_file: int = 4096
) -> DataFrame:
    """Write ``packed`` (pack_sequences output) as size-targeted
    parquet shard files; returns the manifest DataFrame."""
    assign = plan_shard_files(packed, tokens_per_file)
    rows = packed.join(assign.select("shard", "seq_idx", "file_seq"), ["shard", "seq_idx"])
    # one task per (shard, file_seq) group -> exactly one file per dir
    (
        rows.repartition("shard", "file_seq")
        .sortWithinPartitions("shard", "file_seq", "seq_idx", "doc_id", "chunk_idx")
        .write.mode("overwrite")
        .partitionBy("shard", "file_seq")
        .parquet(out_dir)
    )
    return (
        assign.groupBy("shard", "file_seq")
        .agg(
            F.count("*").cast("bigint").alias("n_seqs"),
            F.sum("seq_tokens").cast("bigint").alias("n_tokens"),
        )
        .orderBy("shard", "file_seq")
    )


def read_training_shards(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read a shard directory back; partition columns come from paths."""
    return spark.read.parquet(out_dir)
