"""Semi-structured ingestion: JSON/CSV readers with corrupt-record
routing and schema evolution.

The reference ingests webhook JSON bodies and fails requests wholesale
on any malformed field (app.py:101-102); a data platform cannot — at
100 TB some fraction of every feed is malformed, and the pipeline must
keep the good rows flowing while quarantining the bad ones WITH their
raw payload for replay (same contract as the streaming dead-letter
router, `streaming/pipeline.py:DeadLetterSink`, applied to batch
ingestion).

Mechanics worth noting at scale:
- PERMISSIVE mode + ``columnNameOfCorruptRecord`` parses good rows and
  captures the raw line for bad ones in ONE scan — never a
  parse-then-reparse double read.
- Spark only populates the corrupt-record column if it is part of the
  read schema; these helpers add it for you.
- Schema evolution: a feed that grows columns mid-stream is read with
  the UNION schema (old files yield NULLs) — `read_json_evolving`
  merges per-batch schemas explicitly rather than trusting inference
  over one sampled file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_json_with_quarantine(
    spark: SparkSession, path: str, schema: str | T.StructType
) -> tuple[DataFrame, DataFrame]:
    """One-scan JSON ingestion: returns (good, quarantined).

    good: rows parsed under ``schema``. quarantined: rows Spark could
    not parse — carrying ONLY the raw line (for replay/inspection).
    A row with a null corrupt column parsed cleanly; the split is a
    partition-local filter, no shuffle.
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    read_schema = schema.add(CORRUPT_COL, T.StringType())
    df = (
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    return _split_corrupt(df)


def read_csv_with_quarantine(
    spark: SparkSession, path: str, schema: str | T.StructType, **options
) -> tuple[DataFrame, DataFrame]:
    """CSV twin of `read_json_with_quarantine` (malformed = wrong
    arity / uncastable values under the declared schema)."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    read_schema = schema.add(CORRUPT_COL, T.StringType())
    reader = (
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", options.pop("header", "false"))
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return _split_corrupt(reader.csv(path))


def _split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a PERMISSIVE-parsed frame into (good, quarantined).

    The parse is materialized ONCE (localCheckpoint — the repo's
    no-.cache() rule) before the split: Spark disallows plans whose
    only referenced column is the internal corrupt-record column, and
    materializing also makes the one-scan claim literal — both sides
    read the parsed rows, never the raw text twice. At 100 TB the
    equivalent is the dead-letter pattern: one write partitioned by
    disposition (streaming/pipeline.py:DeadLetterSink), with the
    checkpoint replaced by that write.
    """
    df = df.localCheckpoint(eager=True)
    good = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw")
    )
    return good, bad


def read_json_evolving(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Read JSON batches whose schemas grew over time under their
    UNION schema: every file parses, old batches carry NULLs for
    later-added columns.

    Explicit two-phase (infer per batch → merge → one read with the
    merged schema) instead of a single inference pass over all files:
    Spark's sampled inference can miss late-appearing columns, and the
    merge step is where incompatible type drift (e.g. a column
    flipping int -> string) fails LOUDLY at the boundary instead of
    corrupting rows downstream. Per-batch inference reads only
    metadata-scale samples; the data is scanned once, with the final
    schema.
    """
    schemas = [spark.read.json(p).schema for p in paths]
    merged = schemas[0]
    for s in schemas[1:]:
        for f in s.fields:
            existing = next((g for g in merged.fields if g.name == f.name), None)
            if existing is None:
                merged = merged.add(f)
            elif existing.dataType != f.dataType:
                raise TypeError(
                    f"schema drift on column {f.name!r}: "
                    f"{existing.dataType.simpleString()} vs {f.dataType.simpleString()}"
                )
    return spark.read.schema(merged).json(paths)
