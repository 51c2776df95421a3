"""Binary/document pipeline queries (SURVEY.md §2.9, B1-B7).

Each query runs the REAL distributed pipeline (mapInPandas over Arrow
batches, per-page explode/reassemble, seeded effects) on binary
content derived from ``documents``; the DuckDB oracle re-derives the
exact page counts and byte sizes from ``length(text)`` alone — the
fake codecs' size model (multimodal/codecs.py) is an exact function
of (n_chars, dpi, quality), so a full value match here proves the
distributed dataflow (fan-out, ordering, reassembly, composition)
without needing binary-capable SQL. Content hashes are additionally
checked for determinism in tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from monday_etl_automation_spark.multimodal import codecs, pipeline
from monday_etl_automation_spark.sources.tables import load_table

_PRESET = "balanced"
_DPI, _Q = codecs.quality_preset(_PRESET)
_RASTER = codecs.raster_size(_DPI)  # 225 at 150 dpi
_JPG_BLOCK = 13 + 20 + (_RASTER * _Q) // 200
_SCAN_BLOCK = 13 + (20 + _RASTER + 8)  # scan preserves size; A4 adds 8

_N_PAGES_SQL = "CAST(GREATEST(1, CAST(ceil(length(text) / 200.0) AS INT)) AS BIGINT)"


def _docs_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pipeline.documents_to_binary(load_table(spark, sf_dir, "documents"))


def b1_compress_pdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        pipeline.compress_pdf(_docs_bin(spark, sf_dir), _PRESET)
        .drop("out_sha")
        .orderBy("doc_id")
    )


B1_ORACLE = f"""
SELECT
  doc_id,
  {_N_PAGES_SQL} AS n_pages,
  CAST(10 + {_N_PAGES_SQL} * 13 + length(text) AS BIGINT) AS in_bytes,
  CAST(10 + {_N_PAGES_SQL} * {_JPG_BLOCK} AS BIGINT) AS out_bytes
FROM documents
ORDER BY doc_id
""".strip()


def b7_scanned_pdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        pipeline.scanned_pdf(_docs_bin(spark, sf_dir), _PRESET, _DPI)
        .drop("out_sha")
        .orderBy("doc_id")
    )


B7_ORACLE = f"""
SELECT
  doc_id,
  {_N_PAGES_SQL} AS n_pages,
  CAST(10 + {_N_PAGES_SQL} * {_SCAN_BLOCK} AS BIGINT) AS out_bytes
FROM documents
ORDER BY doc_id
""".strip()


def b5_sign_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        pipeline.sign_pipeline(_docs_bin(spark, sf_dir), signer="engine", preset=_PRESET)
        .drop("out_sha")
        .orderBy("doc_id")
    )


B5_ORACLE = f"""
SELECT
  doc_id,
  'doc_' || CAST(doc_id AS VARCHAR) || ' SIGNÉ.pdf' AS file_name,
  {_N_PAGES_SQL} AS n_pages,
  CAST(10 + {_N_PAGES_SQL} * {_JPG_BLOCK} + 68 AS BIGINT) AS out_bytes
FROM documents
ORDER BY doc_id
""".strip()


QUERIES: dict[str, tuple] = {
    "b1_compress_pdf": (b1_compress_pdf, B1_ORACLE),
    "b7_scanned_pdf": (b7_scanned_pdf, B7_ORACLE),
    "b5_sign_pipeline": (b5_sign_pipeline, B5_ORACLE),
}
