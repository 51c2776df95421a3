"""Image/audio/video pipeline queries (SURVEY §2.12 multimodal columns).

Each runs the REAL distributed media dataflow (multimodal/media.py:
binary + typed metadata through Arrow mapInPandas stages); the DuckDB
oracle recomputes the exact integer size/feature model from
``documents.n_chars`` and md5 — full value matches prove the
distributed plumbing without binary-capable SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from monday_etl_automation_spark.multimodal import media
from monday_etl_automation_spark.sources.tables import load_table

_W = "100 + n_chars % 512"
_H = "100 + (n_chars * 7) % 512"


def _media(spark: SparkSession, sf_dir: str, kind_mod: int | None = None) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    if kind_mod is not None:
        # push the kind predicate below the (expensive) binary
        # generation — the scan filter prunes before mapInPandas runs
        docs = docs.where(f"doc_id % 3 = {kind_mod}")
    return media.documents_to_media(docs)


def media_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media.resize_images(_media(spark, sf_dir, kind_mod=0)).orderBy("doc_id")


IMAGE_RESIZE_ORACLE = f"""
WITH m AS (
  SELECT doc_id, CAST({_W} AS INT) AS w, CAST({_H} AS INT) AS h
  FROM documents WHERE doc_id % 3 = 0
)
SELECT
  doc_id,
  CAST(GREATEST(1, (w * {media.RESIZE_H}) // h) AS INT) AS out_width,
  {media.RESIZE_H} AS out_height,
  CAST(16 + (GREATEST(1, (w * {media.RESIZE_H}) // h) * {media.RESIZE_H}) // 16 AS BIGINT) AS out_bytes
FROM m
ORDER BY doc_id
""".strip()


def media_video_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media.sample_video_frames(_media(spark, sf_dir, kind_mod=2)).orderBy("doc_id")


VIDEO_SAMPLE_ORACLE = f"""
WITH m AS (
  SELECT doc_id, GREATEST(1, n_chars // 40) AS nf
  FROM documents WHERE doc_id % 3 = 2
)
SELECT
  doc_id,
  CAST(nf AS INT) AS n_frames,
  CAST(1 + (nf - 1) // {media.SAMPLE_EVERY} AS INT) AS n_sampled,
  CAST(8 + (1 + (nf - 1) // {media.SAMPLE_EVERY}) * {media.FRAME_BYTES} AS BIGINT) AS out_bytes
FROM m
ORDER BY doc_id
""".strip()


def media_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media.extract_audio_features(_media(spark, sf_dir, kind_mod=1)).orderBy("doc_id")


_FEATS = ",\n  ".join(
    f"CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{i}'), 1, 7) AS BIGINT) AS f{i}"
    for i in range(8)
)

AUDIO_FEATURES_ORACLE = f"""
SELECT
  doc_id,
  {_FEATS}
FROM documents WHERE doc_id % 3 = 1
ORDER BY doc_id
""".strip()


QUERIES: dict[str, tuple] = {
    "media_image_resize": (media_image_resize, IMAGE_RESIZE_ORACLE),
    "media_video_sample": (media_video_sample, VIDEO_SAMPLE_ORACLE),
    "media_audio_features": (media_audio_features, AUDIO_FEATURES_ORACLE),
}
