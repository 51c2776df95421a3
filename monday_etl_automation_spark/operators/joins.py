"""Enrichment joins (SURVEY.md §2.3).

J1 — asset->URL enrichment (Leyton_depot.py:372-388). The reference
collects distinct asset ids, batch-resolves URLs in chunks of 50, then
maps them back by hand. In Spark that whole dance is one broadcast
left-outer hash join: the asset registry is a dimension, the distinct
+ chunking are what a broadcast join does internally, and missing
assets come back as NULL url (the reference's ``None`` path).

At 100 TB the fact side never shuffles for this join; if the asset dim
outgrew broadcast size we would bucket both sides on asset_id instead
— the call site would not change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_assets(
    selected: DataFrame,
    assets: DataFrame,
    key: str = "asset_id",
    url_col: str = "public_url",
) -> DataFrame:
    """Left-join the asset registry's public_url onto ``selected``."""
    dim = assets.select(key, url_col)
    return selected.join(F.broadcast(dim), key, "left")
