"""Monday-domain fixtures derived from the TPC-H-ish test tables.

The reference's data model (SURVEY.md §1; FIXTURES.md Part B) is
board/item/column-cell/file/asset. We derive those shapes
deterministically from the driver tables with **dialect-common SQL**
(runs unchanged on Spark SQL and DuckDB), so every operator that
consumes them has an exact DuckDB oracle: the oracle query simply
prepends the same CTEs.

Derivation:

- ``files``  — one row per lineitem: the *exploded* file-column cell
  (reference shape: ``json.loads(value)["files"]``,
  fixed_signature_utils.py:301-306). File name = part name + a
  deterministic keyword suffix (accents included, for unaccent
  matching, Leyton_depot.py:133-138) + a deterministic extension
  (mixed case, for the lower() path, Leyton_depot.py:140-145).
  ``created_at`` is NULL for linenumber 7 (epoch-0 default path,
  Leyton_depot.py:291).
- ``assets`` — the asset registry (join target of SURVEY J1),
  keyed on asset_id with NULL public_url for ``asset_id % 13 = 0``
  (left-join null path, Leyton_depot.py:384-386).
- ``rules``  — MATCH_RULES as data (Leyton_depot.py:68-116): tiered
  include/exclude keyword + file-type + pick rules with fallbacks.

NOTE (l_orderkey, l_linenumber) is not unique in the synthetic
lineitem, so asset_id is intentionally non-unique across ``files``
rows; ``assets`` columns are pure functions of asset_id so the
DISTINCT dimension is well-defined.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from monday_etl_automation_spark.sources.tables import register_views

# ---------------------------------------------------------------------------
# Dialect-common CTE bodies (Spark SQL == DuckDB SQL for this subset)
# ---------------------------------------------------------------------------

FILES_SQL = """
SELECT
  l.l_orderkey AS item_id,
  CASE WHEN l.l_linenumber % 2 = 0 THEN 'file_col_a' ELSE 'file_col_b' END AS column_id,
  l.l_orderkey * 10 + l.l_linenumber AS asset_id,
  p.p_name
    || CASE l.l_suppkey % 5
         WHEN 0 THEN ' SIGNÉ'
         WHEN 1 THEN ' escaneado'
         WHEN 2 THEN ' FINAL'
         WHEN 3 THEN ' borrador v2'
         ELSE ''
       END
    || CASE l.l_partkey % 5
         WHEN 0 THEN '.pdf'
         WHEN 1 THEN '.PDF'
         WHEN 2 THEN '.jpg'
         WHEN 3 THEN '.xlsx'
         ELSE '.txt'
       END AS file_name,
  CASE WHEN l.l_linenumber = 7 THEN NULL ELSE l.l_shipdate END AS created_at,
  CAST(l.l_extendedprice AS BIGINT) AS size_bytes
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
""".strip()

# DISTINCT on the bare key, url derived AFTER (r18): public_url is a
# pure function of asset_id, so deduping (asset_id, public_url) and
# deduping asset_id alone yield identical rows — but the key-only form
# shuffles one BIGINT instead of BIGINT+string and builds the url only
# for the ~0.9N surviving rows (guide §2.3 narrower exchange; measured
# 0.91 -> 0.69s for the distinct alone at sf0.1). Same text on both
# engines, so every oracle sees the same rewrite.
ASSETS_SQL = """
SELECT asset_id,
  CASE WHEN asset_id % 13 = 0 THEN NULL
       ELSE 'https://assets.local/' || CAST(asset_id AS STRING)
  END AS public_url
FROM (SELECT DISTINCT l_orderkey * 10 + l_linenumber AS asset_id FROM lineitem) d
""".strip()

ITEMS_SQL = """
SELECT
  o_orderkey AS item_id,
  5001741596 AS board_id,
  'Item ' || CAST(o_orderkey AS STRING) AS item_name,
  'LOT_' || CAST(o_custkey % 10 AS STRING) AS text_lot,
  o_orderstatus AS status,
  CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE CAST(o_totalprice AS STRING) END AS display_value,
  CAST(o_totalprice AS STRING) AS text_value
FROM orders
""".strip()

# MATCH_RULES as data (Leyton_depot.py:68-116). tier 0 = main rule,
# tier >= 1 = fallbacks; fallbacks deliberately carry no keyword filters
# (Leyton_depot.py:314-321). pick in (latest|first|all); max_count NULL = no cap.
RULES_SQL = """
SELECT * FROM (
  VALUES
    ('file_col_a', 0, 'widget', NULL,        'borrador', 'pdf',  'latest', CAST(NULL AS INT)),
    ('file_col_a', 1, NULL,     NULL,        NULL,       'pdf',  'latest', CAST(NULL AS INT)),
    ('file_col_a', 2, NULL,     NULL,        NULL,       'any',  'latest', CAST(NULL AS INT)),
    ('file_col_b', 0, 'sign',   'escaneado', NULL,       'any',  'all',    3),
    ('file_col_b', 1, NULL,     NULL,        NULL,       'any',  'first',  CAST(NULL AS INT))
) AS t(column_id, tier, include_kw1, include_kw2, exclude_kw1, file_type, pick, max_count)
""".strip()

_CTES = {
    "files": FILES_SQL,
    "assets": ASSETS_SQL,
    "items": ITEMS_SQL,
    "rules": RULES_SQL,
}


def with_fixtures(select_sql: str, names: tuple[str, ...] = ("files", "assets", "items", "rules")) -> str:
    """Wrap ``select_sql`` with the fixture CTEs (for DuckDB oracles)."""
    ctes = ",\n".join(f"{n} AS (\n{_CTES[n]}\n)" for n in names)
    return f"WITH {ctes}\n{select_sql}"


def register_fixture_views(spark: SparkSession, sf_dir: str) -> None:
    """Register base tables + fixture views in the SparkSession.

    The fixtures are plain views over the parquet scans — Catalyst
    inlines them, so filter pushdown and column pruning reach the scan
    through the view (verified via ``.explain``).
    """
    register_views(spark, sf_dir)
    if getattr(spark, "_mea_fixtures_sf_dir", None) == sf_dir:
        return
    for name, sql in _CTES.items():
        spark.sql(sql).createOrReplaceTempView(name)
    spark._mea_fixtures_sf_dir = sf_dir  # noqa: SLF001
