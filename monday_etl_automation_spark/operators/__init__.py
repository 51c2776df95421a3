from monday_etl_automation_spark.operators.selection import (
    apply_rules,
    candidate_matches,
    parse_file_cells,
)
from monday_etl_automation_spark.operators.joins import enrich_with_assets

__all__ = [
    "apply_rules",
    "candidate_matches",
    "enrich_with_assets",
    "parse_file_cells",
]
