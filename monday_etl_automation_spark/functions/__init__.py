from monday_etl_automation_spark.functions.scalar import (
    dossier_name,
    ext_from_name_or_ctype,
    file_ext,
    lot_name,
    make_signed_filename,
    mime_from_name,
    norm_name,
    sanitize_drive_name,
    unaccent,
)

__all__ = [
    "dossier_name",
    "ext_from_name_or_ctype",
    "file_ext",
    "lot_name",
    "make_signed_filename",
    "mime_from_name",
    "norm_name",
    "sanitize_drive_name",
    "unaccent",
]
