"""Hypothesis property tests for the scalar surface (SURVEY §5 item 3).

Promised properties: idempotence of the renaming/sanitizing functions
(F3/F4, norm), unaccent parity with Python unicodedata semantics (F1),
extension-map totality (F2/F5). Each property evaluates a generated
batch through the REAL Spark expressions (one job per example) and
compares against the property statement / Python reference.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from monday_etl_automation_spark.functions.scalar import (
    _strip_accents,
    file_ext,
    make_signed_filename,
    norm_name,
    sanitize_drive_name,
    unaccent,
)

# Latin + accents + separators + the characters F4 sanitizes.
_ALPHABET = 'abzAXZ 09éàüñÉÀÜÑçÇøŁ.-_signé/\\:*?"<>|\tpdf'

_names = st.lists(
    st.text(alphabet=_ALPHABET, min_size=0, max_size=24), min_size=1, max_size=64
)

_SETTINGS = settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


def _ref_make_signed_filename(base: str, suffix: str = " SIGNÉ") -> str:
    """Python port of the reference (fixed_signature_utils.py:116-124)."""
    name = base.strip()
    if suffix.lower() in name.lower():
        return name if name.lower().endswith(".pdf") else f"{name}.pdf"
    if name.lower().endswith(".pdf"):
        return name[:-4] + f"{suffix}.pdf"
    return name + f"{suffix}.pdf"


@_SETTINGS
@given(_names)
def test_make_signed_filename_matches_reference(spark, names):
    df = spark.createDataFrame([(v,) for v in names], "s string")
    rows = df.select("s", make_signed_filename(F.col("s")).alias("a")).collect()
    for r in rows:
        assert r.a == _ref_make_signed_filename(r.s), r.s


@_SETTINGS
@given(_names)
def test_make_signed_filename_idempotent(spark, names):
    # blank-only names are the reference's own non-idempotent edge
    # (strip() on the second pass removes the leading space of ' SIGNÉ'):
    # exclude them, as the reference does implicitly by never renaming
    # empty filenames.
    names = [v for v in names if v.strip()]
    if not names:
        return
    df = spark.createDataFrame([(v,) for v in names], "s string")
    once = make_signed_filename(F.col("s"))
    rows = df.select(once.alias("a"), make_signed_filename(once).alias("b")).collect()
    for r in rows:
        assert r.a == r.b


@_SETTINGS
@given(_names)
def test_sanitize_drive_name_idempotent(spark, names):
    df = spark.createDataFrame([(v,) for v in names], "s string")
    once = sanitize_drive_name(F.col("s"))
    rows = df.select(once.alias("a"), sanitize_drive_name(once).alias("b")).collect()
    for r in rows:
        assert r.a == r.b


@_SETTINGS
@given(_names)
def test_norm_name_idempotent(spark, names):
    df = spark.createDataFrame([(v,) for v in names], "s string")
    once = norm_name(F.col("s"))
    rows = df.select(once.alias("a"), norm_name(once).alias("b")).collect()
    for r in rows:
        assert r.a == r.b


@_SETTINGS
@given(_names)
def test_unaccent_matches_python_unicodedata(spark, names):
    """JVM translate-based unaccent == Python NFD-strip for every char
    it claims to cover (1-char decompositions; Ø/Ł etc. untouched by
    both)."""
    df = spark.createDataFrame([(v,) for v in names], "s string")
    rows = df.select("s", unaccent(F.col("s")).alias("u")).collect()
    for r in rows:
        assert r.u == _strip_accents(r.s), (r.s, r.u)


_KNOWN_EXTS = {"pdf", "jpg", "jpeg", "png", "xlsx", "xls", "docx", "doc", "txt", ""}


@_SETTINGS
@given(_names)
def test_file_ext_total_and_lowercase(spark, names):
    df = spark.createDataFrame([(v,) for v in names], "s string")
    rows = df.select(file_ext(F.col("s")).alias("e")).collect()
    for r in rows:
        assert r.e in _KNOWN_EXTS
        assert r.e == r.e.lower()
