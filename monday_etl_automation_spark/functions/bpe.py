"""Real subword tokenization: frozen-merges BPE as a row-local
expression (SURVEY.md §2.12 — the r8 verdict's "real tokenizer" item).

The merges table (trained by tools/train_bpe.py, standard BPE per
Sennrich et al. 2016 over the corpus, frozen below) is applied inside
ONE scalar expression chain, so tokenization is a map stage: no UDF,
no shuffle, whole-stage codegen in Spark and vectorized in DuckDB —
the 100 TB shape for a tokenizer (the merges table is the broadcast
artifact; here it folds into the expression as constants).

Algorithm — and why it is EXACT BPE, not an approximation:

1. lowercase; collapse every non-[a-z0-9] run to a single ``|``
   boundary unit (word isolation — merges never cross words).
2. wrap every character c as ``@c@`` and concatenate. The double
   marker between adjacent units means a merge match never shares a
   boundary character with the next match, so one left-to-right
   ``replace`` pass merges exactly the occurrences GPT-2's
   scan-and-merge pass does (e.g. "a b a b" -> "ab ab", not "ab a b"),
   and ``@`` occurs only at unit boundaries so a match can never
   start inside a longer unit ("tab c" never matches rule (ab, c)).
3. apply merge rank r as ``replace(s, '@a@@b@', '@ab@')`` in rank
   order. Equivalence to the iterative min-rank algorithm: a rank-q
   pair's parts are products of merges < q, so applying rank r can
   only create a pair matching rank q < r if r's product token is
   string-equal to one of q's parts — impossible while all merge
   products are distinct strings (they are, asserted in
   tests/test_bpe.py::test_merge_products_distinct). Hence applying
   each rank globally once, in rank order, yields the identical
   segmentation.
4. token count = units - boundary units = count('@')/2 - count('|').

Cross-engine exactness: pure string ops (lower / regexp_replace /
replace / length) with identical semantics in Spark and DuckDB — no
floats anywhere, so the driver's strict hash compare holds.
"""

from __future__ import annotations

# ranked merges trained by `python tools/train_bpe.py /root/testdata/sf0.01 48`
# (deterministic: most-frequent pair per round, ties lexicographic)
_MERGES: tuple[tuple[str, str], ...] = (
    ("e", "r"),
    ("i", "n"),
    ("o", "w"),
    ("o", "r"),
    ("s", "t"),
    ("m", "er"),
    ("a", "t"),
    ("l", "u"),
    ("a", "r"),
    ("p", "ar"),
    ("j", "o"),
    ("jo", "in"),
    ("a", "s"),
    ("as", "h"),
    ("h", "ash"),
    ("r", "ow"),
    ("at", "c"),
    ("atc", "h"),
    ("b", "atch"),
    ("a", "n"),
    ("c", "an"),
    ("s", "can"),
    ("c", "o"),
    ("c", "u"),
    ("co", "lu"),
    ("colu", "m"),
    ("colum", "n"),
    ("cu", "st"),
    ("cust", "o"),
    ("custo", "mer"),
    ("f", "i"),
    ("fi", "l"),
    ("fil", "t"),
    ("filt", "er"),
    ("a", "l"),
    ("al", "l"),
    ("m", "all"),
    ("s", "mall"),
    ("g", "e"),
    ("l", "ow"),
    ("mer", "ge"),
    ("s", "low"),
    ("c", "t"),
    ("ct", "or"),
    ("d", "er"),
    ("e", "ctor"),
    ("or", "der"),
    ("v", "ector"),
)

_BOUNDARY = "|"  # never merges: rules are [a-z0-9]-only
_MARK = "@"


def bpe_unit_string_expr(dialect: str, col: str) -> str:
    """SQL expression: ``col`` -> the fully-merged ``@u@@u@...`` unit
    string (the segmentation itself, for tests and token extraction)."""
    lowered = f"lower(coalesce({col}, ''))"
    if dialect == "spark":
        bounded = f"regexp_replace({lowered}, '[^a-z0-9]+', '{_BOUNDARY}')"
        wrapped = f"regexp_replace({bounded}, '(.)', '{_MARK}$1{_MARK}')"
    else:
        bounded = f"regexp_replace({lowered}, '[^a-z0-9]+', '{_BOUNDARY}', 'g')"
        wrapped = f"regexp_replace({bounded}, '(.)', '{_MARK}\\1{_MARK}', 'g')"
    s = wrapped
    for a, b in _MERGES:
        s = f"replace({s}, '{_MARK}{a}{_MARK}{_MARK}{b}{_MARK}', '{_MARK}{a}{b}{_MARK}')"
    return s


def bpe_count_from_units_expr(dialect: str, col: str) -> str:
    """SQL expression: a ``bpe_unit_string_expr`` COLUMN -> BIGINT BPE
    token count (word-internal units only; boundary units excluded).

    Callers materialize the unit string once per row in a CTE column
    and count from that column — inlining the ~50-replace chain here
    would quadruplicate it (length+replace each reference it twice).
    Integer division only (count('@') is always even): `/` would go
    through DOUBLE, and CAST(double AS BIGINT) truncates in Spark but
    rounds in DuckDB (CLAUDE.md rule)."""
    idiv = "DIV" if dialect == "spark" else "//"
    count_at = f"(length({col}) - length(replace({col}, '{_MARK}', '')))"
    count_bar = f"(length({col}) - length(replace({col}, '{_BOUNDARY}', '')))"
    return f"CAST({count_at} {idiv} 2 - {count_bar} AS BIGINT)"


def bpe_tokens_py(text: str | None) -> list[str]:
    """Python reference implementation of the SAME algorithm (one-pass
    ranked replace over the wrapped-unit string) for property tests."""
    import re

    bounded = re.sub(r"[^a-z0-9]+", _BOUNDARY, (text or "").lower())
    s = "".join(f"{_MARK}{c}{_MARK}" for c in bounded)
    for a, b in _MERGES:
        s = s.replace(f"{_MARK}{a}{_MARK}{_MARK}{b}{_MARK}", f"{_MARK}{a}{b}{_MARK}")
    units = [u for u in s.split(_MARK) if u]
    return [u for u in units if u != _BOUNDARY]


def bpe_token_count_py(text: str | None) -> int:
    return len(bpe_tokens_py(text))


def bpe_vocab() -> tuple[str, ...]:
    """The deterministic vocabulary induced by the frozen merges: the
    36 base characters in lexical order, then one product per merge in
    rank order. Every unit the tokenizer can emit is in this tuple
    (base chars cover any unmerged character; products cover every
    merge), so id lookup never misses. Ids are 1-based positions —
    array_position/list_position semantics shared by both engines."""
    base = tuple("0123456789abcdefghijklmnopqrstuvwxyz")
    return base + tuple(a + b for a, b in _MERGES)


def bpe_token_ids_expr(dialect: str, unit_col: str) -> str:
    """SQL expression: a ``bpe_unit_string_expr`` COLUMN -> ARRAY of
    1-based BIGINT token ids (boundary units dropped). The vocab rides
    the expression as an array literal — the broadcast-merges-table
    posture, same as the merge chain itself."""
    vocab = ", ".join(f"'{u}'" for u in bpe_vocab())
    if dialect == "spark":
        units = f"filter(split(trim(BOTH '{_MARK}' FROM {unit_col}), '{_MARK}{_MARK}'), t -> t <> '{_BOUNDARY}' AND t <> '')"
        return f"transform({units}, t -> array_position(array({vocab}), t))"
    units = (
        f"list_filter(string_split(trim({unit_col}, '{_MARK}'), '{_MARK}{_MARK}'),"
        f" t -> t <> '{_BOUNDARY}' AND t <> '')"
    )
    return f"list_transform({units}, t -> CAST(list_position([{vocab}], t) AS BIGINT))"


def bpe_token_ids_py(text: str | None) -> list[int]:
    """Python reference: tokens -> 1-based vocab ids."""
    vocab = {u: i + 1 for i, u in enumerate(bpe_vocab())}
    return [vocab[t] for t in bpe_tokens_py(text)]
