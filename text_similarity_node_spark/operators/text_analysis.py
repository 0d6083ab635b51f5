"""Text analysis operators for training-data pipelines.

All pure Column expressions (JVM, codegen) — language id, quality scoring,
token counting, fingerprinting.  The langid heuristic is a marker-word
scorer with a fixed, documented priority order so results are deterministic
and SQL-expressible for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# marker words per language, fixed order = deterministic tie-break priority
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "es", "y"),
}
LANG_PRIORITY = ("en", "de", "fr", "es")


def _marker_hits(tokens: Column, lang: str) -> Column:
    markers = list(LANG_MARKERS[lang])
    return F.size(F.filter(tokens, lambda t: t.isin(*markers)))


def predict_lang(tokens: Column) -> Column:
    """argmax of marker hits with fixed priority tie-break; 'und'
    (undetermined) when no marker hits at all."""
    scores = {lang: _marker_hits(tokens, lang) for lang in LANG_PRIORITY}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # build reversed priority CASE: earlier langs win ties
    for lang in reversed(LANG_PRIORITY):
        expr = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def langid_sql_case(text_expr: str = "text") -> str:
    """The DuckDB-equivalent SQL of predict_lang (kept adjacent so the two
    can't drift)."""
    def hits(lang: str) -> str:
        markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        return (
            f"len(list_filter(regexp_extract_all({text_expr}, '\\w+'),"
            f" t -> t IN ({markers})))"
        )

    score_cols = {lang: hits(lang) for lang in LANG_PRIORITY}
    greatest = "greatest(" + ", ".join(score_cols.values()) + ")"
    case = f"CASE WHEN {greatest} = 0 THEN 'und'"
    for lang in LANG_PRIORITY:
        case += f" WHEN {score_cols[lang]} = {greatest} THEN '{lang}'"
    case += " ELSE 'und' END"
    return case
