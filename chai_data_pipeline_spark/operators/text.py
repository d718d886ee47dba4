"""Text-analysis operators: word/token stats, language ID, quality
scoring, fingerprinting.

All pure column expressions (JVM-side, codegen) — no UDFs. This is the
realization of the reference's declared-but-unimplemented clean_posts
spec (reference: scripts/silver/transform_silver.py:82-95 — title/body
lengths, word_count, avg_word_length, has_links, sentiment_score) plus
the LLM-pipeline text ops (lang-id, quality, token counting,
fingerprints).

Scale: every function here is a narrow projection over one string
column — embarrassingly parallel, no shuffle, survives any scale-up.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# deterministic tiny sentiment lexicon (word -> weight); the reference
# declares a sentiment_score column but never populates it — we model it
# as lexicon hits per token, a pure column expression
_POS = ["good", "great", "fast", "small", "new"]
_NEG = ["bad", "slow", "error", "fail", "old"]


def words(col: str) -> Column:
    """Whitespace-token array (matches pandas str.split() semantics)."""
    return F.split(F.trim(F.col(col)), r"\s+")


def word_count(col: str) -> Column:
    return F.size(words(col))


def avg_word_length(col: str) -> Column:
    """Total non-whitespace chars / word count (double)."""
    return F.length(F.regexp_replace(F.col(col), r"\s", "")) / word_count(col)


def has_links(col: str) -> Column:
    return F.col(col).rlike("https?://")


def token_count(col: str) -> Column:
    """BPE-ish tokenizer: letter runs, digit runs, single punctuation."""
    # idx=0 = whole match (Spark defaults to capture group 1)
    return F.size(F.regexp_extract_all(F.col(col), F.lit(TOKEN_PATTERN), 0))


def distinct_word_ratio(col: str) -> Column:
    return F.size(F.array_distinct(words(col))) / F.size(words(col))


def word_ngrams(col: str, n: int, presplit: bool = False) -> Column:
    """Array of space-joined word ``n``-grams (empty when < n words).

    Pure column expression (codegen); the DuckDB mirror is
    :func:`word_ngrams_sql_duckdb` — both slice the same whitespace
    token array, so gram strings are byte-identical across engines.

    ``presplit=True`` treats ``col`` as an already-split array<string>
    column. The expression references its input several times; a regex
    split inlined at each reference is the dominant per-row cost, so
    callers should project ``words(text)`` in a SEPARATE select first
    (CollapseProject won't duplicate non-cheap expressions across a
    projection boundary) and pass the array column here.
    """
    w = col if presplit else f"split(trim({col}), '\\\\s+')"
    return F.expr(
        f"CASE WHEN size({w}) < {n} THEN CAST(array() AS array<string>) "
        f"ELSE transform(sequence(1, size({w}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({w}, i, {n}))) END"
    )


def word_ngrams_sql_duckdb(col: str, n: int) -> str:
    """DuckDB fragment mirroring :func:`word_ngrams` (1-based inclusive
    list_slice; range upper bound exclusive)."""
    w = f"string_split_regex(TRIM({col}), '\\s+')"
    return (
        f"CASE WHEN len({w}) < {n} THEN [] "
        f"ELSE list_transform(range(1, len({w}) - {n - 2}), "
        f"i -> array_to_string(list_slice({w}, i, i + {n - 1}), ' ')) END"
    )


def _occurrences(padded: str, marker: str) -> str:
    """SQL fragment: count of non-overlapping marker occurrences via the
    length/replace identity — chosen because it is bit-identical in any
    engine (no regex dialect differences)."""
    return (
        f"CAST((LENGTH({padded}) - LENGTH(REPLACE({padded}, '{marker}', '')))"
        f" / LENGTH('{marker}') AS INTEGER)"
    )


LANG_MARKERS = {
    "en": [" the ", " and "],
    "es": [" el ", " la "],
    "de": [" der ", " und "],
    "fr": [" le ", " et "],
}


def lang_scores(col: str) -> dict[str, Column]:
    """Marker-word occurrence score per language (n-gram heuristic).

    NULL text scores 0, explicitly: Spark's concat propagates NULL
    while DuckDB's skips it, so without the COALESCE the two engines
    disagree on whether a NULL document has NULL or zero scores.
    """
    padded = f"concat(' ', lower(coalesce({col}, '')), ' ')"
    return {
        lang: sum(
            (F.expr(_occurrences(padded, m)) for m in markers), F.lit(0)
        ).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    }


def lang_scores_sql(col: str) -> dict[str, str]:
    # COALESCE mirrors lang_scores: NULL text scores 0 on both engines
    padded = f"CONCAT(' ', LOWER(COALESCE({col}, '')), ' ')"
    return {
        lang: " + ".join(_occurrences(padded, m) for m in markers)
        for lang, markers in LANG_MARKERS.items()
    }


def predict_lang(s_en, s_es, s_de, s_fr) -> Column:
    """Deterministic argmax with fixed priority order en>es>de>fr."""
    return (
        F.when((s_en >= s_es) & (s_en >= s_de) & (s_en >= s_fr) & (s_en > 0), "en")
        .when((s_es >= s_de) & (s_es >= s_fr) & (s_es > 0), "es")
        .when((s_de >= s_fr) & (s_de > 0), "de")
        .when(s_fr > 0, "fr")
        .otherwise("und")
    )


PREDICT_LANG_SQL = """
CASE WHEN {en} >= {es} AND {en} >= {de} AND {en} >= {fr} AND {en} > 0 THEN 'en'
     WHEN {es} >= {de} AND {es} >= {fr} AND {es} > 0 THEN 'es'
     WHEN {de} >= {fr} AND {de} > 0 THEN 'de'
     WHEN {fr} > 0 THEN 'fr'
     ELSE 'und' END
"""


def quality_score(col: str, n_chars_col: str) -> Column:
    """Reference-style penalty CASE chain (transform_silver.py:319-336
    shape): start at 100, subtract per defect."""
    wc = word_count(col)
    ratio = distinct_word_ratio(col)
    return (
        F.lit(100)
        - F.when(wc < 10, 30).otherwise(0)
        - F.when(F.col(n_chars_col) < 80, 20).otherwise(0)
        - F.when(ratio < 0.5, 20).otherwise(0)
    )


def quality_rating(score: Column) -> Column:
    return (
        F.when(score >= 90, "EXCELLENT")
        .when(score >= 70, "GOOD")
        .when(score >= 50, "FAIR")
        .otherwise("POOR")
    )


def sentiment_score(col: str) -> Column:
    """Lexicon sentiment: (pos hits - neg hits) / word_count, double."""
    padded = f"concat(' ', lower({col}), ' ')"
    pos = sum(
        (F.expr(_occurrences(padded, f" {w} ")) for w in _POS), F.lit(0)
    )
    neg = sum(
        (F.expr(_occurrences(padded, f" {w} ")) for w in _NEG), F.lit(0)
    )
    return (pos - neg) / word_count(col)


def sentiment_score_sql(col: str) -> str:
    padded = f"CONCAT(' ', LOWER({col}), ' ')"
    pos = " + ".join(_occurrences(padded, f" {w} ") for w in _POS)
    neg = " + ".join(_occurrences(padded, f" {w} ") for w in _NEG)
    return f"(({pos}) - ({neg}))"


def fingerprint(col: str, length: int = 16) -> Column:
    """Deterministic document fingerprint: sha256 of the
    whitespace-normalized lowercased text, truncated."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(col), r"\s+", " ")))
    return F.substring(F.sha2(norm, 256), 1, length)
