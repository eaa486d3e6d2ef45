"""Text analysis for training-data pipelines: tokenization stats,
quality scoring, language ID, fingerprinting.

All pure column expressions (Spark SQL strings) with DuckDB twins —
no Python in the hot path, so a 100 TB corpus pass is scan-bound.
"""

from __future__ import annotations

# Language marker words (tiny stopword profiles). Prediction = argmax
# of marker-hit counts with lexicographic tie-break — a deterministic,
# engine-portable n-gram-profile classifier skeleton. (Real profiles
# would be larger; the *mechanism* — tokenize, count profile hits,
# argmax — is the operator.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "value", "row"),
    "de": ("der", "und", "table", "merge"),
    "es": ("el", "los", "data", "group"),
    "fr": ("le", "la", "join", "line"),
    "zh": ("spark", "stream", "batch", "window"),
}

STOPWORDS = ("the", "a", "and", "of", "in")


def _in_list(vals: tuple[str, ...]) -> str:
    return ", ".join(f"'{v}'" for v in vals)


# ------------------------------------------------------------ Spark side
def spark_marker_score(toks: str, lang: str) -> str:
    return (
        f"size(filter({toks}, t -> t IN ({_in_list(LANG_MARKERS[lang])})))"
    )


def spark_lang_pred(toks: str) -> str:
    """argmax over language marker scores; ties → lexicographically
    greatest language (array_max struct ordering, same as DuckDB)."""
    structs = ", ".join(
        f"named_struct('score', {spark_marker_score(toks, lang)}, 'lang', '{lang}')"
        for lang in sorted(LANG_MARKERS)
    )
    return f"array_max(array({structs})).lang"


def spark_stopword_ratio(toks: str) -> str:
    return (
        f"round(size(filter({toks}, t -> t IN ({_in_list(STOPWORDS)}))) "
        f"/ size({toks}), 4)"
    )


def spark_fingerprint(col: str, max_chars: int = 256) -> str:
    """Position-weighted rolling character hash over the first
    `max_chars` chars (document fingerprint; word_count.go's varint
    key encode is the closest reference shape — a compact stable
    digest of ordered content)."""
    return (
        f"CAST(aggregate(transform(sequence(1, least(length({col}), {max_chars})), "
        f"i -> ascii(substring({col}, i, 1)) * ((i * 2654435761) % 1000003)), "
        f"CAST(0 AS BIGINT), (acc, v) -> acc + v) % 2147483647 AS BIGINT)"
    )


# ----------------------------------------------------------- DuckDB side
def duck_marker_score(toks: str, lang: str) -> str:
    return (
        f"len(list_filter({toks}, t -> t IN ({_in_list(LANG_MARKERS[lang])})))"
    )


def duck_lang_pred(toks: str) -> str:
    structs = ", ".join(
        "{'score': " + duck_marker_score(toks, lang) + ", 'lang': '" + lang + "'}"
        for lang in sorted(LANG_MARKERS)
    )
    return f"struct_extract(list_aggregate([{structs}], 'max'), 'lang')"


def duck_stopword_ratio(toks: str) -> str:
    return (
        f"round(len(list_filter({toks}, t -> t IN ({_in_list(STOPWORDS)}))) "
        f"/ len({toks}), 4)"
    )


def duck_fingerprint(col: str, max_chars: int = 256) -> str:
    return (
        f"CAST(list_sum(list_transform(range(1, least(length({col}), {max_chars}) + 1), "
        f"i -> ascii(substr({col}, i, 1)) * ((i * 2654435761) % 1000003))) "
        f"% 2147483647 AS BIGINT)"
    )
