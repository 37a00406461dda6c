"""Text primitives — all JVM-side built-in expressions (whole-stage
codegen, no Python in the hot path).

The reference's dedup unit is a fixed-size byte block
(/root/reference/src/compressor.c:105-107); ours is a document, and the
sub-document unit is the k-shingle set. Shingle construction is pure
Catalyst: split -> transform(sequence) -> slice -> concat_ws -> xxhash64,
so the whole map side stays inside one codegen stage and shuffles only
hashed longs, never token arrays.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# tokenization & shingles
# ---------------------------------------------------------------------------


def normalized_tokens(text: Column | str) -> Column:
    """Lowercased, \\s+ tokenization (FIXTURES.md §4). Empty text -> []."""
    c = F.col(text) if isinstance(text, str) else text
    trimmed = F.trim(F.lower(c))
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(text: Column | str) -> Column:
    return F.size(normalized_tokens(text))


def shingle_hashes(text: Column | str, k: int, seed: int) -> Column:
    """Distinct hashed k-word shingles as array<long>.

    Documents with fewer than k tokens yield an EMPTY array — the analog
    of the reference's dropped trailing partial block
    (src/compressor.c:88-93): explicit, and routed to the exact tier only.
    """
    toks = normalized_tokens(text)
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, k)), F.lit(seed)),
    )
    return F.when(n >= k, F.array_distinct(grams)).otherwise(
        F.array().cast("array<bigint>")
    )


# ---------------------------------------------------------------------------
# text-analysis features (training-data pipeline utilities)
# ---------------------------------------------------------------------------

_STOPWORDS = (
    "the a an and or of to in is are was were be for on with as at by "
    "from this that it not"
).split()

# Character n-gram cues for a tiny deterministic language-ID heuristic.
# Real systems use fastText/CLD3; this is the SQL-expressible stand-in.
_LANG_CUES = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "es": [" el ", " la ", " que "],
}


def with_text_features(df, text_col: str = "text"):
    """Adds token_count, char_count, punct_ratio, stopword_ratio,
    quality_score, lang_guess, fingerprint64 — all built-in expressions.
    """
    t = F.col(text_col)
    low = F.concat(F.lit(" "), F.lower(t), F.lit(" "))
    toks = normalized_tokens(t)
    n_tok = F.size(toks)
    n_char = F.length(t)
    punct = F.length(F.regexp_replace(t, r"[^\.,;:!\?'\"()\[\]]", ""))
    stop_hits = sum(
        (
            F.size(F.filter(toks, lambda w: w == F.lit(sw)))
            for sw in _STOPWORDS
        ),
        start=F.lit(0),
    )
    lang_scores = {
        lang: sum(
            (
                (F.length(low) - F.length(F.replace(low, F.lit(cue), F.lit(""))))
                / F.lit(len(cue))
                for cue in cues
            ),
            start=F.lit(0.0),
        )
        for lang, cues in _LANG_CUES.items()
    }
    best = F.greatest(*lang_scores.values())
    lang_guess = (
        F.when(best <= 0, F.lit("und"))
        .when(lang_scores["de"] == best, F.lit("de"))
        .when(lang_scores["es"] == best, F.lit("es"))
        .otherwise(F.lit("en"))
    )
    punct_ratio = F.when(n_char > 0, punct / n_char).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, stop_hits / n_tok).otherwise(F.lit(0.0))
    # Heuristic quality: favor mid-length docs with normal punct/stopword mix.
    quality = F.round(
        F.least(F.lit(1.0), n_tok / F.lit(100.0)) * (F.lit(1.0) - punct_ratio),
        6,
    )
    return (
        df.withColumn("token_count", n_tok)
        .withColumn("char_count", n_char)
        .withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("stopword_ratio", F.round(stop_ratio, 6))
        .withColumn("quality_score", quality)
        .withColumn("lang_guess", lang_guess)
        .withColumn("fingerprint64", F.xxhash64(t))
    )
