"""Text primitives.

The reference's dedup unit is a fixed-size byte block
(/root/reference/src/compressor.c:105-107); ours is a document, and the
sub-document unit is the k-shingle set.

Shingling is a *batch-vectorized* pandas UDF, not a Catalyst expression:
the natural `transform(sequence(...), i -> xxhash64(slice(tokens,...)))`
formulation is a higher-order function, which Catalyst evaluates
INTERPRETED (no whole-stage codegen) with an O(k) array copy per
element — measured ~0.2 s/doc at 2k tokens, unusable. The UDF instead
concatenates the whole Arrow batch into ONE byte buffer and computes
every token boundary, token hash (prefix polynomial algebra over the
uint64 ring — see functions/chunking.py) and k-gram combine
(sliding-window matmul) with whole-batch numpy calls; per-row Python
touches nothing but the final list split. This is the
"vectorized pandas/Arrow UDFs (no per-row Python)" contract from
BASELINE.json's input_hint.

Scale note: only hashed longs ever leave the UDF — token strings never
enter a shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .chunking import _prefix_poly

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


_SHINGLE_COMBINE = np.uint64(0xFF51AFD7ED558CCD | 1)  # odd


def _shingle_flat(
    series: pd.Series, k: int, mul: np.uint64, add: np.uint64
) -> tuple[np.ndarray, np.ndarray, int]:
    """One Arrow batch of texts -> deduped (doc_idx, shingle_hash) arrays.

    Returns (sdoc, sh, n_rows): per-shingle doc index (sorted) and the
    distinct shingle hashes (uint64), sorted (doc, unsigned hash). The
    kernel shared by the array-emitting and count-only UDF variants —
    one implementation so the two can never drift."""
    n_rows = len(series)
    bufs = [
        ("" if t is None else t).lower().encode("utf-8") for t in series
    ]
    # one buffer; docs separated by a space so tokens never cross docs
    buf = np.frombuffer(b" ".join(bufs), dtype=np.uint8)
    doc_off = np.zeros(n_rows, dtype=np.int64)
    if n_rows > 1:
        np.cumsum(
            np.fromiter((len(b) + 1 for b in bufs[:-1]), np.int64, n_rows - 1),
            out=doc_off[1:],
        )
    ws = np.isin(buf, (32, 9, 10, 13, 11, 12))  # \s
    nonws = ~ws
    starts = np.nonzero(nonws & np.concatenate(([True], ws[:-1])))[0]
    ends = np.nonzero(nonws & np.concatenate((ws[1:], [True])))[0] + 1
    _none = np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64), n_rows
    if len(starts) < k:
        return _none
    tdoc = np.searchsorted(doc_off, starts, side="right") - 1
    P, pows = _prefix_poly(buf.astype(np.uint64))
    th = P[ends] - P[starts] * pows[ends - starts]
    # k-gram combine: one matmul over the sliding window of token hashes
    weights = np.array(
        [int(_SHINGLE_COMBINE) ** i % (1 << 64) for i in range(k - 1, -1, -1)],
        dtype=np.uint64,
    )
    win = np.lib.stride_tricks.sliding_window_view(th, k)
    sh = (win @ weights) * mul + add
    valid = tdoc[: len(sh)] == tdoc[k - 1 :]
    sdoc, sh = tdoc[: len(sh)][valid], sh[valid]
    if not len(sh):
        return _none
    order = np.lexsort((sh, sdoc))
    sdoc, sh = sdoc[order], sh[order]
    keep = np.concatenate(([True], (sdoc[1:] != sdoc[:-1]) | (sh[1:] != sh[:-1])))
    return sdoc[keep], sh[keep], n_rows


def _shingle_batch(
    series: pd.Series, k: int, mul: np.uint64, add: np.uint64
) -> pd.Series:
    """One Arrow batch of texts -> per-row sorted distinct shingle hashes."""
    sdoc, sh, n_rows = _shingle_flat(series, k, mul, add)
    if not len(sh):
        return pd.Series(
            [[] for _ in range(n_rows)], dtype=object, index=series.index
        )
    counts = np.bincount(sdoc, minlength=n_rows)
    parts = np.split(sh.view(np.int64), np.cumsum(counts)[:-1])
    return pd.Series([p.tolist() for p in parts], dtype=object, index=series.index)


def _shingle_count_batch(
    series: pd.Series, k: int, mul: np.uint64, add: np.uint64
) -> np.ndarray:
    """Per-row DISTINCT shingle count — the count-only sibling of
    `_shingle_batch` (same kernel, no per-row list materialization)."""
    sdoc, _sh, n_rows = _shingle_flat(series, k, mul, add)
    return np.bincount(sdoc, minlength=n_rows)


def shingle_hash_params(seed: int) -> tuple[np.uint64, np.uint64]:
    """The (mul, add) shingle-hash draw — ONE derivation shared by
    make_shingle_udf and the fused enrich UDF (hashing.make_enrich_udf)
    so the borderline-verify recompute path stays bit-identical with
    the signature path by construction."""
    rng = np.random.default_rng(seed ^ 0x5318)
    mul = np.uint64(int(rng.integers(1, 1 << 62)) * 2 + 1)
    add = np.uint64(int(rng.integers(0, 1 << 63)))
    return mul, add


def make_shingle_udf(k: int, seed: int):
    """pandas UDF: text -> array<bigint> of DISTINCT hashed k-word
    shingles, sorted in UNSIGNED uint64 order (the emitted array<bigint>
    view is therefore NOT ascending when hashes >= 2^63 map to negative
    int64 — consumers are order-free set operations; do not
    binary-search these arrays). Fewer than k tokens yields an EMPTY
    array — the analog of the reference's dropped trailing partial
    block (src/compressor.c:88-93): explicit, routed to the exact tier
    only.
    """
    mul, add = shingle_hash_params(seed)

    @pandas_udf("array<bigint>")
    def shingles(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        err = np.seterr(over="ignore")
        try:
            for series in it:
                yield _shingle_batch(series, k, mul, add)
        finally:
            np.seterr(**err)

    return shingles


def shingle_hashes(text: Column | str, k: int, seed: int) -> Column:
    """Column of distinct hashed k-word shingles (see make_shingle_udf)."""
    c = F.col(text) if isinstance(text, str) else text
    return make_shingle_udf(k, seed)(c)


def gram_rows(df, k: int, seed: int, id_col: str = "doc_id", text_col: str = "text"):
    """(id, text) frame -> exploded (id, n, g) gram-membership rows via
    mapInPandas: one row per DISTINCT k-shingle per doc, with the doc's
    distinct-shingle count n riding along.

    The fan-out sibling of make_shingle_udf for consumers that explode
    the shingle array anyway (the relational n-gram Jaccard query):
    emitting columnar numpy arrays straight into the Arrow batch skips
    the per-row Python list materialization AND the JVM-side explode
    generator entirely (guide §4.2 — hand whole batches to vectorized
    code). Shares `_shingle_flat`, so the gram set per doc is
    bit-identical to explode(shingle_hashes(...))."""
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    mul, add = shingle_hash_params(seed)
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n", IntegerType()),
            StructField("g", LongType()),
        ]
    )

    def emit(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        err = np.seterr(over="ignore")
        try:
            for pdf in it:
                sdoc, sh, n_rows = _shingle_flat(
                    pdf[text_col], k, mul, add
                )
                counts = np.bincount(sdoc, minlength=n_rows)
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col].values[sdoc],
                        "n": counts[sdoc].astype(np.int32),
                        "g": sh.view(np.int64),
                    }
                )
        finally:
            np.seterr(**err)

    return df.select(id_col, text_col).mapInPandas(emit, schema)


def make_shingle_count_udf(k: int, seed: int):
    """pandas UDF: text -> int DISTINCT-shingle count.

    The column-pruned sibling of make_shingle_udf for consumers that
    only read `size(shingles)` (e.g. the signature-shape oracle
    surface): Catalyst cannot prune columns through an opaque UDF
    (guide §4.1 applied to UDF *outputs*), so a count-only kernel skips
    the per-row Python list materialization and the array Arrow
    transfer back to the JVM entirely. Shares `_shingle_flat` with the
    array variant — counts are bit-identical to size(shingles) by
    construction."""
    mul, add = shingle_hash_params(seed)

    @pandas_udf("int")
    def shingle_count(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        err = np.seterr(over="ignore")
        try:
            for series in it:
                n = _shingle_count_batch(series, k, mul, add)
                yield pd.Series(n.astype(np.int32), index=series.index)
        finally:
            np.seterr(**err)

    return shingle_count


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
    # one membership pass, not one interpreted HOF traversal per
    # stopword (25x fewer lambda evaluations; HOFs don't codegen)
    stop_arr = F.array(*[F.lit(sw) for sw in _STOPWORDS])
    stop_hits = F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w)))
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
    # NULL text: every score is NULL, so `best <= 0` is NULL-false and
    # the chain would fall through to 'en' — guard explicitly ('und',
    # not English, for a missing document)
    lang_guess = (
        F.when(best.isNull() | (best <= 0), F.lit("und"))
        .when(lang_scores["de"] == best, F.lit("de"))
        .when(lang_scores["es"] == best, F.lit("es"))
        .otherwise(F.lit("en"))
    )
    punct_ratio = F.when(n_char > 0, punct / n_char).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, stop_hits / n_tok).otherwise(F.lit(0.0))
    # Heuristic quality: favor mid-length docs with normal punct/stopword
    # mix. NULL text must score 0.0, not 1.0: F.least SKIPS NULLs, so
    # least(1.0, NULL/100) is 1.0 and an unguarded product would rank a
    # missing document above every real one (quality >= t filters would
    # select empties first).
    quality = F.when(t.isNull(), F.lit(0.0)).otherwise(
        F.round(
            F.least(F.lit(1.0), n_tok / F.lit(100.0))
            * (F.lit(1.0) - punct_ratio),
            6,
        )
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
