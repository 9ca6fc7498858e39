"""Text-analysis operators for large-scale training-data pipelines.

All pure Column expressions (JVM-side, whole-stage-codegen-able): no Python
UDFs anywhere in the hot path, so throughput scales with cores and the only
shuffle is whatever aggregation the caller adds. Each operator has an exact
SQL twin for the DuckDB oracle.

Operators: tokenization, token counting (whitespace + regex "BPE-ish"),
language ID (stopword-overlap heuristic), quality scoring, document
fingerprinting (normalized-md5 + min-shingle "winnowing-lite").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import md5_int60

# Tiny per-language stopword inventories for the language-ID heuristic.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "to", "in", "a"),
    "es": ("el", "la", "de", "y", "en", "que"),
    "de": ("der", "die", "das", "und", "zu", "ist"),
    "fr": ("le", "la", "de", "et", "un", "est"),
}

QUALITY_STOPWORDS = ("the", "of", "and", "to", "in", "a", "is", "for")

# "BPE-ish" pretokenizer: letter runs, digit runs, single other symbols.
BPE_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def tokens(col: Column) -> Column:
    """Whitespace tokenization of lowercased text."""
    return F.split(F.lower(F.trim(col)), " +")


def tokens_sql(expr: str) -> str:
    return f"regexp_split_to_array(lower(trim({expr})), ' +')"


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("long")


def token_count_of_tokens(toks: Column) -> Column:
    """Token count from a pre-materialized token-array column — use when
    other text features already share a `_toks` projection."""
    return F.size(toks).cast("long")


def token_count_sql(expr: str) -> str:
    return f"CAST(len({tokens_sql(expr)}) AS BIGINT)"


def bpe_token_count(col: Column) -> Column:
    return F.regexp_count(col, F.lit(BPE_TOKEN_RE)).cast("long")


def bpe_token_count_sql(expr: str) -> str:
    return f"CAST(len(regexp_extract_all({expr}, '{BPE_TOKEN_RE}')) AS BIGINT)"


def _in_set(words: tuple[str, ...]):
    # closure factory: PySpark infers lambda arity from the signature, so
    # default-arg captures (lambda x, sw=sw) would be fed two Columns
    return lambda x: x.isin(*words)


def stopword_ratio_of_tokens(toks: Column,
                             stopwords: tuple[str, ...]) -> Column:
    """Fraction of tokens that are stopwords, from a pre-materialized
    token-array column (see langid_of_tokens for why)."""
    hits = F.size(F.filter(toks, _in_set(stopwords)))
    return F.round(hits / F.size(toks), 6)


def stopword_ratio(col: Column, stopwords: tuple[str, ...]) -> Column:
    """Fraction of tokens that are stopwords, rounded for cross-engine hash."""
    return stopword_ratio_of_tokens(tokens(col), stopwords)


def stopword_ratio_sql(expr: str, stopwords: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{w}'" for w in stopwords)
    toks = tokens_sql(expr)
    return (
        f"ROUND(len(list_filter({toks}, x -> x IN ({inlist})))"
        f" / CAST(len({toks}) AS DOUBLE), 6)"
    )


def quality_score_of_tokens(col: Column, toks: Column) -> Column:
    """Heuristic quality in [0,1] from the text column plus a
    pre-materialized token-array column (see langid_of_tokens for why):
    length band + mean token length band + stopword presence. Mirrors the
    shape of C4/Gopher-style filters with a deterministic, SQL-expressible
    formula."""
    n = F.size(toks)
    mean_len = F.length(F.regexp_replace(F.lower(F.trim(col)), " +", "")) / n
    sw = F.size(F.filter(toks, _in_set(QUALITY_STOPWORDS))) / n
    length_ok = F.when((n >= 10) & (n <= 1000), F.lit(0.4)).otherwise(F.lit(0.0))
    tok_ok = F.when((mean_len >= 3) & (mean_len <= 10), F.lit(0.3)).otherwise(F.lit(0.0))
    return F.round(length_ok + tok_ok + F.least(sw * 3, F.lit(1.0)) * 0.3, 6)


def quality_score(col: Column) -> Column:
    """Inline-text form; prefer quality_score_of_tokens when other text
    features share the projection (the inline tokens() is re-evaluated per
    HOF reference — see langid_of_tokens)."""
    return quality_score_of_tokens(col, tokens(col))


def quality_score_sql(expr: str) -> str:
    inlist = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)
    toks = tokens_sql(expr)
    n = f"len({toks})"
    mean_len = f"(length(regexp_replace(lower(trim({expr})), ' +', '', 'g')) / CAST({n} AS DOUBLE))"
    sw = f"(len(list_filter({toks}, x -> x IN ({inlist}))) / CAST({n} AS DOUBLE))"
    return (
        f"ROUND((CASE WHEN {n} BETWEEN 10 AND 1000 THEN 0.4 ELSE 0.0 END)"
        f" + (CASE WHEN {mean_len} BETWEEN 3 AND 10 THEN 0.3 ELSE 0.0 END)"
        f" + LEAST({sw} * 3, 1.0) * 0.3, 6)"
    )


def langid_of_tokens(toks: Column) -> Column:
    """Argmax of per-language stopword overlap, from a pre-materialized
    token-array column.

    `toks` should be a plain column reference: each per-language
    `F.filter` is a higher-order function (CodegenFallback), and common
    subexpression elimination does not reach fallback children — an
    inlined tokens() split is re-evaluated once per language (r9 A/B with
    quality_score sharing the projection: 1.121 → 0.781 s on sf0.1,
    2.143 → 1.408 s on 1000-token synthetic docs).

    Deterministic cross-engine argmax: encode each candidate as
    '%.6f|lang' and take GREATEST — lexicographic order on the fixed-width
    score prefix equals numeric order, and ties resolve to the
    lexicographically larger language in both engines. Score 0 → 'und'.
    """
    n = F.size(toks).cast("double")
    encoded = []
    for lang in sorted(LANG_STOPWORDS):
        sw = LANG_STOPWORDS[lang]
        score = F.size(F.filter(toks, _in_set(sw))) / n
        encoded.append(F.format_string("%.6f|%s", score, F.lit(lang)))
    best = F.greatest(*encoded)
    return F.when(F.substring(best, 1, 8) == "0.000000", F.lit("und")).otherwise(
        F.substring(best, 10, 8)
    )


def langid(col: Column) -> Column:
    """Inline-text form; prefer langid_of_tokens — the inlined tokens()
    split is re-evaluated once per language (see langid_of_tokens)."""
    return langid_of_tokens(tokens(col))


def langid_sql(expr: str) -> str:
    toks = tokens_sql(expr)
    n = f"CAST(len({toks}) AS DOUBLE)"
    encoded = []
    for lang in sorted(LANG_STOPWORDS):
        inlist = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        score = f"(len(list_filter({toks}, x -> x IN ({inlist}))) / {n})"
        encoded.append(f"printf('%.6f|%s', {score}, '{lang}')")
    best = f"greatest({', '.join(encoded)})"
    return (
        f"(CASE WHEN substr({best}, 1, 8) = '0.000000' THEN 'und' "
        f"ELSE substr({best}, 10, 8) END)"
    )


def normalize_text(col: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace."""
    return F.regexp_replace(F.lower(F.trim(col)), " +", " ")


def normalize_text_sql(expr: str) -> str:
    return f"regexp_replace(lower(trim({expr})), ' +', ' ', 'g')"


def fingerprint_md5(col: Column) -> Column:
    return F.md5(normalize_text(col))


def fingerprint_md5_sql(expr: str) -> str:
    return f"md5({normalize_text_sql(expr)})"


def shingles_of_tokens(toks: Column, k: int = 3) -> Column:
    """k-word shingles from a PRE-MATERIALIZED token-array column; a
    document shorter than k words yields one shingle (the whole text) so
    every document participates in dedup.

    `toks` must be a plain column reference, not the tokens() expression:
    the transform lambda references it per element, and on the interpreted
    higher-order-function path there is no subexpression elimination — an
    inlined split() would re-tokenize the document once PER SHINGLE
    POSITION, O(tokens²) per doc (r9 A/B: 23x slower at 1000 tokens/doc,
    7.5x on the sf0.1 corpus). Catalyst's CollapseProject keeps the
    upstream tokens projection separate because the alias is referenced
    more than once by a non-cheap consumer."""
    return F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        ),
    ).otherwise(F.array(F.array_join(toks, " ")))


def shingles(col: Column, k: int = 3) -> Column:
    """k-word shingles straight from a text column. ONLY for contexts that
    cannot project a token column first; prefer shingles_of_tokens — this
    inline form re-tokenizes per shingle position (see above)."""
    return shingles_of_tokens(tokens(col), k)


def shingles_sql(expr: str, k: int = 3) -> str:
    toks = tokens_sql(expr)
    return (
        f"(CASE WHEN len({toks}) >= {k} THEN "
        f"list_transform(generate_series(1, len({toks}) - {k - 1}), "
        f"i -> array_to_string(list_slice({toks}, i, i + {k - 1}), ' ')) "
        f"ELSE [array_to_string({toks}, ' ')] END)"
    )


def min_shingle_fingerprint_of_tokens(toks: Column, k: int = 3) -> Column:
    """Winnowing-lite rolling fingerprint: min hash over k-word shingles,
    from a pre-materialized token-array column (see shingles_of_tokens)."""
    return F.array_min(
        F.transform(shingles_of_tokens(toks, k), lambda s: md5_int60(s))
    )


def min_shingle_fingerprint(col: Column, k: int = 3) -> Column:
    """Inline-text form; prefer min_shingle_fingerprint_of_tokens (the
    inline tokens() re-evaluates per shingle position)."""
    return min_shingle_fingerprint_of_tokens(tokens(col), k)


def min_shingle_fingerprint_sql(expr: str, k: int = 3) -> str:
    sh = shingles_sql(expr, k)
    return (
        f"list_aggregate(list_transform({sh}, "
        f"s -> ('0x' || substr(md5(s), 1, 15))::BIGINT), 'min')"
    )


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience: attach all text-analysis columns at once."""
    c = F.col(text_col)
    # Tokenize once into a column so the shingle lambda does not re-run the
    # split per shingle position (see shingles_of_tokens).
    return (
        df.withColumn("_toks", tokens(c))
        .select(
            *df.columns,
            token_count_of_tokens(F.col("_toks")).alias("n_tokens"),
            bpe_token_count(c).alias("n_bpe_tokens"),
            langid_of_tokens(F.col("_toks")).alias("pred_lang"),
            quality_score_of_tokens(c, F.col("_toks")).alias("quality"),
            fingerprint_md5(c).alias("fp_md5"),
            min_shingle_fingerprint_of_tokens(
                F.col("_toks")).alias("fp_shingle"),
        )
    )
