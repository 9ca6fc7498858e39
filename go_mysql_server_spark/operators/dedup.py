"""Deduplication operators for large-scale training-data pipelines.

Four families, all expressed as declarative DataFrame plans (no driver-side
loops, no Python UDFs), each with an exact DuckDB-SQL twin for the oracle:

- exact:    md5(normalized text) groupBy — one shuffle on the 128-bit key.
- minhash:  k-shingles → n seeded min-hashes → banded LSH → bucket self-join
            → candidate pairs. The standard near-dup pipeline (Broder '97);
            at 100 TB the only all-to-all step is the bucket join, whose
            keys are the bands — docs that share no band never meet.
- simhash:  per-token hashes → bitwise majority vote → 32-bit signature
            (Charikar '02); grouping by signature finds near-dups with
            hamming-0; bands of the signature generalize to hamming-k.
- jaccard:  exact n-gram Jaccard via shingle-set self-join — quadratic in
            the worst case, used as the verifier behind minhash candidates.

Design note vs the reference: go-mysql-server has no dedup operators at all;
these are the additive LLM-pipeline surface the project brief requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import md5_int60
from .text import normalize_text, normalize_text_sql, shingles, shingles_sql

NUM_MINHASHES = 8
BAND_SIZE = 2  # 4 bands of 2 → P(candidate) = 1-(1-s^2)^4 for similarity s

# Seeded minhash values derive from ONE md5 pass per shingle plus universal
# hashing mix_s(h) = (a_s·(h mod P) + b_s) mod P (md5 is ~40µs/eval in
# interpreted expression paths — 8 independent md5 passes made signatures 8×
# slower for no statistical gain). P prime < 2^30 and a_s < 2^30 keep every
# intermediate < 2^60 — identical wrap-free arithmetic in Spark and DuckDB
# (DuckDB raises on BIGINT overflow; Spark wraps — staying small sidesteps
# the divergence). a_s must be large/well-mixed: tiny multipliers leave the
# per-seed argmins correlated and LSH bands stop being independent.
MIX_PRIME = 1073741789


def _mix_consts(seed: int) -> tuple[int, int]:
    a = (2654435761 * (seed + 1) + 0x9E3779B9) % MIX_PRIME
    b = (40503 * (seed + 7) ** 3 + 12345) % MIX_PRIME
    return a | 1, b  # odd multiplier


def _mix_expr(h: str, seed: int) -> str:
    """SQL text of the seed mixer — shared verbatim by both engines."""
    a, b = _mix_consts(seed)
    return f"((({h}) % {MIX_PRIME}) * {a} + {b}) % {MIX_PRIME}"


def _spread(df: DataFrame, key: str) -> DataFrame:
    """Hash-repartition to the session's parallelism.

    The testdata tables are single parquet files → one input split → one
    task; compute-dense operators (md5 over every shingle) would run
    single-threaded. On a real cluster the input arrives in many splits and
    this is a no-op-ish rebalance; locally it's the difference between 1
    and 32 cores.
    """
    sess = df.sparkSession
    return df.repartition(sess.sparkContext.defaultParallelism, key)


def exact_duplicates(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical (after normalization) documents.

    Returns (canonical_id, n_copies) for groups with >1 member; canonical =
    min id. One hash-shuffle; at 100 TB this is a single exchange on md5,
    perfectly balanced unless one document dominates (then AQE skew-split).
    """
    return (
        docs.select(F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("h"))
        .groupBy("h")
        .agg(F.min(id_col).alias("canonical_id"), F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
        .select("canonical_id", "n_copies")
    )


def exact_duplicates_sql(table: str = "documents", text_col: str = "text",
                         id_col: str = "doc_id") -> str:
    return f"""
SELECT canonical_id, n_copies FROM (
  SELECT MIN({id_col}) AS canonical_id, CAST(COUNT(*) AS BIGINT) AS n_copies
  FROM {table}
  GROUP BY md5({normalize_text_sql(text_col)})
) g WHERE n_copies > 1
"""


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       num_hashes: int = NUM_MINHASHES) -> DataFrame:
    """(id, mh_0..mh_{n-1}): column-wise min over seeded shingle hashes.

    One md5 pass per shingle (the `hs` array), then n cheap integer mixes —
    no explode, no shuffle; Catalyst keeps the md5 projection separate
    (CollapseProject refuses to duplicate non-cheap expressions).
    """
    hashed = _spread(docs, id_col).select(
        F.col(id_col),
        F.transform(shingles(F.col(text_col)), md5_int60).alias("hs"),
    )
    cols = [F.col(id_col)]
    for s in range(num_hashes):
        cols.append(
            F.array_min(F.expr(f"transform(hs, h -> {_mix_expr('h', s)})")).alias(f"mh_{s}")
        )
    return hashed.select(*cols)


def _minhash_sql_exprs(text_col: str, num_hashes: int) -> list[str]:
    sh = shingles_sql(text_col)
    h = "('0x' || substr(md5(x), 1, 15))::BIGINT"
    return [
        f"list_aggregate(list_transform({sh}, x -> {_mix_expr(h, s)}), 'min') AS mh_{s}"
        for s in range(num_hashes)
    ]


def minhash_candidate_pairs(docs: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id",
                            num_hashes: int = NUM_MINHASHES,
                            band_size: int = BAND_SIZE) -> DataFrame:
    """LSH banding: docs sharing any band of their minhash signature become
    a candidate pair (a < b). The self-join key is (band_index, band_value),
    so the shuffle is on band buckets — the scalable all-to-all."""
    # Materialize signatures once: the bucket self-join references them on
    # both sides and Catalyst would otherwise inline (and so recompute) the
    # md5-over-shingles pass per band column per side. The sig relation is
    # tiny (id + n longs) — persisting it is the standard LSH-at-scale plan.
    # eager: both sides of the self-join consume sigs; a lazy checkpoint
    # can be raced into double materialization by AQE's concurrent stage
    # submission
    sigs = minhash_signatures(docs, text_col, id_col, num_hashes).localCheckpoint(
        eager=True
    )
    n_bands = num_hashes // band_size
    band_cols = [
        F.concat_ws(
            ":",
            F.lit(b),
            *[F.col(f"mh_{b * band_size + i}") for i in range(band_size)],
        ).alias(f"band_{b}")
        for b in range(n_bands)
    ]
    buckets = (
        sigs.select(F.col(id_col), F.array(*band_cols).alias("bands"))
        .select(F.col(id_col), F.explode("bands").alias("band_key"))
    )
    a = buckets.select(F.col(id_col).alias("a"), "band_key")
    b = buckets.select(F.col(id_col).alias("b"), "band_key")
    return (
        a.join(b, "band_key")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_candidate_pairs_sql(table: str = "documents",
                                text_col: str = "text", id_col: str = "doc_id",
                                num_hashes: int = NUM_MINHASHES,
                                band_size: int = BAND_SIZE) -> str:
    mh = ",\n         ".join(_minhash_sql_exprs(text_col, num_hashes))
    n_bands = num_hashes // band_size
    band_exprs = ", ".join(
        "concat_ws(':', {})".format(
            ", ".join([str(b)] + [f"mh_{b * band_size + i}" for i in range(band_size)])
        )
        for b in range(n_bands)
    )
    return f"""
WITH sigs AS (
  SELECT {id_col},
         {mh}
  FROM {table}
),
buckets AS (
  SELECT {id_col}, unnest([{band_exprs}]) AS band_key FROM sigs
)
SELECT DISTINCT x.{id_col} AS a, y.{id_col} AS b
FROM buckets x JOIN buckets y ON x.band_key = y.band_key
WHERE x.{id_col} < y.{id_col}
"""


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 32) -> DataFrame:
    """(id, simhash): bitwise majority over 60-bit token hashes' low `bits`.

    Relational formulation: explode tokens → explode bit positions → signed
    vote per (doc, bit) → reassemble. Integer-exact, so the oracle matches
    bit-for-bit. Wide but shuffle-light: both groupBys are on doc_id."""
    toks = (
        _spread(docs, id_col)
        .select(F.col(id_col),
                F.explode(F.split(F.lower(F.trim(F.col(text_col))), " +")).alias("tok"))
        .select(F.col(id_col), md5_int60(F.col("tok")).alias("h"))
    )
    votes = (
        toks.select(
            F.col(id_col),
            F.posexplode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("_p", "b"),
            F.col("h"),
        )
        .select(
            F.col(id_col), F.col("b"),
            # SQL >> accepts a column shift amount (the F.shiftright python
            # wrapper only takes a literal int)
            F.expr("CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END").alias("vote"),
        )
        .groupBy(id_col, "b")
        .agg(F.sum("vote").alias("s"))
    )
    return (
        votes.groupBy(id_col)
        .agg(
            F.sum(
                F.expr("CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << b ELSE CAST(0 AS BIGINT) END")
            ).alias("simhash")
        )
    )


def simhash_sql(table: str = "documents", text_col: str = "text",
                id_col: str = "doc_id", bits: int = 32) -> str:
    toks = f"unnest(regexp_split_to_array(lower(trim({text_col})), ' +'))"
    h = "(('0x' || substr(md5(tok), 1, 15))::BIGINT)"
    return f"""
WITH toks AS (
  SELECT {id_col}, {toks} AS tok FROM {table}
),
votes AS (
  SELECT {id_col}, b,
         SUM(CASE WHEN ({h} >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM toks, (SELECT unnest(generate_series(0, {bits - 1})) AS b) bits
  GROUP BY {id_col}, b
)
SELECT {id_col},
       CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
FROM votes GROUP BY {id_col}
"""


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing ≥1 shingle.

    shuffle on shingle → pair counts → join sizes → |A∩B| / (|A|+|B|-|A∩B|).
    Pairs that share nothing never materialize. Integer set sizes → the
    division is the only float; rounded to 6."""
    sh = (
        _spread(docs, id_col)
        .select(F.col(id_col), F.explode(F.array_distinct(shingles(F.col(text_col)))).alias("sh"))
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("a"), "sh")
    b = sh.select(F.col(id_col).alias("b"), "sh")
    common = (
        a.join(b, "sh")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "a").join(sb, "b")
        .select(
            "a", "b",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs_sql(table: str = "documents", text_col: str = "text",
                            id_col: str = "doc_id", k: int = 3,
                            threshold: float = 0.5) -> str:
    sh = shingles_sql(text_col, k)
    return f"""
WITH sh AS (
  SELECT {id_col}, unnest(list_distinct({sh})) AS sh FROM {table}
),
sizes AS (SELECT {id_col}, COUNT(*) AS n_sh FROM sh GROUP BY {id_col}),
common AS (
  SELECT x.{id_col} AS a, y.{id_col} AS b, COUNT(*) AS n_common
  FROM sh x JOIN sh y ON x.sh = y.sh
  WHERE x.{id_col} < y.{id_col}
  GROUP BY x.{id_col}, y.{id_col}
)
SELECT a, b,
       ROUND(n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.{id_col} = a
JOIN sizes sb ON sb.{id_col} = b
WHERE n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= {threshold}
"""
