"""Round-2 batch 4: explicit skew-mitigation and embedding compression
operators — the two remaining "would this survive 100 TB" techniques the
catalog teaches by example.

- events_salted_user_agg: two-stage salted aggregation. A power-user key
  that would overload one reducer is split across SALT partial groups,
  then the partials are re-combined — same result as a plain GROUP BY
  (the oracle), one extra (tiny) exchange. This is the manual analogue of
  AQE skew splitting, usable when a single key exceeds what one task can
  hold (AQE can only split *partitions*, not one key's hash bucket).
- pipeline_embedding_quantize: per-dimension min/max int8 scalar
  quantization (the IVF/SQ8 compression step of a vector index): stats in
  one partial-aggregated pass, codes computed scan-side from a broadcast
  1-row stats array — the corpus itself is never shuffled.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._util import t
from .registry import query

SALT = 8


@query(
    "events_salted_user_agg",
    oracle="""
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4) AS total_value,
       ROUND(MAX(value), 4) AS max_value
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def events_salted_user_agg(spark, sf_dir):
    """Salted two-stage aggregation over the skewed user_id key. Stage 1
    groups by (user_id, salt) — the hot user's rows land on SALT different
    reducers; stage 2 combines the SALT partials (rows = users × SALT,
    tiny). COUNT/SUM/MAX recombine losslessly; the oracle is the plain
    single-stage GROUP BY, proving equivalence."""
    e = t(spark, sf_dir, "events")
    partial = (
        e.withColumn("_salt", F.pmod(F.col("event_id"), F.lit(SALT)))
        .groupBy("user_id", "_salt")
        .agg(F.count("*").alias("pc"), F.sum("value").alias("ps"),
             F.max("value").alias("pm"))
    )
    return (
        partial.groupBy("user_id")
        .agg(F.sum("pc").cast("long").alias("n_events"),
             F.round(F.sum("ps"), 4).alias("total_value"),
             F.round(F.max("pm"), 4).alias("max_value"))
        .orderBy("user_id")
    )


@query(
    "pipeline_embedding_quantize",
    oracle="""
WITH dims AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
stats AS MATERIALIZED (
  SELECT pos, MIN(x) AS lo, MAX(x) AS hi FROM dims GROUP BY pos
),
coded AS (
  SELECT d.vec_id, d.pos,
         CAST(ROUND((d.x - s.lo) / (s.hi - s.lo) * 255) AS INTEGER) AS code,
         d.x, s.lo, s.hi
  FROM dims d JOIN stats s ON d.pos = s.pos
)
SELECT vec_id,
       array_to_string(list(code ORDER BY pos), ',') AS codes_csv,
       ROUND(AVG(POW(x - (lo + code / 255.0 * (hi - lo)), 2)), 10)
           AS recon_mse
FROM coded
GROUP BY vec_id
ORDER BY vec_id
LIMIT 50
""",
)
def pipeline_embedding_quantize(spark, sf_dir):
    """SQ8 scalar quantization of the embedding column: per-dimension
    [min, max] from ONE partial-aggregated pass (posexplode →
    dim-keyed partial min/max — dims are few, combiners collapse the
    exchange), then codes + reconstruction MSE computed SCAN-SIDE from the
    broadcast 1-row stats arrays: the corpus is never shuffled, which is
    the property that matters when the corpus is 100 TB and the stats are
    2×dim doubles."""
    emb = t(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("pos", "xr")
    ).select("vec_id", "pos", F.col("xr").cast("double").alias("x"))
    stats = dims.groupBy("pos").agg(
        F.min("x").alias("lo"), F.max("x").alias("hi"))
    stats_row = stats.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("pos", "lo"))).alias("lo_s"),
        F.array_sort(F.collect_list(F.struct("pos", "hi"))).alias("hi_s"),
    ).select(
        F.transform("lo_s", lambda s: s["lo"]).alias("lo_a"),
        F.transform("hi_s", lambda s: s["hi"]).alias("hi_a"),
    )
    coded = (
        emb.join(F.broadcast(stats_row))
        .select(
            "vec_id",
            F.transform(
                F.col("embedding"),
                lambda x, i: F.round(
                    (x.cast("double") - F.element_at(F.col("lo_a"), i + 1))
                    / (F.element_at(F.col("hi_a"), i + 1)
                       - F.element_at(F.col("lo_a"), i + 1)) * 255
                ).cast("int"),
            ).alias("codes"),
            F.col("embedding"), F.col("lo_a"), F.col("hi_a"),
        )
    )
    # codes is emitted CSV-joined, not as array<int>: the driver's pandas
    # canonicalizer sort_values-es every column and list cells are
    # unhashable (r3 red row); tests/harness guards this class now.
    recon = coded.select(
        "vec_id", F.array_join("codes", ",").alias("codes_csv"),
        F.round(
            F.aggregate(
                F.zip_with(
                    F.zip_with(
                        F.col("embedding"),
                        F.col("codes"),
                        lambda x, c: F.struct(x.cast("double").alias("x"),
                                              c.alias("c")),
                    ),
                    F.sequence(F.lit(0),
                               F.size(F.col("embedding")) - 1),
                    lambda s, i: F.pow(
                        s["x"] - (F.element_at(F.col("lo_a"), i + 1)
                                  + s["c"] / F.lit(255.0)
                                  * (F.element_at(F.col("hi_a"), i + 1)
                                     - F.element_at(F.col("lo_a"), i + 1))),
                        2),
                ),
                F.lit(0.0), lambda acc, v: acc + v,
            ) / F.size(F.col("embedding")), 10
        ).alias("recon_mse"),
    )
    return recon.orderBy("vec_id").limit(50)


# ---- time-series gap fill / resample ----------------------------------------


@query(
    "events_resample_forward_fill",
    oracle="""
WITH daily AS MATERIALIZED (
  SELECT user_id, CAST(ts AS DATE) AS day, ROUND(SUM(value), 4) AS v
  FROM events WHERE user_id < 50 GROUP BY user_id, CAST(ts AS DATE)
),
spans AS (
  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id
),
grid AS (
  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
           AS day
  FROM spans
)
SELECT g.user_id, g.day,
       d.v IS NOT NULL AS observed,
       last_value(d.v IGNORE NULLS)
         OVER (PARTITION BY g.user_id ORDER BY g.day) AS v_filled
FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
ORDER BY g.user_id, g.day
""",
)
def events_resample_forward_fill(spark, sf_dir):
    """Calendar resampling with forward fill — the gap-filling shape every
    time-series store exposes (reference has none; TimescaleDB's
    time_bucket_gapfill+locf is the model): per-user daily grid from a
    sequence() explode, left join the observed aggregate, then
    last-non-null carried forward with an IGNORE NULLS window.

    Scale shape: grid generation is per-key sequence (no cross join with a
    global calendar), the join and the fill window are both keyed by
    user_id — one shuffle, skew bounded per user's own span."""
    from pyspark.sql import Window
    e = t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    daily = (
        e.groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.round(F.sum("value"), 4).alias("v"))
    )
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1"))
    grid = spans.select(
        "user_id",
        F.explode(F.sequence("d0", "d1")).alias("day"),
    )
    w = (Window.partitionBy("user_id").orderBy("day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        grid.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id", "day",
            F.col("v").isNotNull().alias("observed"),
            F.last("v", ignorenulls=True).over(w).alias("v_filled"),
        )
        .orderBy("user_id", "day")
    )


# ---- character-entropy quality signal ---------------------------------------


@query(
    "pipeline_char_entropy",
    oracle="""
WITH chars AS MATERIALIZED (
  SELECT doc_id, unnest(string_split(text, '')) AS ch
  FROM documents WHERE doc_id < 200
),
freq AS (
  SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY doc_id, ch
),
tot AS (
  SELECT doc_id, SUM(c) AS n, COUNT(*) AS alphabet FROM freq GROUP BY doc_id
)
SELECT f.doc_id,
       CAST(t.n AS BIGINT) AS n_chars,
       CAST(t.alphabet AS BIGINT) AS alphabet_size,
       ROUND(-SUM((f.c * 1.0 / t.n) * LN(f.c * 1.0 / t.n)), 6) AS entropy_nats,
       ROUND(-SUM((f.c * 1.0 / t.n) * LN(f.c * 1.0 / t.n)), 6) < 2.0
           AS low_entropy
FROM freq f JOIN tot t ON f.doc_id = t.doc_id
GROUP BY f.doc_id, t.n, t.alphabet
ORDER BY f.doc_id
""",
)
def pipeline_char_entropy(spark, sf_dir):
    """Character-distribution entropy per document — the cheap
    perplexity proxy used to drop mojibake/binary-ish/keyboard-mash text
    (low entropy = repeated characters, a CCNet-style quality signal).
    One explode + two aggregates, both keyed by doc_id (gram hot-keys
    bounded per document)."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    chars = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("ch"))
    freq = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    tot = freq.groupBy("doc_id").agg(
        F.sum("c").alias("n"), F.count("*").alias("alphabet"))
    ent = -F.sum((F.col("c") / F.col("n")) * F.log(F.col("c") / F.col("n")))
    return (
        freq.join(tot, "doc_id")
        .groupBy("doc_id", "n", "alphabet")
        .agg(F.round(ent, 6).alias("entropy_nats"))
        .select(
            "doc_id", F.col("n").cast("long").alias("n_chars"),
            F.col("alphabet").cast("long").alias("alphabet_size"),
            "entropy_nats",
            (F.col("entropy_nats") < 2.0).alias("low_entropy"),
        )
        .orderBy("doc_id")
    )
