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
       list(code ORDER BY pos) AS codes,
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
    recon = coded.select(
        "vec_id", "codes",
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
