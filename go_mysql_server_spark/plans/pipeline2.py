"""Second wave of pipeline analytics: dedup canonicalization, funnel
analysis, vocabulary statistics.

- dedup_connected_components: minhash candidate pairs form a graph; the
  canonical representative of each near-dup cluster is the component
  minimum — computed by iterative label propagation (driver-side fixpoint
  over distributed joins, same machinery as recursive CTEs). The DuckDB
  oracle replays it as a recursive CTE, so the whole pipeline
  (shingle → minhash → LSH → graph → canonical id) is hash-checked.
- events_funnel: classic conversion funnel (view → click → purchase within
  a horizon) via min-event-time per stage + stage-ordering predicates —
  pure joins/aggregation, no per-user state loops.
- vocab_stats: corpus vocabulary with document frequency — the wordcount
  that feeds tokenizer training; one explode + one groupBy.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup
from ..operators.clustering import kmeans
from ..operators.recursive_cte import recursive_cte
from ..operators.scale import spread
from ._util import t
from .registry import query


@query(
    "dedup_connected_components",
    oracle=f"""
WITH RECURSIVE pairs AS MATERIALIZED (
  {dedup.minhash_candidate_pairs_sql().strip().rstrip()}
),
edges AS MATERIALIZED (  -- undirected
  SELECT a AS u, b AS v FROM pairs
  UNION ALL SELECT b, a FROM pairs
),
members AS (SELECT DISTINCT u AS node FROM edges),
labels(node, label) AS (
  SELECT node, node FROM members
  UNION
  SELECT e.u, l.label
  FROM labels l JOIN edges e ON e.v = l.node
  WHERE l.label < e.u
),
canon AS (SELECT node, MIN(label) AS canonical FROM labels GROUP BY node)
SELECT canonical AS canonical_id, CAST(COUNT(*) AS BIGINT) + 1 AS cluster_size
FROM canon WHERE node <> canonical
GROUP BY canonical
ORDER BY canonical_id
""",
)
def dedup_connected_components(spark, sf_dir):
    """Near-dup clusters: label propagation to the component minimum.

    Each iteration is one distributed join (labels ⋈ edges) + min-agg; the
    fixpoint usually lands in O(graph diameter) rounds. At 100 TB this is
    the standard large-graph CC pattern (hash-partitioned on node)."""
    docs = t(spark, sf_dir, "documents")
    pairs = dedup.minhash_candidate_pairs(docs).localCheckpoint(eager=False)
    edges = pairs.selectExpr("a AS u", "b AS v").unionAll(
        pairs.selectExpr("b AS u", "a AS v")
    ).localCheckpoint(eager=False)
    labels = edges.select(F.col("u").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )

    def step(delta):
        # propagate smaller labels along edges
        return (
            delta.join(edges, delta.node == edges.v)
            .filter(F.col("label") < F.col("u"))
            .select(F.col("u").alias("node"), "label")
        )

    all_labels = recursive_cte(labels, step, distinct=True)
    canon = all_labels.groupBy("node").agg(F.min("label").alias("canonical"))
    return (
        canon.filter(F.col("node") != F.col("canonical"))
        .groupBy(F.col("canonical").alias("canonical_id"))
        .agg((F.count("*") + 1).alias("cluster_size"))
        .orderBy("canonical_id")
    )


@query(
    "events_funnel",
    oracle="""
WITH stage_times AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END)     AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END)    AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_users,
  CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS viewed,
  CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view THEN 1 ELSE 0 END) AS BIGINT)
      AS clicked_after_view,
  CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view AND t_purchase > t_click
           THEN 1 ELSE 0 END) AS BIGINT) AS full_funnel
FROM stage_times
""",
)
def events_funnel(spark, sf_dir):
    """Conversion funnel view→click→purchase in stage order: min event time
    per stage per user, then ordering predicates. One shuffle (user_id)."""
    e = t(spark, sf_dir, "events")
    st = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    full = clicked & (F.col("t_purchase") > F.col("t_click"))
    return st.agg(
        F.count("*").alias("n_users"),
        F.sum(viewed.cast("int")).alias("viewed"),
        F.sum(clicked.cast("int")).alias("clicked_after_view"),
        F.sum(full.cast("int")).alias("full_funnel"),
    )


@query(
    "vocab_document_frequency",
    oracle="""
SELECT tok,
       CAST(COUNT(*) AS BIGINT) AS term_freq,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
FROM (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), ' +')) AS tok
  FROM documents
)
GROUP BY tok
HAVING COUNT(DISTINCT doc_id) >= 5
ORDER BY term_freq DESC, tok
LIMIT 100
""",
)
def vocab_document_frequency(spark, sf_dir):
    """Vocabulary with term and document frequency (tokenizer-training
    wordcount). explode → single groupBy on token; DF filter prunes the
    long tail before the driver ever sees it."""
    docs = spread(t(spark, sf_dir, "documents"), "doc_id")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), " +")).alias("tok"),
    )
    return (
        toks.groupBy("tok")
        .agg(
            F.count("*").alias("term_freq"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .filter(F.col("doc_freq") >= 5)
        .orderBy(F.desc("term_freq"), "tok")
        .limit(100)
    )


def _kmeans_oracle(k: int = 8, dims: int = 64, iterations: int = 3) -> str:
    """Unrolled-Lloyd DuckDB twin of operators/clustering.kmeans: same init
    (k lowest vec_ids), same sequential left-to-right L2 accumulation, same
    ROUND(avg, 6) centroid grid snap — so the assignment matches exactly."""
    d_expr = ("list_sum(list_transform(range(1, {n}), "
              "i -> (v.e[i] - c.c[i]) * (v.e[i] - c.c[i])))").format(n=dims + 1)
    parts = [f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
c0 AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cluster,
         e AS c
  FROM (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT {k})
)"""]
    for r in range(1, iterations + 1):
        parts.append(f""",
s{r} AS (
  SELECT v.vec_id, c.cluster, {d_expr} AS d
  FROM v CROSS JOIN c{r - 1} c
),
a{r} AS (
  SELECT vec_id, cluster, d FROM (
    SELECT vec_id, cluster, d,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
    FROM s{r}
  ) WHERE rn = 1
)""")
        if r < iterations:
            parts.append(f""",
u{r} AS (
  SELECT a.cluster,
         UNNEST(list_transform(range(1, {dims + 1}),
                               i -> {{'i': i, 'x': v.e[i]}})) AS t
  FROM a{r} a JOIN v USING (vec_id)
),
m{r} AS (
  SELECT cluster, t.i AS i, ROUND(AVG(t.x), 6) AS m
  FROM u{r} GROUP BY cluster, t.i
),
c{r} AS (
  SELECT cluster, LIST(m ORDER BY i) AS c FROM m{r} GROUP BY cluster
)""")
    parts.append(f"""
SELECT vec_id, cluster, ROUND(SQRT(d), 6) AS dist
FROM a{iterations} ORDER BY vec_id
""")
    return "".join(parts)


@query("similarity_kmeans_ivf", oracle=_kmeans_oracle())
def similarity_kmeans_ivf(spark, sf_dir):
    """IVF coarse quantizer: k-means over the embedding corpus (3 Lloyd
    rounds, deterministic init, 6-dp centroid grid snap). The grid snap
    absorbs cross-engine float-summation-order noise, so the full
    assignment is oracle-checked against an unrolled-Lloyd DuckDB twin."""
    emb = t(spark, sf_dir, "embeddings")
    return kmeans(emb, k=8, iterations=3).orderBy("vec_id")


@query(
    "events_retention_cohorts",
    oracle="""
WITH firsts AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id,
         CAST(date_diff('week', f.cohort_week, date_trunc('week', e.ts)) AS INTEGER)
             AS week_n,
         f.cohort_week
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT cohort_week, week_n, CAST(COUNT(*) AS BIGINT) AS n_active
FROM activity
GROUP BY cohort_week, week_n
ORDER BY cohort_week, week_n
""",
)
def events_retention_cohorts(spark, sf_dir):
    """Cohort retention: users grouped by first-seen week, activity counted
    per week offset — two shuffles (user_id, then cohort cell)."""
    e = t(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id", "cohort_week",
            ((F.unix_timestamp(F.date_trunc("week", F.col("ts")))
              - F.unix_timestamp(F.col("cohort_week"))) / (7 * 86400))
            .cast("int").alias("week_n"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_week", "week_n")
        .agg(F.count("*").alias("n_active"))
        .orderBy("cohort_week", "week_n")
    )
