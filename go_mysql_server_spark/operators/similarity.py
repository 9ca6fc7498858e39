"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k — candidates × queries via broadcast,
  per-query heap via window row_number. The baseline every ANN variant is
  measured against. At 100 TB the candidate side stays partitioned; only
  queries broadcast, so cost is one pass over the corpus per query batch.
- lsh_topk: random-hyperplane LSH (sign-random-projection) — deterministic
  pseudo-random hyperplanes derived from md5 so the DuckDB oracle can
  reproduce them. Buckets join on signature, so the all-to-all collapses to
  per-bucket joins: the 100 TB scale path (IVF-style pruning).

All math is double-precision, rounded before ranking so ordering is
identical across engines; ties broken by vec_id.

The reference's vector surface is vec_distance_{l2_squared,euclidean,cosine}
(reference sql/expression/function/vector/distance.go:62-145) plus an ANN
index ORDER BY rewrite (sql/analyzer/replace_order_by_distance.go); this
module supplies both the exact and the approximate form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

NUM_HYPERPLANES = 8


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ via zip_with + aggregate — JVM-side, no UDF."""
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_squared(a: Column, b: Column) -> Column:
    """vec_distance_l2_squared (reference distance.go:62)."""
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _spread(df: DataFrame, key: str) -> DataFrame:
    """Repartition to session parallelism — scale-adaptive (r9): skipped
    when the input is already split across the cores, so a cluster input
    is never shuffled just for parallelism (operators/scale.py)."""
    from .scale import spread
    return spread(df, key)


def brute_force_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     qid_col: str = "qid") -> DataFrame:
    """Exact top-k by cosine: (qid, vec_id, cos_sim, rank), self excluded."""
    # Norms precompute once per side: the pair loop then evaluates a single
    # dot product instead of three array aggregates per candidate pair.
    cand = _spread(embeddings, id_col).select(
        F.col(id_col), F.col(vec_col).alias("cvec"),
        norm(F.col(vec_col)).alias("cnorm"),
    )
    q = queries.select(
        F.col(qid_col), F.col(vec_col).alias("qvec"),
        norm(F.col(vec_col)).alias("qnorm"),
    )
    scored = (
        cand.join(F.broadcast(q), F.col(qid_col) != F.col(id_col))
        .select(
            qid_col, id_col,
            F.round(
                dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos_sim"), F.col(id_col))
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= k)
    )


def brute_force_topk_sql(k: int = 5, n_queries: int = 5) -> str:
    """DuckDB twin: queries = vec_id < n_queries of the embeddings table."""
    return f"""
WITH q AS (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings
  WHERE vec_id < {n_queries}
),
scored AS (
  SELECT q.qid, e.vec_id,
         ROUND(
           list_dot_product(q.qvec, e.embedding::DOUBLE[])
           / (sqrt(list_dot_product(q.qvec, q.qvec))
              * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))),
           6) AS cos_sim
  FROM embeddings e JOIN q ON e.vec_id <> q.qid
)
SELECT qid, vec_id, cos_sim, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid
                                    ORDER BY cos_sim DESC, vec_id) AS INTEGER) AS rank
  FROM scored) r
WHERE rank <= {k}
"""


def hyperplane_signs_py(dims: int,
                        num_planes: int = NUM_HYPERPLANES) -> list[list[int]]:
    """Deterministic ±1 hyperplane matrix: sign(p,d) from md5 parity —
    the same value the DuckDB oracle derives in SQL (lsh_topk_sql), computed
    driver-side so it can be inlined as literals."""
    import hashlib

    return [
        [1 if int(hashlib.md5(f"plane#{p}#{d}".encode()).hexdigest()[:15],
                  16) % 2 == 0 else -1
         for d in range(dims)]
        for p in range(num_planes)
    ]


def lsh_signature(embeddings: DataFrame, dims: int,
                  num_planes: int = NUM_HYPERPLANES,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  keep_cols: bool = False) -> DataFrame:
    """(id, sig): sig bit p = [Σ_d sign(p,d)·v_d > 0], packed into a long.

    Scan-side: the planes×dims ±1 matrix is tiny and deterministic, so it is
    inlined as literal arrays and each projection is a per-row zip_with +
    aggregate — zero explode, zero join, zero shuffle (the earlier design
    exploded to rows×dims and shuffled twice on (id, p)/(id), ~8× the corpus
    in exchange volume at scale). Same pattern as ivf_probe_topk's inlined
    centroids."""
    signs = hyperplane_signs_py(dims, num_planes)
    # Rendered as SQL TEXT parsed with one F.expr (r9 §5: the Column form
    # built planes×dims literals + 2×planes HOF lambdas through py4j,
    # pure driver latency), over a materialized `_v` double-cast column —
    # the inline cast is a HOF (CodegenFallback, no CSE) that would
    # otherwise re-evaluate once per plane per row.
    terms = []
    for p in range(num_planes):
        arr = ("array(" +
               ", ".join(f"CAST('{float(s)!r}' AS DOUBLE)"
                         for s in signs[p]) + ")")
        proj = (f"aggregate(zip_with(_v, {arr}, (x, s) -> x * s), "
                f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")
        terms.append(f"(CASE WHEN {proj} > CAST(0.0 AS DOUBLE) "
                     f"THEN CAST({1 << p} AS BIGINT) "
                     f"ELSE CAST(0 AS BIGINT) END)")
    sig_sql = "CAST(0 AS BIGINT) + " + " + ".join(terms)
    staged = embeddings.withColumn(
        "_v", F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))"))
    cols = list(embeddings.columns) if keep_cols else [id_col]
    return staged.select(*cols, F.expr(sig_sql).alias("sig"))


def lsh_topk(spark, embeddings: DataFrame, k: int = 3, n_queries: int = 5,
             num_planes: int = NUM_HYPERPLANES,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """ANN: rank by cosine only within the query's LSH bucket."""
    dims = len(embeddings.select(vec_col).first()[0])
    embeddings = _spread(embeddings, id_col)
    # signature is a pure projection now — no join back, no exchange
    # before the bucket equi-join below
    with_sig = lsh_signature(embeddings, dims, num_planes,
                             id_col, vec_col, keep_cols=True)
    q = (
        with_sig.filter(F.col(id_col) < n_queries)
        .select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"),
                F.col("sig").alias("qsig"))
    )
    cand = with_sig.select(F.col(id_col), F.col(vec_col).alias("cvec"), "sig")
    # equi-join on the bucket signature (hash join), self-pairs filtered
    # after — folding the != into the join condition would force a
    # nested-loop strategy
    scored = (
        cand.join(F.broadcast(q), F.col("sig") == F.col("qsig"))
        .filter(F.col(id_col) != F.col("qid"))
        .select("qid", id_col,
                F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos_sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.col(id_col))
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= k)
    )


NCELLS = 8
NPROBE = 2


def ivf_probe_topk(embeddings: DataFrame, k: int = 3, n_queries: int = 5,
                   ncells: int = NCELLS, nprobe: int = NPROBE,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF-style ANN: coarse-quantize every vector to its nearest centroid
    cell, then search only the query's `nprobe` closest cells.

    The coarse quantizer is deterministic — centroids are the first `ncells`
    vectors by id — so the DuckDB oracle reproduces the identical index. The
    centroid table is tiny (ncells × dims) and is collected once at plan
    build and inlined as literals: cell assignment is then a pure scan-side
    projection (no shuffle, no join), exactly how a production IVF broadcasts
    its quantizer. At 100 TB the corpus would be written clustered/partitioned
    BY cell, so probing nprobe cells is partition pruning; here the pruning
    is the broadcast equi-join on `cell`.

    Mirrors the reference's ANN ORDER BY rewrite surface
    (reference sql/analyzer/replace_order_by_distance.go) with a real
    inverted-file index instead of a full scan.
    """
    cents = [
        (int(r[0]), [float(x) for x in r[1]])
        for r in embeddings.filter(F.col(id_col) < ncells)
        .select(id_col, vec_col).orderBy(id_col).collect()
    ]

    def math_sqrt_dot(vals: list[float]) -> float:
        s = 0.0
        for x in vals:
            s += x * x
        return s ** 0.5

    # The centroid expressions are generated as SQL strings and parsed
    # JVM-side (r9 §5: the Column-API form built ncells×dims literals plus
    # ~70 HOF lambdas through py4j — ~2 s of driver time per query
    # construction, 2/3 of the query's local wall-clock; string building
    # is free and F.expr is one call). CAST('<repr>' AS DOUBLE)
    # round-trips the collected doubles exactly, so the scores are
    # bit-identical to the old literal tree. The query-vector norm (_vn)
    # and per-cell score array (_sc) are materialized as chained
    # projection columns: the old tree embedded the norm in every cell
    # score and the whole score array in every consumer, and HOF
    # aggregates are CodegenFallback — no CSE — so each row evaluated
    # 2×ncells score aggregates (assign) / ncells² (probe list) where one
    # array evaluation suffices.
    def _dlist(vals: list[float]) -> str:
        return ("array(" +
                ", ".join(f"CAST('{v!r}' AS DOUBLE)" for v in vals) + ")")

    def _vnorm_sql(col: str) -> str:
        vcol = f"transform({col}, x -> CAST(x AS DOUBLE))"
        return (f"sqrt(aggregate(zip_with({vcol}, {vcol}, "
                f"(x, y) -> x * y), CAST(0.0 AS DOUBLE), "
                f"(acc, x) -> acc + x))")

    def _scores_sql(col: str) -> str:
        vcol = f"transform({col}, x -> CAST(x AS DOUBLE))"
        terms = [
            (f"round(aggregate(zip_with({vcol}, {_dlist(cv)}, "
             f"(x, y) -> x * y), CAST(0.0 AS DOUBLE), "
             f"(acc, x) -> acc + x) "
             f"/ (_vn * CAST('{math_sqrt_dot(cv)!r}' AS DOUBLE)), 6)")
            for _, cv in cents
        ]
        return "array(" + ", ".join(terms) + ")"

    base = _spread(embeddings, id_col)
    # argmax cell, ties → smallest cell id (array_position = first match)
    cand = (
        base.select(F.col(id_col), F.col(vec_col).alias("cvec"))
        .select("*", F.expr(_vnorm_sql("cvec")).alias("_vn"))
        .select(F.col(id_col), F.col("cvec"),
                F.expr(_scores_sql("cvec")).alias("_sc"))
        .select(F.col(id_col), F.col("cvec"),
                # coalesce(…, -1) makes the join key NON-NULLABLE: the
                # equi-join otherwise infers isnotnull(cell) and pushes
                # the whole argmax expression into a scan-side Filter
                # BELOW the spread exchange — re-evaluating every cell
                # score per row in the single-split scan task (r9 plan
                # audit). -1 can never match a probe cell (ids ≥ 0) and
                # the original is null only for a null embedding, which
                # the join would drop anyway — row set identical.
                F.expr("coalesce(CAST(array_position(_sc, array_max(_sc))"
                       " - 1 AS INT), -1)").alias("cell"))
    )
    # probe list: nprobe best cells per query — sort (−score, cell) structs
    probe_cells = ("slice(array_sort(array(" + ", ".join(
        f"named_struct('ns', -_sc[{i}], 'c', {int(c)})"
        for i, (c, _) in enumerate(cents)) + f")), 1, {nprobe}).c")

    q = (
        embeddings.filter(F.col(id_col) < n_queries)
        .select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
        .select("*", F.expr(_vnorm_sql("qvec")).alias("_vn"))
        .select(F.col("qid"), F.col("qvec"),
                F.expr(_scores_sql("qvec")).alias("_sc"))
        .select(F.col("qid"), F.col("qvec"),
                F.explode(F.expr(probe_cells)).alias("cell"))
    )
    scored = (
        cand.join(F.broadcast(q), "cell")
        .filter(F.col(id_col) != F.col("qid"))
        .select("qid", id_col, "cell",
                F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos_sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.col(id_col))
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= k)
    )


def ivf_probe_topk_sql(k: int = 3, n_queries: int = 5,
                       ncells: int = NCELLS, nprobe: int = NPROBE) -> str:
    """DuckDB twin: the same deterministic IVF expressed relationally."""
    return f"""
WITH cents AS (
  SELECT vec_id AS cell, embedding::DOUBLE[] AS cvec FROM embeddings
  WHERE vec_id < {ncells}
),
base AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
cellscore AS (
  SELECT b.vec_id, c.cell,
         ROUND(list_dot_product(b.vec, c.cvec)
               / (sqrt(list_dot_product(b.vec, b.vec))
                  * sqrt(list_dot_product(c.cvec, c.cvec))), 6) AS score
  FROM base b CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY score DESC, cell) AS rn
    FROM cellscore) a
  WHERE rn = 1
),
probe AS (
  SELECT vec_id AS qid, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY score DESC, cell) AS rn
    FROM cellscore WHERE vec_id < {n_queries}) p
  WHERE rn <= {nprobe}
),
scored AS (
  SELECT p.qid, b.vec_id, a.cell,
         ROUND(list_dot_product(q.vec, b.vec)
               / (sqrt(list_dot_product(q.vec, q.vec))
                  * sqrt(list_dot_product(b.vec, b.vec))), 6) AS cos_sim
  FROM assign a
  JOIN probe p USING (cell)
  JOIN base b ON b.vec_id = a.vec_id AND b.vec_id <> p.qid
  JOIN base q ON q.vec_id = p.qid
)
SELECT qid, vec_id, cell, cos_sim, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid
                                    ORDER BY cos_sim DESC, vec_id) AS INTEGER) AS rank
  FROM scored) r
WHERE rank <= {k}
"""


def lsh_topk_sql(k: int = 3, n_queries: int = 5,
                 num_planes: int = NUM_HYPERPLANES, dims: int = 64) -> str:
    return f"""
WITH signs AS (
  SELECT p, d,
         CASE WHEN ('0x' || substr(md5('plane#' || p || '#' || d), 1, 15))::BIGINT % 2 = 0
              THEN 1 ELSE -1 END AS s
  FROM (SELECT unnest(generate_series(0, {num_planes - 1})) AS p),
       (SELECT unnest(generate_series(0, {dims - 1})) AS d)
),
elems AS (
  SELECT vec_id, d.i - 1 AS d, d.v::DOUBLE AS v
  FROM embeddings, LATERAL (
    SELECT unnest(embedding) AS v, generate_subscripts(embedding, 1) AS i) d
),
proj AS (
  SELECT vec_id, p, SUM(v * s) AS proj
  FROM elems JOIN signs USING (d) GROUP BY vec_id, p
),
sigs AS (
  SELECT vec_id, CAST(SUM(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS sig
  FROM proj GROUP BY vec_id
),
base AS (SELECT e.vec_id, e.embedding::DOUBLE[] AS vec, s.sig
         FROM embeddings e JOIN sigs s USING (vec_id)),
q AS (SELECT vec_id AS qid, vec AS qvec, sig AS qsig FROM base WHERE vec_id < {n_queries}),
scored AS (
  SELECT q.qid, c.vec_id,
         ROUND(list_dot_product(q.qvec, c.vec)
               / (sqrt(list_dot_product(q.qvec, q.qvec))
                  * sqrt(list_dot_product(c.vec, c.vec))), 6) AS cos_sim
  FROM base c JOIN q ON c.sig = q.qsig AND c.vec_id <> q.qid
)
SELECT qid, vec_id, cos_sim, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid
                                    ORDER BY cos_sim DESC, vec_id) AS INTEGER) AS rank
  FROM scored) r
WHERE rank <= {k}
"""
