"""JSON_TABLE and fulltext MATCH...AGAINST coverage.

- JSON_TABLE (reference sql/plan/json_table.go:56-121; exec
  sql/rowexec/rel.go:154-227): JSON doc → relation with NESTED PATH and FOR
  ORDINALITY. Spark-first form: from_json to a typed struct, then
  posexplode_outer — the shredding happens JVM-side with no UDF, and at
  scale it's embarrassingly parallel (no shuffle).
- MATCH ... AGAINST (reference sql/expression/matchagainst.go:33): natural-
  language-mode relevance. The reference computes a per-row score from its
  fulltext index; the Spark-first equivalent is a term-frequency score
  computed as a Column expression (an inverted index materializes as a
  (term, doc) relation when persistence matters — see token explode in
  operators/dedup.simhash for the shape).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._util import t
from .registry import query

_JSON_DOCS = [
    (1, '{"items": [{"name": "alpha", "qty": 2}, {"name": "beta", "qty": 5}]}'),
    (2, '{"items": [{"name": "gamma", "qty": 1}]}'),
    (3, '{"items": []}'),
    (4, None),
]

_JSON_DOCS_SQL = """
(VALUES (1, '{"items": [{"name": "alpha", "qty": 2}, {"name": "beta", "qty": 5}]}'),
        (2, '{"items": [{"name": "gamma", "qty": 1}]}'),
        (3, '{"items": []}'),
        (4, NULL)) AS docs(id, doc)
"""


@query(
    "json_table_shred",
    oracle=f"""
SELECT id,
       CAST(x.i AS INTEGER) AS ord,
       json_extract_string(doc, '$.items[' || (x.i - 1) || '].name') AS item_name,
       CAST(json_extract(doc, '$.items[' || (x.i - 1) || '].qty') AS INTEGER) AS qty
FROM {_JSON_DOCS_SQL}
LEFT JOIN LATERAL (
  SELECT unnest(generate_series(1, CAST(json_array_length(doc, '$.items') AS INTEGER))) AS i
) x ON TRUE
ORDER BY id, ord
""",
)
def json_table_shred(spark, sf_dir):
    """JSON_TABLE(doc, '$.items[*]' COLUMNS(ord FOR ORDINALITY, name, qty)).

    posexplode_outer keeps rows whose array is empty/NULL (MySQL JSON_TABLE
    outer semantics), with ordinality = pos+1."""
    docs = spark.createDataFrame(_JSON_DOCS, "id int, doc string")
    parsed = docs.select(
        "id",
        F.posexplode_outer(
            F.from_json(
                F.col("doc"),
                "struct<items: array<struct<name: string, qty: int>>>",
            )["items"]
        ).alias("pos", "item"),
    )
    return parsed.select(
        "id",
        (F.col("pos") + 1).cast("int").alias("ord"),
        F.col("item.name").alias("item_name"),
        F.col("item.qty").alias("qty"),
    ).orderBy("id", "ord")


@query(
    "json_props_struct_extract",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS min_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k,
       ROUND(AVG(CAST(json_extract(props, '$.k') AS INTEGER)), 6) AS avg_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def json_props_struct_extract(spark, sf_dir):
    """from_json shredding of the events.props column + aggregation over the
    extracted field — the scan→shred→agg pipeline stays one stage."""
    e = t(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "struct<k: int>")["k"]
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
        )
        .orderBy("event_type")
    )


_FT_TERMS = ("spark", "window", "join")


@query(
    "fulltext_match_against",
    oracle=f"""
SELECT doc_id,
       CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), ' +'),
                            x -> x IN ('spark', 'window', 'join'))) AS BIGINT)
           AS relevance
FROM documents
WHERE len(list_filter(regexp_split_to_array(lower(trim(text)), ' +'),
                      x -> x IN ('spark', 'window', 'join'))) > 0
ORDER BY relevance DESC, doc_id
LIMIT 50
""",
)
def fulltext_match_against(spark, sf_dir):
    """MATCH(text) AGAINST('spark window join') in natural-language mode:
    term-frequency relevance, matching rows only, ranked."""
    docs = t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), " +")
    relevance = F.size(F.filter(toks, lambda x: x.isin(*_FT_TERMS))).cast("long")
    # The match predicate is arrays_overlap (codegen'd, pushed to the
    # scan) rather than relevance > 0: the count's F.filter is an
    # interpreted HOF that would run per row corpus-wide; overlap
    # short-circuits and the count is only evaluated for matching rows.
    # Same rows: relevance > 0 <=> some term is present (nulls drop
    # either way).
    return (
        docs.filter(F.arrays_overlap(
            toks, F.array(*[F.lit(x) for x in _FT_TERMS])))
        .select("doc_id", relevance.alias("relevance"))
        .orderBy(F.desc("relevance"), "doc_id")
        .limit(50)
    )


_NESTED_DOCS = [
    (1, '{"order": "A", "items": [{"name": "alpha", "tags": ["x", "y"]}, '
        '{"name": "beta", "tags": ["z"]}]}'),
    (2, '{"order": "B", "items": [{"name": "gamma", "tags": []}]}'),
    (3, '{"order": "C", "items": []}'),
    (4, 'not valid json'),
    (5, None),
]

_NESTED_DOCS_SQL = """
(VALUES (1, '{"order": "A", "items": [{"name": "alpha", "tags": ["x", "y"]}, {"name": "beta", "tags": ["z"]}]}'),
        (2, '{"order": "B", "items": [{"name": "gamma", "tags": []}]}'),
        (3, '{"order": "C", "items": []}'),
        (4, 'not valid json'),
        (5, NULL)) AS docs(id, doc)
"""


@query(
    "json_table_nested_path",
    oracle=f"""
WITH safe AS (
  -- malformed docs parse to NULL (Spark from_json semantics; DuckDB's
  -- json_extract raises instead, so guard with json_valid)
  SELECT id, CASE WHEN json_valid(doc) THEN doc END AS doc
  FROM {_NESTED_DOCS_SQL}
),
items AS (
  SELECT id,
         COALESCE(json_extract_string(doc, '$.order'), 'N/A') AS ord_name,
         CAST(x.i AS INTEGER) AS item_ord,
         json_extract_string(doc, '$.items[' || (x.i - 1) || '].name') AS item_name,
         json_extract(doc, '$.items[' || (x.i - 1) || '].tags') AS tags
  FROM safe
  LEFT JOIN LATERAL (
    SELECT unnest(generate_series(
      1, CAST(coalesce(json_array_length(doc, '$.items'), 0) AS INTEGER))) AS i
  ) x ON TRUE
)
SELECT id, ord_name, item_ord, item_name,
       CAST(y.j AS INTEGER) AS tag_ord,
       json_extract_string(tags, '$[' || (y.j - 1) || ']') AS tag
FROM items
LEFT JOIN LATERAL (
  SELECT unnest(generate_series(
    1, CAST(coalesce(json_array_length(tags), 0) AS INTEGER))) AS j
) y ON TRUE
ORDER BY id, item_ord, tag_ord
""",
)
def json_table_nested_path(spark, sf_dir):
    """JSON_TABLE with NESTED PATH + DEFAULT ... ON EMPTY/ERROR (reference
    sql/plan/json_table.go:56-121, exec sql/rowexec/rel.go:154-227):

        JSON_TABLE(doc, '$' COLUMNS(
          ord_name VARCHAR PATH '$.order' DEFAULT '"N/A"' ON EMPTY,
          NESTED PATH '$.items[*]' COLUMNS(
            item_ord FOR ORDINALITY, item_name PATH '$.name',
            NESTED PATH '$.tags[*]' COLUMNS(tag_ord FOR ORDINALITY, tag))))

    Two chained posexplode_outer calls shred both nesting levels JVM-side;
    an invalid document parses to NULL (ERROR ON ERROR would filter) and
    the missing scalar takes the ON EMPTY default."""
    docs = spark.createDataFrame(_NESTED_DOCS, "id int, doc string")
    schema = ("struct<order: string, items: array<struct<"
              "name: string, tags: array<string>>>>")
    parsed = docs.select(
        "id", F.from_json(F.col("doc"), schema).alias("j"))
    level1 = parsed.select(
        "id",
        F.coalesce(F.col("j.order"), F.lit("N/A")).alias("ord_name"),
        F.posexplode_outer("j.items").alias("pos1", "item"),
    )
    return level1.select(
        "id", "ord_name",
        (F.col("pos1") + 1).cast("int").alias("item_ord"),
        F.col("item.name").alias("item_name"),
        F.posexplode_outer("item.tags").alias("pos2", "tag"),
    ).select(
        "id", "ord_name", "item_ord", "item_name",
        (F.col("pos2") + 1).cast("int").alias("tag_ord"), "tag",
    ).orderBy("id", "item_ord", "tag_ord")


@query(
    "fulltext_boolean_mode",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(lower(trim(text)), ' +') AS ts
  FROM documents
)
SELECT doc_id,
       CAST(len(list_filter(ts, x -> x = 'spark')) AS BIGINT) AS n_req
FROM toks
WHERE len(list_filter(ts, x -> x = 'spark')) > 0
  AND len(list_filter(ts, x -> x = 'window')) = 0
ORDER BY doc_id
LIMIT 50
""",
)
def fulltext_boolean_mode(spark, sf_dir):
    """MATCH(text) AGAINST('+spark -window' IN BOOLEAN MODE) (reference
    sql/expression/matchagainst.go:33 and fulltext boolean parser):
    +term is required, -term excludes — set predicates over the token
    array, no scoring (MySQL boolean mode returns 1/0 relevance)."""
    docs = t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), " +")
    n_req = F.size(F.filter(toks, lambda x: x == "spark")).cast("long")
    # Boolean-mode membership as array_contains (codegen'd, pushed to the
    # scan) instead of count predicates: the counts' F.filter lambdas are
    # interpreted HOFs that would run per row corpus-wide; the required
    # count n_req is only evaluated for matching rows. Same rows:
    # count > 0 <=> contains, count = 0 <=> NOT contains (nulls drop
    # either way).
    return (
        docs.filter(F.array_contains(toks, "spark")
                    & ~F.array_contains(toks, "window"))
        .select("doc_id", n_req.alias("n_req"))
        .orderBy("doc_id")
        .limit(50)
    )


_QE_SEED = "vector"
_QE_STOP = ("a", "the")
_QE_FEEDBACK_DOCS = 5
_QE_EXPAND_K = 3


@query(
    "fulltext_query_expansion",
    oracle=f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), ' +') AS ts
  FROM documents
),
top_docs AS (
  SELECT doc_id,
         len(list_filter(ts, x -> x = '{_QE_SEED}')) AS rel
  FROM toks
  WHERE len(list_filter(ts, x -> x = '{_QE_SEED}')) > 0
  ORDER BY rel DESC, doc_id
  LIMIT {_QE_FEEDBACK_DOCS}
),
exp_terms AS (
  SELECT tok FROM (
    SELECT unnest(ts) AS tok
    FROM toks JOIN top_docs USING (doc_id)
  )
  WHERE tok NOT IN ('{_QE_SEED}', 'a', 'the')
  GROUP BY tok
  ORDER BY COUNT(*) DESC, tok
  LIMIT {_QE_EXPAND_K}
),
terms AS (
  SELECT '{_QE_SEED}' AS tok UNION ALL SELECT tok FROM exp_terms
)
SELECT u.doc_id, CAST(COUNT(*) AS BIGINT) AS relevance
FROM (SELECT doc_id, unnest(ts) AS tok FROM toks) u
JOIN terms USING (tok)
GROUP BY u.doc_id
ORDER BY relevance DESC, doc_id
LIMIT 50
""",
)
def fulltext_query_expansion(spark, sf_dir):
    """MATCH ... AGAINST('vector' WITH QUERY EXPANSION) (reference
    sql/expression/matchagainst.go expansion mode): blind relevance
    feedback — rank by the seed term, take the top {_QE_FEEDBACK_DOCS}
    docs, harvest their {_QE_EXPAND_K} most frequent non-stopword terms,
    and re-rank the whole corpus over seed + expansion terms.

    Scale shape: phase 1 is a scan-side tf projection + TopK (bounded
    heap, no global sort); phase 2 explodes only the {_QE_FEEDBACK_DOCS}
    feedback docs (tiny); the expansion vocabulary (<= {_QE_EXPAND_K} + 1
    strings, bounded by construction) is collected and inlined as
    literals — the same justified-collect discipline as the IVF
    centroids — so the final corpus pass is again a pure scan-side
    projection + TopK: the 100 TB corpus is never exploded or shuffled.
    All tie-breaks are (score DESC, key ASC), so both engines pick
    identical feedback docs and terms."""
    docs = t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), " +")
    # Phase 1 references the token array twice (seed-tf HOF filter + the
    # carried ts column); materialize it once — CSE skips HOF fallback
    # children (see text.langid_of_tokens).
    seed_tf = F.size(
        F.filter(F.col("ts"), lambda x: x == _QE_SEED)).cast("long")

    # Membership predicate as array_contains (codegen'd, pushed to the
    # scan); the tf count (interpreted HOF) only runs on matching rows,
    # and the carried ts column shares the one split with it.
    top_docs = (
        docs.filter(F.array_contains(toks, _QE_SEED))
        .select("doc_id", toks.alias("ts"))
        .select("doc_id", seed_tf.alias("rel"), "ts")
        .orderBy(F.desc("rel"), "doc_id")
        .limit(_QE_FEEDBACK_DOCS)
    )
    exp_terms = (
        top_docs.select(F.explode("ts").alias("tok"))
        .filter(~F.col("tok").isin(_QE_SEED, *_QE_STOP))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "tok")
        .limit(_QE_EXPAND_K)
    )
    # bounded collect (<= _QE_EXPAND_K rows by construction): inline the
    # expansion vocabulary as literals so the corpus pass stays scan-side
    terms = [_QE_SEED] + [r["tok"] for r in exp_terms.collect()]
    relevance = F.size(F.filter(toks, lambda x: x.isin(*terms))).cast("long")
    # Same arrays_overlap-for-membership rewrite as fulltext_match_against.
    return (
        docs.filter(F.arrays_overlap(
            toks, F.array(*[F.lit(x) for x in terms])))
        .select("doc_id", relevance.alias("relevance"))
        .orderBy(F.desc("relevance"), "doc_id")
        .limit(50)
    )


@query(
    "fulltext_indexed_match",
    oracle="""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0
  UNION ALL SELECT 900001, 'spark data window join'
),
scored AS (
  SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), ' +'),
                              x -> x IN ('spark', 'window', 'join'))) AS BIGINT)
             AS relevance
  FROM corpus
)
SELECT doc_id, relevance FROM scored
WHERE relevance > 0
ORDER BY relevance DESC, doc_id
LIMIT 50
""",
)
def fulltext_indexed_match(spark, sf_dir):
    """Persisted fulltext index + incremental maintenance (reference
    sql/fulltext/fulltext.go CreateFulltextIndexes, multi_editor.go DML
    hooks): CREATE FULLTEXT INDEX materializes a postings table
    (word, doc key, tf); a later INSERT maintains it incrementally from
    the delta alone; MATCH ... AGAINST routes through the postings via a
    correlated scalar subquery that Catalyst decorrelates to an
    aggregate + join — the returned plan never re-tokenizes the text
    column (pinned by test_plans), which is the property that matters
    when the corpus is 100 TB and the query is repeated."""
    from ..engine import Engine

    t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    eng = Engine(spark)
    eng.query("DROP TABLE IF EXISTS docs_ft")
    # CTAS seeds lazily (no per-row conversion/checkpoint jobs — keeps
    # this entry inside the driver-sim time budget)
    eng.query("CREATE TABLE docs_ft AS SELECT doc_id, text FROM documents"
              " WHERE doc_id % 4 = 0")  # half corpus: driver-sim time budget
    eng.query("ALTER TABLE docs_ft ADD PRIMARY KEY (doc_id)")
    eng.query("CREATE FULLTEXT INDEX ft_text ON docs_ft (text)")
    # incremental: only this row is tokenized (O(delta) maintenance)
    eng.query("INSERT INTO docs_ft VALUES (900001, 'spark data window join')")
    return eng.query(
        "SELECT doc_id, MATCH(text) AGAINST('spark window join') AS relevance"
        " FROM docs_ft WHERE MATCH(text) AGAINST('spark window join')"
        " ORDER BY relevance DESC, doc_id LIMIT 50")


@query(
    "json_table_sql_text",
    oracle="""
SELECT * FROM (VALUES
  (1, 1, 'alpha', 2), (2, 1, 'beta', 5), (3, 1, 'gamma', 1))
AS t(rid, ord, item_name, qty) ORDER BY rid, ord
""",
)
def json_table_sql_text(spark, sf_dir):
    """JSON_TABLE in SQL TEXT through the engine's statement router
    (reference sql/plan/json_table.go; r5: LATERAL rewrite over the
    __json_table_rows UDTF) — lateral over a table column, with
    FOR ORDINALITY and typed PATH columns. Golden oracle (the doc is a
    fixed literal corpus)."""
    from ..engine import Engine

    eng = Engine(spark)
    eng.query("DROP TABLE IF EXISTS jt_src")
    eng.query("CREATE TABLE jt_src (rid BIGINT PRIMARY KEY, doc TEXT)")
    eng.query("""INSERT INTO jt_src VALUES
        (1, '{"items": [{"n": "alpha", "q": 2}]}'),
        (2, '{"items": [{"n": "beta", "q": 5}]}'),
        (3, '{"items": [{"n": "gamma", "q": 1}]}')""")
    return eng.query(
        "SELECT rid, ord, item_name, qty FROM jt_src, "
        "JSON_TABLE(doc, '$.items[*]' COLUMNS("
        "  ord FOR ORDINALITY,"
        "  item_name VARCHAR(10) PATH '$.n',"
        "  qty INT PATH '$.q')) jt "
        "ORDER BY rid, ord")
