"""Scale-adaptive fan-out for compute-dense operators.

The testdata parquet files are single row groups → one input split → ONE
task, so compute-dense projections (md5 over shingles, per-row cosine
against every IVF centroid, bigram explodes) would run single-threaded
locally. A hash repartition fixes that — but on a real cluster the input
already arrives in many splits and an unconditional repartition would be a
full extra exchange of the corpus (the guide §2.4 accidental-shuffle
class).

``spread`` therefore repartitions ONLY when the input's actual partition
count is well below the session's parallelism: locally (1 split) it fans
out to every core; at 100 TB (thousands of splits) it is a no-op and the
corpus is never shuffled for parallelism's sake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


# split-count probe results keyed by (session id, plan semantic hash):
# df.rdd pays a full optimize+physical-plan+RDD build on the driver, and
# the same scan plans are re-probed on every bench repetition. The value
# only steers a partitioning heuristic, so a (astronomically unlikely)
# hash collision cannot affect results.
_N_IN_CACHE: dict[tuple[int, int], int] = {}

# Logical operators that plan an Exchange (or consume one): downstream of
# any of these the data is already distributed across the session's
# shuffle partitions, so spread() has nothing to fix — and, critically,
# probing such a plan with df.rdd under AQE MATERIALIZES every upstream
# shuffle stage at plan-construction time (the r9 advice: in
# ngram_jaccard_pairs the probe executed the whole candidate pipeline
# twice). spread() is for narrow scan-rooted inputs only.
# Note: a shuffle-false "Repartition n, false" (coalesce) stays probeable —
# it is narrow and plans no exchange; "Repartition n, true" does.
_WIDE_TOKENS = ("RepartitionByExpression", "Join ", "Aggregate [",
                "Window [", "Distinct", "Deduplicate", "Sort [", "Intersect",
                "Except", "GlobalLimit")
_WIDE_RE = None  # compiled lazily: "Repartition <n>, true"


def spread(df: DataFrame, key: str) -> DataFrame:
    """Hash-repartition ``df`` by ``key`` to the session's parallelism,
    but only when the plan would otherwise run on fewer than half the
    session's cores (guide §2: scale-adaptive partitioning, never a
    constant tuned for one deployment). No-op on plans that already
    contain a wide (exchange-planning) operator — see _WIDE_TOKENS."""
    sess = df.sparkSession
    target = sess.sparkContext.defaultParallelism
    try:
        cache_key = (id(sess), df.semanticHash())
    except Exception:  # pragma: no cover
        cache_key = None
    n_in = _N_IN_CACHE.get(cache_key) if cache_key else None
    if n_in is None:
        try:
            import re

            global _WIDE_RE
            if _WIDE_RE is None:
                _WIDE_RE = re.compile(r"Repartition \d+, true")
            plan_str = df._jdf.queryExecution().analyzed().toString()
            if (any(tok in plan_str for tok in _WIDE_TOKENS)
                    or _WIDE_RE.search(plan_str)):
                return df
        except Exception:  # pragma: no cover - defensive: stay safe, skip
            return df
        try:
            n_in = df.rdd.getNumPartitions()
        except Exception:  # pragma: no cover - defensive: unplannable input
            n_in = 1
        if cache_key:
            if len(_N_IN_CACHE) > 1024:
                _N_IN_CACHE.clear()
            _N_IN_CACHE[cache_key] = n_in
    if n_in * 2 >= target:
        return df
    return df.repartition(target, key)
