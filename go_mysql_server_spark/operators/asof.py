"""As-of join — each left row matched to the most recent right row at or
before its timestamp, per key.

The brief's canonical "operator Spark lacks" example. No reference
analogue (go-mysql-server has no temporal join); the semantics follow the
standard kdb/QuestDB/DuckDB ASOF JOIN, which also powers the oracle
(DuckDB implements ASOF natively).

Spark-first plan — the union-window trick, NOT a band self-join:
  1. tag right rows (kind=0) and left rows (kind=1), union them;
  2. one window partitioned by key ordered by (ts, kind) takes
     last_value(right attrs, ignorenulls) — for a left row that IS the
     most recent right row at or ≤ its ts;
  3. filter back to left rows.
One shuffle on the join key, state O(1) per row — a naive theta-join
(l.key = r.key AND r.ts <= l.ts) explodes quadratically per key and then
re-aggregates; this never materializes the pairs. At 100 TB both sides
shuffle once on the key and the window is a linear merge per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, key: str,
              value_cols: list[str] | None = None,
              suffix: str = "_r") -> DataFrame:
    """left ASOF JOIN right ON left.key = right.key AND right.on <= left.on.

    Keeps every left row (NULL right attrs when no prior right row).
    `value_cols` = right columns to carry (default: all but key/on).
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, key)]
    tagged_r = right.select(
        F.col(key), F.col(on),
        F.lit(0).alias("__kind"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    tagged_l = left.select(
        F.col(key), F.col(on),
        F.lit(1).alias("__kind"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
          for c in value_cols],
    )
    # right rows sort before left rows at the same ts (kind 0 < 1), so a
    # right row with ts == left ts IS visible to it (ASOF <= semantics)
    w = (Window.partitionBy(key)
         .orderBy(F.col(on), F.col("__kind"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = tagged_l.unionByName(tagged_r).select(
        key, on, "__kind",
        *[F.last(f"{c}{suffix}", ignorenulls=True).over(w)
          .alias(f"{c}{suffix}") for c in value_cols],
    )
    carried = filled.filter(F.col("__kind") == 1).drop("__kind")
    # re-attach the left payload columns by (key, on) — the left relation
    # keys each row uniquely in the catalog queries; callers with
    # duplicate (key, ts) rows should pre-aggregate
    payload = [c for c in left.columns if c not in (on, key)]
    if not payload:
        return carried
    return left.join(carried, [key, on], "left")
