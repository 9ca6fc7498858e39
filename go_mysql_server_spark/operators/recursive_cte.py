"""Recursive CTE — driver-side fixpoint loop.

The reference executes WITH RECURSIVE as a seed + step iterated to fixpoint
over a working table (reference sql/plan/recursive_cte.go:25-70, exec
recursiveCteIter sql/rowexec/rel_iters.go:554). Spark has no native
recursive CTE, so we run the same fixpoint on the driver, with each
iteration a distributed DataFrame job.

Scale notes:
- UNION DISTINCT semantics dedups the delta against the accumulator each
  round (subtract = shuffle on all columns) — same asymptotics as the
  reference's working-table dedup, but distributed.
- iter_checkpoint() every few rounds truncates the lineage so plan size and
  scheduler overhead stay O(1) in iteration count instead of O(n); set
  spark.gms.reliableCheckpoint=true for cluster runs (session.py) so loop
  state survives executor loss.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from ..session import iter_checkpoint

CHECKPOINT_EVERY = 4


def recursive_cte(
    seed: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    distinct: bool = True,
    max_iterations: int = 1000,
) -> DataFrame:
    """Evaluate WITH RECURSIVE: acc = seed; repeat acc ∪ step(delta).

    `distinct=True` = UNION (stop when no *new* rows); False = UNION ALL
    (stop when step yields no rows — caller must guarantee termination).
    """
    acc = iter_checkpoint(seed, eager=True)
    delta = acc
    for i in range(max_iterations):
        new = step(delta)
        if distinct:
            new = new.subtract(acc)
        new = iter_checkpoint(new, eager=True)
        if new.isEmpty():
            return acc
        acc = acc.unionAll(new)
        delta = new
        if (i + 1) % CHECKPOINT_EVERY == 0:
            acc = iter_checkpoint(acc, eager=True)
    raise RecursionError(f"recursive CTE did not converge in {max_iterations} iterations")
