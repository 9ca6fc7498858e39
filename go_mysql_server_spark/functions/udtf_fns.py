"""Python UDTF registration surface (table functions).

The reference supports integrator-registered table functions
(reference sql/core.go TableFunction, enginetest/memory TableFunc
fixtures): a function call that appears in FROM position and yields rows.
Spark 4's Python UDTFs are the native analogue — `@udtf` classes
registered once per session, callable from SQL as `FROM fn(args)` or in
LATERAL position. Rows stream through Arrow batches; the planner treats
the call as a generator node (no driver materialization).

These three close the r1 "no registration surface" gap:
- tokenize_text(text)        → (pos, token) rows
- generate_series(start, stop [, step]) → (value) rows (MySQL's closest
  cousin is the reference's sequence table fixture)
- json_each(doc)             → (key, value) rows over a JSON object
"""

from __future__ import annotations

import json

from pyspark.sql.functions import udtf


@udtf(returnType="pos: int, token: string")
class TokenizeText:
    def eval(self, text: str):  # noqa: D102 — UDTF contract
        if text is None:
            return
        for i, tok in enumerate(text.strip().lower().split()):
            yield i, tok


@udtf(returnType="value: bigint")
class GenerateSeries:
    def eval(self, start: int, stop: int, step: int = 1):
        if start is None or stop is None or not step:
            return
        v = start
        while (step > 0 and v <= stop) or (step < 0 and v >= stop):
            yield (v,)
            v += step


@udtf(returnType="key: string, value: string")
class JsonEach:
    def eval(self, doc: str):
        if doc is None:
            return
        try:
            obj = json.loads(doc)
        except ValueError:
            return
        if isinstance(obj, dict):
            for k, v in obj.items():
                yield k, json.dumps(v)
        elif isinstance(obj, list):
            for i, v in enumerate(obj):
                yield str(i), json.dumps(v)


def register_udtfs(spark) -> None:
    spark.udtf.register("tokenize_text", TokenizeText)
    spark.udtf.register("generate_series_tf", GenerateSeries)
    spark.udtf.register("json_each", JsonEach)
