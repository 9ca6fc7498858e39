"""Stored procedures, triggers, and prepared statements.

The reference interprets procedure bodies over its plan executor
(reference sql/procedures/interpreter_*.go, rule 'interpreter'
sql/analyzer/rules.go:98; nodes block.go / if_else.go / while.go …) and
rewrites triggers into the DML plan (reference sql/plan/trigger.go:1-96,
rules triggers.go/load_triggers.go). Prepared statements cache the parsed
statement and rebind on execute (reference engine.go:174,
PrepareParsedQuery).

Spark-first stance: control flow is *driver-side* interpretation (it's
per-statement logic, not per-row), while every statement the body executes
is a full distributed Spark job through Engine.query. Triggers apply
set-based: a BEFORE INSERT trigger's `SET NEW.c = expr` becomes one extra
projection over the whole incoming DataFrame — not a per-row callback.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class Trigger:
    name: str
    timing: str        # BEFORE | AFTER
    event: str         # INSERT | UPDATE | DELETE
    table: str
    body: str          # single statement (or BEGIN...END block)


@dataclass
class Procedure:
    name: str
    params: list[tuple[str, str, str]]  # (mode, name, type)
    body: str


@dataclass
class PreparedStatement:
    name: str
    sql: str
    n_params: int


def split_statements(body: str) -> list[str]:
    """Split a BEGIN...END body on ';' at top nesting level (respects
    nested BEGIN/END, IF/END IF, WHILE/END WHILE and string literals)."""
    body = body.strip()
    if re.match(r"^BEGIN\b", body, re.I):
        body = re.sub(r"^BEGIN\b", "", body, flags=re.I)
        body = re.sub(r"\bEND\s*$", "", body, flags=re.I)
    out, depth, cur, i, n = [], 0, [], 0, len(body)
    while i < n:
        c = body[i]
        if c == "'":
            cur.append(c)
            i += 1
            while i < n:
                cur.append(body[i])
                if body[i] == "'":
                    break
                i += 1
        else:
            at_word_start = i == 0 or not (body[i - 1].isalnum() or body[i - 1] == "_")
            m = re.match(r"(BEGIN|IF|WHILE|REPEAT|CASE|LOOP)\b", body[i:], re.I) \
                if at_word_start else None
            m_end = re.match(r"END\s*(IF|WHILE|REPEAT|CASE|LOOP)?\b", body[i:], re.I) \
                if at_word_start else None
            if m_end and depth > 0:
                depth -= 1
                cur.append(body[i:i + m_end.end()])
                i += m_end.end()
                continue
            if m:
                depth += 1
                cur.append(body[i:i + m.end()])
                i += m.end()
                continue
            if c == ";" and depth == 0:
                stmt = "".join(cur).strip()
                if stmt:
                    out.append(stmt)
                cur = []
                i += 1
                continue
            cur.append(c)
        i += 1
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    return out


class _Leave(Exception):
    """Control-flow escape for LEAVE <label>."""

    def __init__(self, label: str):
        self.label = label


class _Iterate(Exception):
    """Control-flow escape for ITERATE <label>."""

    def __init__(self, label: str):
        self.label = label


class _Cursor:
    """Materialized cursor over a SELECT's rows (reference fetch.go).

    The reference streams the cursor over its iterator; here the SELECT runs
    as one distributed job and the driver walks the collected rows — cursors
    are a per-row control-flow construct, inherently driver-side."""

    def __init__(self, rows):
        self.rows = rows
        self.pos = 0

    def fetch(self):
        if self.pos >= len(self.rows):
            return None
        row = self.rows[self.pos]
        self.pos += 1
        return row


class ProcedureInterpreter:
    """Executes a procedure body statement-by-statement through the engine.

    Supported control flow (reference block.go/if_else.go/while.go/loop.go/
    fetch.go subset): DECLARE (vars, CURSOR FOR, CONTINUE HANDLER FOR NOT
    FOUND), SET, IF/ELSEIF/ELSE, WHILE, [label:] LOOP with LEAVE/ITERATE,
    OPEN/FETCH/CLOSE, SELECT (last SELECT is the CALL result), any DML/DDL.
    """

    MAX_LOOP = 100_000

    def __init__(self, engine):
        self.engine = engine
        self.cursors: dict[str, _Cursor | str] = {}
        self.not_found_handler: str | None = None

    def call(self, proc: Procedure, args: list):
        if len(args) != len(proc.params):
            from .engine import SqlError
            raise SqlError(
                f"procedure {proc.name} expects {len(proc.params)} args, got {len(args)}")
        scope = {p[1].lower(): a for p, a in zip(proc.params, args)}
        result = None
        for stmt in split_statements(proc.body):
            result = self._exec(stmt, scope) or result
        return result

    def _exec(self, stmt: str, scope: dict):
        up = stmt.strip().upper()
        m = re.match(r"DECLARE\s+(\w+)\s+CURSOR\s+FOR\s+(.*)$", stmt.strip(),
                     re.I | re.S)
        if m:
            self.cursors[m.group(1).lower()] = m.group(2)  # SELECT bound at OPEN
            return None
        if re.match(r"DECLARE\s+(CONTINUE|EXIT)\s+HANDLER\s+FOR\s+NOT\s+FOUND",
                    stmt.strip(), re.I):
            m = re.search(r"NOT\s+FOUND\s+(.*)$", stmt.strip(), re.I | re.S)
            self.not_found_handler = m.group(1).strip()
            return None
        if up.startswith("DECLARE"):
            m = re.match(r"DECLARE\s+(\w+)\s+\S+(?:\s+DEFAULT\s+(.*))?$",
                         stmt.strip(), re.I | re.S)
            if m:
                scope[m.group(1).lower()] = (
                    self._eval(m.group(2), scope) if m.group(2) else None
                )
            return None
        if up.startswith("OPEN "):
            name = stmt.split()[1].strip().lower()
            sel = self.cursors.get(name)
            if not isinstance(sel, str):
                from .engine import SqlError
                raise SqlError(f"cursor {name!r} not declared")
            df = self.engine.query(self._bind(sel, scope))
            self.cursors[name] = _Cursor([tuple(r) for r in df.collect()])
            return None
        if up.startswith("FETCH"):
            m = re.match(r"FETCH\s+(?:NEXT\s+FROM\s+|FROM\s+)?(\w+)\s+INTO\s+(.*)$",
                         stmt.strip(), re.I | re.S)
            cur = self.cursors.get(m.group(1).lower())
            targets = [v.strip().lstrip("@").lower() for v in m.group(2).split(",")]
            row = cur.fetch() if isinstance(cur, _Cursor) else None
            if row is None:
                if self.not_found_handler:
                    self._exec(self.not_found_handler, scope)
                return None
            for name, value in zip(targets, row):
                scope[name] = value
            return None
        if up.startswith("CLOSE "):
            self.cursors.pop(stmt.split()[1].strip().lower(), None)
            return None
        m = re.match(r"(?:(\w+)\s*:\s*)?LOOP\b(.*)\bEND\s+LOOP\s*(\w+)?$",
                     stmt.strip(), re.I | re.S)
        if m:
            return self._exec_loop(m.group(1) or "", m.group(2), scope)
        if up.startswith("LEAVE"):
            raise _Leave(stmt.split()[1].strip().lower() if len(stmt.split()) > 1 else "")
        if up.startswith("ITERATE"):
            raise _Iterate(stmt.split()[1].strip().lower() if len(stmt.split()) > 1 else "")
        if up.startswith("SET "):
            for assign in stmt.strip()[4:].split(","):
                name, expr = assign.split("=", 1)
                name = name.strip().lstrip("@").lower()
                scope[name] = self._eval(expr, scope)
            return None
        if up.startswith("IF"):
            return self._exec_if(stmt, scope)
        if up.startswith("WHILE"):
            return self._exec_while(stmt, scope)
        return self.engine.query(self._bind(stmt, scope))

    def _exec_loop(self, label: str, body: str, scope: dict):
        result = None
        label = label.lower()
        for _ in range(self.MAX_LOOP):
            try:
                for s in split_statements(body):
                    result = self._exec(s, scope) or result
            except _Leave as lv:
                if lv.label in ("", label):
                    return result
                raise
            except _Iterate as it:
                if it.label in ("", label):
                    continue
                raise
        from .engine import SqlError
        raise SqlError("LOOP exceeded iteration limit")

    def _exec_if(self, stmt: str, scope: dict):
        m = re.match(r"IF\s+(.*?)\s+THEN\s+(.*)\s+END\s+IF$", stmt.strip(),
                     re.I | re.S)
        if not m:
            from .engine import SqlError
            raise SqlError(f"cannot parse IF: {stmt[:60]!r}")
        cond, rest = m.group(1), m.group(2)
        # split on top-level ELSEIF/ELSE
        branches: list[tuple[str | None, str]] = [(cond, "")]
        parts = re.split(r"\b(ELSEIF|ELSE)\b", rest, flags=re.I)
        body_acc = parts[0]
        branches[0] = (cond, body_acc)
        i = 1
        while i < len(parts):
            kw = parts[i].upper()
            if kw == "ELSEIF":
                m2 = re.match(r"\s*(.*?)\s+THEN\s+(.*)$", parts[i + 1], re.S | re.I)
                branches.append((m2.group(1), m2.group(2)))
            else:
                branches.append((None, parts[i + 1]))
            i += 2
        result = None
        for cond, body in branches:
            if cond is None or self._truthy(self._eval(cond, scope)):
                for s in split_statements(body):
                    result = self._exec(s, scope) or result
                break
        return result

    def _exec_while(self, stmt: str, scope: dict):
        m = re.match(r"WHILE\s+(.*?)\s+DO\s+(.*)\s+END\s+WHILE$", stmt.strip(),
                     re.I | re.S)
        if not m:
            from .engine import SqlError
            raise SqlError(f"cannot parse WHILE: {stmt[:60]!r}")
        cond, body = m.group(1), m.group(2)
        result = None
        for _ in range(self.MAX_LOOP):
            if not self._truthy(self._eval(cond, scope)):
                return result
            for s in split_statements(body):
                result = self._exec(s, scope) or result
        from .engine import SqlError
        raise SqlError("WHILE loop exceeded iteration limit")

    def _bind(self, stmt: str, scope: dict) -> str:
        """Substitute scope variables (bare identifiers) with literals."""
        from .engine import Engine

        def repl(m: re.Match) -> str:
            name = m.group(0).lower()
            if name in scope:
                return Engine._lit(scope[name])
            return m.group(0)

        # don't touch quoted strings; cheap approach: substitute outside quotes
        parts = re.split(r"('(?:[^']|'')*')", stmt)
        return "".join(
            p if p.startswith("'") else re.sub(r"\b[A-Za-z_]\w*\b", repl, p)
            for p in parts
        )

    def _eval(self, expr: str, scope: dict):
        row = self.engine.spark.sql(
            f"SELECT ({self._bind(expr, scope)}) AS v"
        ).first()
        return row["v"]

    @staticmethod
    def _truthy(v) -> bool:
        return bool(v) and v != 0
