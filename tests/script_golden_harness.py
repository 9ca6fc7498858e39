"""Shared parser/runner for reference ScriptTest golden corpora.

The reference ships much of its coverage as Go ScriptTests: a SetUpScript
(DDL+DML statements) plus assertions of (Query, Expected rows). This
module parses that Go source and executes scripts through the Engine,
comparing collected rows to the checked-in expectations — the
reference's own golden values as the oracle. Used by
tests/test_fulltext_goldens.py and tests/test_script_goldens.py.
"""

from __future__ import annotations

import re
from pathlib import Path

def _parse_go_rows(text: str):
    """[]sql.Row{{uint64(2), "ghi", "jkl"}, ...} → list of tuples."""
    body = text.strip()
    if not body.startswith("[]sql.Row{"):
        return None
    # take only the balanced {...} that opens after []sql.Row
    start = len("[]sql.Row")
    depth, end, instr = 0, -1, False
    i = start
    while i < len(body):
        c = body[i]
        if instr:
            if c == "\\":
                i += 2
                continue
            if c == '"':
                instr = False
        elif c == '"':
            instr = True
        elif c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                end = i
                break
        i += 1
    if end < 0:
        return None
    inner = body[start + 1:end]
    rows = []
    for rm in re.finditer(r"\{([^{}]*)\}", inner):
        cells = []
        for cell in _split_cells(rm.group(1)):
            cells.append(_parse_go_cell(cell.strip()))
        rows.append(tuple(cells))
    return rows


def _split_cells(s: str):
    out, depth, cur, instr = [], 0, [], False
    i = 0
    while i < len(s):
        c = s[i]
        if instr:
            cur.append(c)
            if c == "\\":
                cur.append(s[i + 1])
                i += 2
                continue
            if c == '"':
                instr = False
        elif c == '"':
            instr = True
            cur.append(c)
        elif c == "(":
            depth += 1
            cur.append(c)
        elif c == ")":
            depth -= 1
            cur.append(c)
        elif c == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    if "".join(cur).strip():
        out.append("".join(cur))
    return out


def _parse_go_cell(cell: str):
    m = re.fullmatch(r'(?:uint|int)(?:8|16|32|64)?\(([-\d]+)\)', cell)
    if m:
        return int(m.group(1))
    m = re.fullmatch(r'float(?:32|64)\(([-\d.eE+]+)\)', cell)
    if m:
        return float(m.group(1))
    if cell == "nil":
        return None
    if cell in ("true", "false"):
        return cell == "true"
    if cell.startswith('"') and cell.endswith('"'):
        return cell[1:-1].encode().decode("unicode_escape")
    if re.fullmatch(r"[-\d]+", cell):
        return int(cell)
    if re.fullmatch(r"[-\d.eE+]+", cell):
        return float(cell)
    raise ValueError(f"unparseable Go cell: {cell!r}")


def _parse_scripts(src_path: Path):
    """Yield (name, setup_stmts, [(query, expected_rows, ordered)])."""
    src = src_path.read_text(errors="replace")
    scripts = []
    # each ScriptTest block: Name: "...", SetUpScript: []string{...},
    # Assertions: []ScriptTestAssertion{...}
    for sm in re.finditer(
            r'Name:\s+"((?:[^"\\]|\\.)*)",\s*\n(.*?)(?=\n\t\{|\n\}\n)',
            src, re.S):
        name, body = sm.group(1), sm.group(2)
        one_line = re.search(r"SetUpScript:\s+\[\]string\{([^\n]*)\}",
                             body)
        if re.search(r"SetUpScript: \[\]string\{\s*\}", body):
            setup_body = ""
        elif one_line:
            setup_body = one_line.group(1)
        else:
            setup_m = re.search(r"SetUpScript: \[\]string\{(.*?)\n\t\t\},",
                                body, re.S)
            if not setup_m:
                continue
            setup_body = setup_m.group(1)
        setup = []
        for gm in re.finditer(r'"((?:[^"\\]|\\.)*)"|`([^`]*)`',
                              setup_body):
            if gm.group(1) is not None:
                setup.append(
                    gm.group(1).encode().decode("unicode_escape"))
            else:
                setup.append(gm.group(2))
        asserts = []
        for am in re.finditer(
                r"\{\n(.*?)\n\t\t\t\},", body, re.S):
            ab = am.group(1)
            if re.search(r"^\s*(Skip:\s*true|ExpectedErr|SkipServerEngine)",
                         ab, re.M):
                continue
            qm = re.search(
                r'Query:\s+(?:"((?:[^"\\]|\\.)*)"|`([^`]*)`)', ab)
            em = re.search(r"Expected:\s+(\[\]sql\.Row\{.*)", ab, re.S)
            if qm and not em:
                # SkipResultsCheck-style steps still MUTATE state —
                # execute without comparing
                q = (qm.group(1).encode().decode("unicode_escape")
                     if qm.group(1) is not None else qm.group(2))
                asserts.append((q, None, False))
                continue
            if not qm or not em:
                continue
            query = (qm.group(1).encode().decode("unicode_escape")
                     if qm.group(1) is not None else qm.group(2))
            if "types.OkResult" in em.group(1) or not \
                    query.upper().lstrip().startswith(("SELECT", "WITH")):
                # DML step between matches: execute for state, don't
                # compare rows (OkResult shape is engine-specific)
                asserts.append((query, None, False))
                continue
            try:
                expected = _parse_go_rows(em.group(1))
            except ValueError:
                continue  # Go literal kind we don't parse (bytes, dates)
            if expected is None:
                continue
            ordered = "ORDER BY" in query.upper()
            asserts.append((query, expected, ordered))
        if not asserts:
            # single-assertion form: top-level Query/Expected at script
            # scope (two-tab indent), used by e.g. variable_queries.go
            qm = re.search(
                r'\n\t\tQuery:\s+(?:"((?:[^"\\]|\\.)*)"|`([^`]*)`)', body)
            em = re.search(r"\n\t\tExpected:\s+(\[\]sql\.Row\{.*)",
                           body, re.S)
            if qm and em and not re.search(
                    r"\n\t\t(Skip:\s*true|ExpectedErr)", body):
                query = (qm.group(1).encode().decode("unicode_escape")
                         if qm.group(1) is not None else qm.group(2))
                if "types.OkResult" in em.group(1) or "types.NewOkResult" \
                        in em.group(1) or not query.upper().lstrip(
                        ).startswith(("SELECT", "WITH")):
                    asserts.append((query, None, False))
                else:
                    try:
                        expected = _parse_go_rows(em.group(1))
                    except ValueError:
                        expected = None
                    if expected is not None:
                        asserts.append((query, expected,
                                        "ORDER BY" in query.upper()))
        if asserts:
            scripts.append((name, setup, asserts))
    return scripts


def _canon(v):
    """Kind-insensitive cell canon: BIGINT UNSIGNED maps to DECIMAL(20,0)
    on our side (documented) while the golden rows carry uint64 — compare
    integral numerics as int."""
    import decimal

    if isinstance(v, bool):
        return int(v)
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        return int(v) if v.is_integer() else round(v, 4)
    return v




def parse_scripts(src_path: Path):
    return _parse_scripts(src_path)


def run_scripts(spark, src_path: Path, script_skip=(), assert_skip=(),
                db: str = "scriptdb"):
    """Returns (ok, skipped, failures)."""
    from go_mysql_server_spark.engine import Engine

    ok, skipped, failures = 0, 0, []
    for name, setup, asserts in _parse_scripts(src_path):
        if any(k in name for k in script_skip):
            skipped += len(asserts)
            continue
        eng = Engine(spark, default_db=db)
        try:
            # the reference harness preloads its standard fixtures into
            # mydb (enginetest/scriptgen/setup); scripts reference
            # mytable & co. without creating them
            from .test_goldens import FIXTURES
            for ddl, ins in FIXTURES.values():
                eng.query(ddl)
                if ins:
                    eng.query(ins)
            for stmt in setup:
                eng.query(stmt)
        except Exception as exc:  # noqa: BLE001
            skipped += len(asserts)
            failures.append((name, f"SETUP: {exc}"[:200]))
            continue
        for query, expected, ordered in asserts:
            if any(k in query or k in name for k in assert_skip):
                skipped += 1
                continue
            if expected is None:  # DML step: execute for state only
                try:
                    eng.query(query)
                except Exception as exc:  # noqa: BLE001
                    failures.append(
                        (name, f"DML {query[:80]} ERR {exc}"[:220]))
                continue
            try:
                got = [tuple(_canon(c) for c in r)
                       for r in eng.query(query).collect()]
            except Exception as exc:  # noqa: BLE001
                failures.append((name, f"{query[:90]} ERR {exc}"[:220]))
                continue
            want = [tuple(_canon(c) for c in r) for r in expected]
            same = got == want if ordered else sorted(
                map(repr, got)) == sorted(map(repr, want))
            if same:
                ok += 1
            else:
                failures.append(
                    (name,
                     f"{query[:80]} got={got[:3]} want={want[:3]}"[:240]))
    return ok, skipped, failures
