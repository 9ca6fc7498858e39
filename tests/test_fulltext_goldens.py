"""Reference fulltext ScriptTest sweep (enginetest/queries/fulltext_queries.go).

The reference's fulltext corpus is golden ScriptTests: SetUpScript
statements (CREATE TABLE with inline FULLTEXT keys, INSERT, ALTER,
CREATE/DROP INDEX) followed by MATCH ... AGAINST assertions with
checked-in expected rows. This harness parses the Go source, executes
each script through the Engine (fresh per script), and compares rows to
the parsed expectations — the same strategy as tests/test_goldens.py but
with the reference's own expected values as the oracle (MATCH relevance
is engine-specific so DuckDB can't compute it).

Divergences are allowlisted with causes; a NEW divergence fails even if
the pass-count floor holds.
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest

SRC = Path("/root/reference/enginetest/queries/fulltext_queries.go")

# Assertions skipped with documented causes (matched by substring against
# the assertion's Query text):
KNOWN_SKIP: tuple[str, ...] = ()

# whole scripts skipped with documented causes:
KNOWN_SCRIPT_SKIP = {
    # column-level COLLATE utf8mb4_0900_as_cs inside MATCH: our tokenizer
    # lowercases (matching the default ai_ci collation); per-column
    # case-sensitive fulltext is part of the documented collation cap
    # (SCALE.md)
    "Collation handling",
    # the relevance VALUES are InnoDB's tf-idf floats; our documented
    # model is term-frequency counts (plans/json_fulltext.py) — row SETS
    # match everywhere, scores and score-tie orderings differ
    "Relevancy Ordering",
}


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


def _parse_scripts():
    """Yield (name, setup_stmts, [(query, expected_rows, ordered)])."""
    src = SRC.read_text(errors="replace")
    scripts = []
    # each ScriptTest block: Name: "...", SetUpScript: []string{...},
    # Assertions: []ScriptTestAssertion{...}
    for sm in re.finditer(
            r'Name:\s+"((?:[^"\\]|\\.)*)",\s*\n(.*?)(?=\n\t\{|\n\}\n)',
            src, re.S):
        name, body = sm.group(1), sm.group(2)
        setup_m = re.search(r"SetUpScript: \[\]string\{(.*?)\n\t\t\},",
                            body, re.S)
        if not setup_m:
            continue
        setup = re.findall(r'"((?:[^"\\]|\\.)*)"', setup_m.group(1))
        setup = [s.encode().decode("unicode_escape") for s in setup]
        asserts = []
        for am in re.finditer(
                r"\{\n(.*?)\n\t\t\t\},", body, re.S):
            ab = am.group(1)
            if re.search(r"^\s*(Skip:\s*true|ExpectedErr|SkipServerEngine)",
                         ab, re.M):
                continue
            qm = re.search(r'Query:\s+"((?:[^"\\]|\\.)*)"', ab)
            em = re.search(r"Expected:\s+(\[\]sql\.Row\{.*)", ab, re.S)
            if not qm or not em:
                continue
            query = qm.group(1).encode().decode("unicode_escape")
            if "types.OkResult" in em.group(1) or not \
                    query.upper().lstrip().startswith(("SELECT", "WITH")):
                # DML step between matches: execute for state, don't
                # compare rows (OkResult shape is engine-specific)
                asserts.append((query, None, False))
                continue
            expected = _parse_go_rows(em.group(1))
            if expected is None:
                continue
            ordered = "ORDER BY" in query.upper()
            asserts.append((query, expected, ordered))
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


@pytest.mark.skipif(not SRC.exists(), reason="reference not present")
def test_fulltext_golden_scripts(spark):
    from go_mysql_server_spark.engine import Engine

    ok, skipped, failures = 0, 0, []
    for name, setup, asserts in _parse_scripts():
        if name in KNOWN_SCRIPT_SKIP:
            skipped += len(asserts)
            continue
        eng = Engine(spark, default_db="ftdb")
        try:
            for stmt in setup:
                eng.query(stmt)
        except Exception as exc:  # noqa: BLE001 — setup uses a feature
            skipped += len(asserts)   # we don't route; count and move on
            failures.append((name, f"SETUP: {exc}"[:160]))
            continue
        for query, expected, ordered in asserts:
            if any(k in query for k in KNOWN_SKIP):
                skipped += 1
                continue
            if expected is None:  # DML step: execute for state only
                try:
                    eng.query(query)
                except Exception as exc:  # noqa: BLE001
                    failures.append((name, f"DML {query[:80]} ERR "
                                     f"{exc}"[:200]))
                continue
            try:
                got = [tuple(_canon(c) for c in r)
                       for r in eng.query(query).collect()]
            except Exception as exc:  # noqa: BLE001
                failures.append((name, f"{query[:90]} ERR {exc}"[:200]))
                continue
            want = [tuple(_canon(c) for c in r) for r in expected]
            same = got == want if ordered else sorted(
                map(repr, got)) == sorted(map(repr, want))
            if same:
                ok += 1
            else:
                failures.append(
                    (name, f"{query[:90]} got={got[:4]} want={want[:4]}"))
    # r5 baseline: 96 passing (the two skipped scripts also contained
    # passing assertions; they are excluded wholesale)
    assert ok >= 90, f"fulltext golden pass count regressed: {ok}"
    assert not failures, (
        f"NEW fulltext divergences ({len(failures)}): {failures[:6]}")
