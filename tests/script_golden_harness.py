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
    # Go raw strings (backticks) may contain braces/quotes that break the
    # structural scan — mask them to sentinel double-quoted strings first.
    # A backtick INSIDE a double-quoted string ("(`c` > 0)") is literal
    # text, not a raw-string opener, so scan quote-aware.
    bt_vals: list[str] = []
    out_chars: list[str] = []
    i, n, in_dq = 0, len(body), False
    while i < n:
        c = body[i]
        if in_dq:
            out_chars.append(c)
            if c == "\\" and i + 1 < n:
                out_chars.append(body[i + 1])
                i += 2
                continue
            if c == '"':
                in_dq = False
        elif c == '"':
            in_dq = True
            out_chars.append(c)
        elif c == "`":
            end = body.find("`", i + 1)
            if end < 0:
                out_chars.append(c)
                i += 1
                continue
            bt_vals.append(body[i + 1:end])
            out_chars.append(f'"\x02{len(bt_vals) - 1}\x02"')
            i = end + 1
            continue
        else:
            out_chars.append(c)
        i += 1
    body = "".join(out_chars)
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
    # braces INSIDE double-quoted strings ("{}" is a common JSON golden)
    # would break the row-chunk regex — mask them to sentinels and restore
    # after cell parse (same trick as the backtick masking above)
    out2: list[str] = []
    instr2, i2 = False, 0
    while i2 < len(inner):
        ch = inner[i2]
        if instr2:
            if ch == "\\" and i2 + 1 < len(inner):
                out2 += [ch, inner[i2 + 1]]
                i2 += 2
                continue
            if ch == '"':
                instr2 = False
                out2.append(ch)
            elif ch == "{":
                out2.append("\x04")
            elif ch == "}":
                out2.append("\x05")
            else:
                out2.append(ch)
        else:
            if ch == '"':
                instr2 = True
            out2.append(ch)
        i2 += 1
    inner = "".join(out2)
    rows = []
    for rm in re.finditer(
            r"\{([^{}]*)\}|sql\.NewRow\(((?:[^()]|\([^()]*\))*)\)", inner):
        cells = []
        for cell in _split_cells(rm.group(1) if rm.group(1) is not None
                                 else rm.group(2)):
            v = _parse_go_cell(cell.strip())
            if isinstance(v, str):
                v = re.sub(r"\x02(\d+)\x02",
                           lambda m: bt_vals[int(m.group(1))], v)
                v = v.replace("\x04", "{").replace("\x05", "}")
            cells.append(v)
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


def _read_go_source(src_path: Path) -> str:
    """Read Go source, joining `"..." + "..."` string concatenations
    (common for long statements split across lines) into one literal."""
    src = src_path.read_text(errors="replace")
    return re.sub(r'"\s*\+\s*(?:\n\s*)?"', "", src)


def _parse_scripts(src_path: Path):
    """Yield (name, setup_stmts, [(query, expected_rows, ordered)])."""
    src = _read_go_source(src_path)
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
        # strip //-commented-out lines — their string literals are NOT
        # setup statements (e.g. the disabled @myUnion SELECT INTO)
        setup_body = re.sub(r"^\s*//[^\n]*$", "", setup_body, flags=re.M)
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
            if "types.OkResult" in em.group(1) \
                    or "types.NewOkResult" in em.group(1) or not \
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
        # integral decimals (BIGINT UNSIGNED carrier) compare exactly —
        # a float round-trip would corrupt uint64-max
        if v == v.to_integral_value():
            return int(v)
        v = float(v)
    if isinstance(v, float):
        return int(v) if v.is_integer() else round(v, 4)
    if isinstance(v, str) and re.fullmatch(r"-?\d+\.\d+", v):
        # DECIMAL goldens are Go strings ("3.000"); our DECIMAL cells
        # canonize numerically above — meet them in the middle (same
        # int-collapse so reprs agree).
        f = float(v)
        return int(f) if f.is_integer() else round(f, 4)
    import datetime
    if isinstance(v, datetime.datetime):
        s = v.strftime("%Y-%m-%d %H:%M:%S")
        if v.microsecond:
            s += f".{v.microsecond:06d}"
        return s
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, str) and re.fullmatch(r"-?\d{1,20}", v):
        # integer-rendered DECIMAL goldens ("1" from cast(e as decimal));
        # both sides canonize identically so string-vs-string equality is
        # unchanged — this only aligns numeric kinds across engines
        return int(v)
    if isinstance(v, str) and v[:1] in "[{":
        # JSON values: engines differ on insignificant whitespace
        # (MySQL prints ": ", Dolt ":") — compare canonical form
        import json
        try:
            return json.dumps(json.loads(v), sort_keys=True,
                              separators=(",", ":"))
        except (ValueError, TypeError):
            return v
    return v




def parse_scripts(src_path: Path):
    return _parse_scripts(src_path)


def parse_script_vars(src_path: Path) -> dict:
    """{go_var_name: [(name, setup, asserts), ...]} — scripts grouped by
    the []ScriptTest var they live in, so runners can mirror the
    reference's per-var engine lifetime (TestScriptWithEngine = one
    shared engine for the whole var; TestScript = fresh per script)."""
    src = src_path.read_text(errors="replace")
    var_pos = [(m.start(), m.group(1))
               for m in re.finditer(r"^var (\w+)\s*=", src, re.M)]
    out: dict[str, list] = {}
    for sm in re.finditer(r'Name:\s+"((?:[^"\\]|\\.)*)"', src):
        var_name = ""
        for pos, vn in var_pos:
            if pos < sm.start():
                var_name = vn
        out.setdefault(var_name, [])
    scripts = _parse_scripts(src_path)
    # align scripts to vars by re-finding each script's Name position
    # (names are unique enough within a corpus file)
    for name, setup, asserts in scripts:
        m = re.search(r'Name:\s+"' + re.escape(name) + '"', src)
        var_name = ""
        if m:
            for pos, vn in var_pos:
                if pos < m.start():
                    var_name = vn
        out.setdefault(var_name, []).append((name, setup, asserts))
    return out


def run_script_seq(spark, scripts, fixtures: dict, shared: bool = False,
                   script_skip=(), assert_skip=(), db: str = "mydb"):
    """Run a list of (name, setup, asserts) scripts. shared=True keeps
    ONE engine across the whole list (reference TestScriptWithEngine);
    otherwise each script gets a fresh engine with `fixtures`
    preloaded. Returns (ok, skipped, failures)."""
    from go_mysql_server_spark.engine import Engine

    ok, skipped, failures = 0, 0, []

    def fresh_engine(needed=None):
        e = Engine(spark, default_db=db)
        # the reference harness provisions a second empty database
        # alongside mydb (enginetest setup: mydb + foo)
        e.query("CREATE DATABASE IF NOT EXISTS foo")
        for tname, (ddl, ins) in fixtures.items():
            if needed is not None and tname.lower() not in needed:
                continue
            e.query(ddl)
            for stmt in ([ins] if isinstance(ins, str) else ins or []):
                e.query(stmt)
        return e

    eng = fresh_engine() if shared else None
    for name, setup, asserts in scripts:
        if any(k in name for k in script_skip):
            skipped += len(asserts)
            continue
        if not shared:
            # preload only the fixtures the script actually references —
            # a fresh engine per script otherwise pays ~1s of unused DDL
            text = " ".join(setup) + " " + " ".join(q for q, _, _ in asserts)
            words = {w.lower() for w in re.findall(r"\w+", text)}
            eng = fresh_engine({t for t in fixtures if t.lower() in words})
        try:
            for stmt in setup:
                # a script that creates a table shadowing a preloaded
                # fixture (mytable & co.) owns that name — drop ours first
                cm = re.match(r"\s*create\s+table\s+[`]?(\w+)[`]?\s*\(",
                              stmt, re.I)
                if cm and cm.group(1).lower() in fixtures:
                    eng.query(f"DROP TABLE IF EXISTS {cm.group(1)}")
                eng.query(stmt)
        except Exception as exc:  # noqa: BLE001
            skipped += len(asserts)
            failures.append((name, f"SETUP: {exc}"[:200]))
            continue
        for query, expected, ordered in asserts:
            if any(k in query or k in name for k in assert_skip):
                skipped += 1
                continue
            if expected is None:
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


def _parse_query_tests(src_path: Path):
    """[]QueryTest / []RegexTest corpora: independent (Query, Expected
    rows) pairs over the standard fixtures. Entries with Skip/ExpectedErr
    or Go-expression cells we can't evaluate are dropped."""
    src = _read_go_source(src_path)
    tests = []
    chunks = re.split(r"(?=\n\t*Query:)", src)
    for ch in chunks[1:]:
        qm = re.match(r"\n\t*Query:\s+(?:\"((?:[^\"\\\\]|\\\\.)*)\"|`([^`]*)`)",
                      ch)
        if not qm:
            continue
        head = ch[:1200]
        if re.search(r"^\s*(Skip:\s*true|ExpectedErr|SkipServerEngine)",
                     head, re.M):
            continue
        em = re.search(r"Expected:\s+(\[\]sql\.Row\{.*)", ch, re.S)
        if not em:
            continue
        if re.search(r"MustConvert|MustJSON|math\.|time\.\w|sql\.True"
                     r"|sql\.False|\[\]byte|fmt\.", em.group(1)[:800]):
            continue
        query = (qm.group(1).encode().decode("unicode_escape")
                 if qm.group(1) is not None else qm.group(2))
        try:
            expected = _parse_go_rows(em.group(1))
        except ValueError:
            continue
        if expected is None:
            continue
        tests.append((query, expected, "ORDER BY" in query.upper()))
    return tests


def run_query_tests(spark, src_path: Path, fixtures: dict, skip=(),
                    db: str = "mydb"):
    """Run a QueryTest corpus against the reference's own golden rows:
    ONE engine with the standard fixtures preloaded (entries are
    independent reads). Returns (ok, skipped, failures)."""
    from go_mysql_server_spark.engine import Engine

    eng = Engine(spark, default_db=db)
    for ddl, ins in fixtures.values():
        eng.query(ddl)
        for stmt in ([ins] if isinstance(ins, str) else ins or []):
            eng.query(stmt)
    ok, skipped, failures = 0, 0, []
    for query, expected, ordered in _parse_query_tests(src_path):
        if any(k in query for k in skip):
            skipped += 1
            continue
        try:
            got = [tuple(_canon(c) for c in r)
                   for r in eng.query(query).collect()]
        except Exception as exc:  # noqa: BLE001
            failures.append((query[:90], f"ERR {exc}"[:220]))
            continue
        want = [tuple(_canon(c) for c in r) for r in expected]
        same = got == want if ordered else sorted(
            map(repr, got)) == sorted(map(repr, want))
        if same:
            ok += 1
        else:
            failures.append(
                (query[:80], f"got={got[:3]} want={want[:3]}"[:240]))
    return ok, skipped, failures


def _parse_write_tests(src_path: Path):
    """Parse []WriteQueryTest corpora (replace_queries.go,
    delete_queries.go, ...): each entry is an independent
    (WriteQuery, expected affected count | None, SelectQuery,
    expected rows) over freshly-loaded standard fixtures."""
    src = _read_go_source(src_path)
    chunks = re.split(r"(?=WriteQuery:)", src)
    tests = []
    for ch in chunks[1:]:
        # entry body runs to the next entry's opening; fields we need
        # all precede any nested struct
        if re.search(r"^\s*(Skip:\s*true|ExpectedErr)", ch, re.M):
            continue
        qm = re.match(
            r'WriteQuery:\s+(?:"((?:[^"\\]|\\.)*)"|`([^`]*)`)', ch)
        sm = re.search(
            r'SelectQuery:\s+(?:"((?:[^"\\]|\\.)*)"|`([^`]*)`)', ch)
        if not qm or not sm:
            continue
        wq = (qm.group(1).encode().decode("unicode_escape")
              if qm.group(1) is not None else qm.group(2))
        sq = (sm.group(1).encode().decode("unicode_escape")
              if sm.group(1) is not None else sm.group(2))
        aff = None
        am = re.search(
            r"ExpectedWriteResult:\s+\[\]sql\.Row\{\{types\."
            r"(?:NewOkResult\((\d+)\)|OkResult\{RowsAffected:\s*(\d+))",
            ch)
        if am:
            aff = int(am.group(1) or am.group(2))
        em = re.search(r"ExpectedSelect:\s+(nil|\[\]sql\.Row\{.*)", ch,
                       re.S)
        if not em:
            continue
        if re.search(r"MustConvert|MustJSON|math\.|time\.|sql\.True"
                     r"|sql\.False|\[\]byte", em.group(1)):
            continue  # Go expression cells we can't evaluate
        if em.group(1) == "nil":
            expected = []
        else:
            try:
                expected = _parse_go_rows(em.group(1))
            except ValueError:
                continue
            if expected is None:
                continue
        tests.append((wq, aff, sq, expected))
    return tests


def run_write_tests(spark, src_path: Path, fixtures: dict, skip=(),
                    db: str = "mydb", check_affected: bool = True):
    """Run a WriteQueryTest corpus: fresh fixtures per entry, execute
    the write, compare the affected count (when the golden is a plain
    NewOkResult) and the follow-up SELECT rows. Returns
    (ok, skipped, failures)."""
    from go_mysql_server_spark.engine import Engine, OkResult

    ok, skipped, failures = 0, 0, []
    for wq, aff, sq, expected in _parse_write_tests(src_path):
        if any(k in wq or k in sq for k in skip):
            skipped += 1
            continue
        eng = Engine(spark, default_db=db)
        for ddl, ins in fixtures.values():
            eng.query(ddl)
            if ins:
                eng.query(ins)
        try:
            res = eng.query(wq)
        except Exception as exc:  # noqa: BLE001
            failures.append((wq[:90], f"WRITE ERR {exc}"[:220]))
            continue
        if (check_affected and aff is not None
                and isinstance(res, OkResult)
                and res.rows_affected != aff):
            failures.append(
                (wq[:90], f"affected {res.rows_affected} != {aff}"))
            continue
        try:
            got = [tuple(_canon(c) for c in r)
                   for r in eng.query(sq).collect()]
        except Exception as exc:  # noqa: BLE001
            failures.append((sq[:90], f"SELECT ERR {exc}"[:220]))
            continue
        want = [tuple(_canon(c) for c in r) for r in expected]
        same = (got == want if "ORDER BY" in sq.upper()
                else sorted(map(repr, got)) == sorted(map(repr, want)))
        if same:
            ok += 1
        else:
            failures.append(
                (wq[:80], f"{sq[:60]} got={got[:3]} want={want[:3]}"[:240]))
    return ok, skipped, failures


def run_scripts(spark, src_path: Path, script_skip=(), assert_skip=(),
                db: str = "scriptdb", extra_fixtures: dict | None = None):
    """Returns (ok, skipped, failures). extra_fixtures values are
    (ddl, insert) like test_goldens.FIXTURES; the insert slot may be a
    list of follow-up statements."""
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
            fixtures = dict(FIXTURES)
            fixtures.update(extra_fixtures or {})
            for ddl, ins in fixtures.values():
                eng.query(ddl)
                for stmt in ([ins] if isinstance(ins, str) else ins or []):
                    eng.query(stmt)
            for stmt in setup:
                cm = re.match(r"\s*create\s+table\s+[`]?(\w+)[`]?\s*\(",
                              stmt, re.I)
                if cm and cm.group(1).lower() in fixtures:
                    eng.query(f"DROP TABLE IF EXISTS {cm.group(1)}")
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
