"""MySQL → Spark SQL dialect transpiler (SELECT path).

The reference parses MySQL with the vitess parser and binds its own plan
tree (reference sql/planbuilder/parse.go:35-92). Spark already parses a
close cousin of MySQL SQL, so the Spark-first frontend is a light source-to-
source rewrite + Catalyst — NOT a hand-built parser: we only touch the
constructs where the dialects actually diverge.

Handled rewrites:
- LIMIT x, y              → LIMIT y OFFSET x
- MySQL date-format %-patterns inside DATE_FORMAT/STR_TO_DATE/TIME_FORMAT
                          → Java DateTimeFormatter patterns
- STR_TO_DATE(s, f)       → to_timestamp(s, f')
- GROUP_CONCAT([DISTINCT] x [SEPARATOR s]) → array_join(array_sort(
                            collect_list/set(x)), s)
- a XOR b                 → boolean !=
- function aliases with no Spark twin (UCASE, LCASE, MID, …)
- backticks, <=>, DIV, IF/IFNULL/NULLIF, INTERVAL syntax pass through —
  Spark accepts them natively.

Statement routing (USE/SET/SHOW/DDL/DML) happens in engine.py before this
runs; this module only sees queries.
"""

from __future__ import annotations

import re

# MySQL date-format token → Java DateTimeFormatter pattern
# (reference sql/expression/function/dateparse.go / date_format.go)
MYSQL_TO_JAVA_FMT = {
    "%Y": "yyyy", "%y": "yy",
    "%m": "MM", "%c": "M",
    "%d": "dd", "%e": "d",
    "%H": "HH", "%k": "H",
    "%h": "hh", "%l": "h", "%I": "hh",
    "%i": "mm",
    "%s": "ss", "%S": "ss",
    "%f": "SSSSSS",
    "%p": "a",
    "%M": "MMMM", "%b": "MMM",
    "%a": "EEE", "%W": "EEEE",
    "%j": "DDD",
    "%T": "HH:mm:ss",
    "%r": "hh:mm:ss a",
    "%%": "%",
}

# Simple name-for-name function aliases (MySQL name → Spark name).
FUNC_ALIASES = {
    "ucase": "upper",
    "lcase": "lower",
    "mid": "substring",
    "curdate": "current_date",
    "curtime": "current_timestamp",
    "sysdate": "current_timestamp",
    "localtime": "current_timestamp",
    "localtimestamp": "current_timestamp",
    "day": "dayofmonth",
    "lengthb": "octet_length",
    "truncate": "trunc_number",  # registered UDF-free shim in engine
    "rand": "rand",
    "char_length": "char_length",
    "power": "power",
}


def translate_datetime_format(fmt: str) -> str:
    """'%Y-%m-%d %H:%i:%s' → 'yyyy-MM-dd HH:mm:ss'."""
    out, i = [], 0
    while i < len(fmt):
        tok = fmt[i:i + 2]
        if tok in MYSQL_TO_JAVA_FMT:
            out.append(MYSQL_TO_JAVA_FMT[tok])
            i += 2
        elif fmt[i] == "%" and i + 1 < len(fmt):
            out.append(fmt[i + 1])
            i += 2
        else:
            ch = fmt[i]
            # escape letters that are pattern-significant in Java
            out.append(f"'{ch}'" if ch.isalpha() else ch)
            i += 1
    return "".join(out)


_LIMIT_COMMA = re.compile(
    r"\bLIMIT\s+(\d+)\s*,\s*(\d+)", re.IGNORECASE
)

_DATE_FMT_CALL = re.compile(
    r"\b(DATE_FORMAT|TIME_FORMAT|STR_TO_DATE)\s*\(", re.IGNORECASE
)

_GROUP_CONCAT = re.compile(r"\bGROUP_CONCAT\s*\(", re.IGNORECASE)

_XOR = re.compile(r"\bXOR\b", re.IGNORECASE)


def _find_close(s: str, start: int) -> int:
    """Index of the ')' matching the '(' at start (string-literal aware)."""
    depth, i, n = 0, start, len(s)
    while i < n:
        c = s[i]
        if c == "'":
            i += 1
            while i < n and (s[i] != "'" or (i + 1 < n and s[i + 1] == "'")):
                i += 2 if s[i] == "'" else 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise ValueError(f"unbalanced parens in SQL near offset {start}")


def _split_args(arglist: str) -> list[str]:
    """Split a function arg list on top-level commas."""
    args, depth, cur, i, n = [], 0, [], 0, len(arglist)
    while i < n:
        c = arglist[i]
        if c == "'":
            cur.append(c)
            i += 1
            while i < n:
                cur.append(arglist[i])
                if arglist[i] == "'":
                    i += 1
                    break
                i += 1
            continue
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        if c == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
        i += 1
    if cur:
        args.append("".join(cur).strip())
    return args


def _rewrite_datetime_formats(sql: str) -> str:
    """Translate the format-string argument of DATE_FORMAT/STR_TO_DATE/
    TIME_FORMAT; STR_TO_DATE additionally becomes to_timestamp."""
    pos = 0
    while True:
        m = _DATE_FMT_CALL.search(sql, pos)
        if not m:
            return sql
        fname = m.group(1).upper()
        open_paren = m.end() - 1
        close = _find_close(sql, open_paren)
        args = _split_args(sql[open_paren + 1:close])
        if len(args) == 2 and args[1].startswith("'") and args[1].endswith("'"):
            java = translate_datetime_format(args[1][1:-1])
            if fname == "STR_TO_DATE":
                repl = f"to_timestamp({args[0]}, '{java}')"
            else:
                repl = f"date_format({args[0]}, '{java}')"
        else:  # dynamic format: leave as-is but still swap the fn name
            repl = f"date_format({', '.join(args)})"
        sql = sql[:m.start()] + repl + sql[close + 1:]
        # resume after the rewritten call — its name would match again
        pos = m.start() + len(repl)


def _rewrite_group_concat(sql: str) -> str:
    """GROUP_CONCAT([DISTINCT] expr [ORDER BY ...] [SEPARATOR 'x'])
    → array_join(array_sort(collect_list|collect_set(expr)), 'x').

    The explicit array_sort imposes the deterministic order MySQL's
    ORDER BY clause provides (reference group_concat.go)."""
    while True:
        m = _GROUP_CONCAT.search(sql)
        if not m:
            return sql
        open_paren = m.end() - 1
        close = _find_close(sql, open_paren)
        body = sql[open_paren + 1:close].strip()
        sep = ","
        sep_m = re.search(r"\bSEPARATOR\s+'([^']*)'\s*$", body, re.IGNORECASE)
        if sep_m:
            sep = sep_m.group(1)
            body = body[:sep_m.start()].strip()
        body = re.sub(r"\bORDER\s+BY\b.*$", "", body, flags=re.IGNORECASE).strip()
        distinct = False
        if body.upper().startswith("DISTINCT "):
            distinct = True
            body = body[len("DISTINCT "):]
        collect = "collect_set" if distinct else "collect_list"
        repl = f"array_join(array_sort({collect}({body})), '{sep}')"
        sql = sql[:m.start()] + repl + sql[close + 1:]


def _rewrite_aliases(sql: str) -> str:
    for myname, sparkname in FUNC_ALIASES.items():
        if myname == sparkname:
            continue
        sql = re.sub(rf"\b{myname}\s*\(", f"{sparkname}(", sql,
                     flags=re.IGNORECASE)
    return sql


def transpile_select(sql: str) -> str:
    """MySQL SELECT → Spark SQL SELECT."""
    sql = _LIMIT_COMMA.sub(lambda m: f"LIMIT {m.group(2)} OFFSET {m.group(1)}", sql)
    sql = _rewrite_datetime_formats(sql)
    sql = _rewrite_group_concat(sql)
    sql = _rewrite_aliases(sql)
    # MySQL logical XOR on booleans ≡ boolean inequality
    sql = _XOR.sub("!=", sql)
    return sql
