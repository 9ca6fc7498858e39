"""Math / string / conditional scalar shims (reference registry.go entries;
implementations under reference sql/expression/function/*.go).

Every builder returns a pure Column expression — JVM-side, codegen-able,
no Python in the data path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


# ---- math -------------------------------------------------------------------

def _truncate(x, d) -> Column:
    """MySQL TRUNCATE(x, d): toward zero at d decimals
    (reference function/math.go Truncate)."""
    x, d = _c(x), _c(d)
    scale = F.pow(F.lit(10.0), d)
    return F.when(x >= 0, F.floor(x * scale) / scale).otherwise(
        F.ceil(x * scale) / scale
    )


def _cot(x) -> Column:
    return F.lit(1.0) / F.tan(_c(x))


def _log_mysql(*args) -> Column:
    """MySQL LOG(x) = ln(x); LOG(b, x) = log base b."""
    if len(args) == 1:
        return F.log(_c(args[0]))
    return F.log(_c(args[1])) / F.log(_c(args[0]))


MATH = {
    "abs": lambda x: F.abs(_c(x)),
    "acos": lambda x: F.acos(_c(x)),
    "asin": lambda x: F.asin(_c(x)),
    "atan": lambda *a: F.atan2(_c(a[0]), _c(a[1])) if len(a) == 2 else F.atan(_c(a[0])),
    "atan2": lambda y, x: F.atan2(_c(y), _c(x)),
    "ceil": lambda x: F.ceil(_c(x)),
    "ceiling": lambda x: F.ceil(_c(x)),
    "conv": lambda n, f, t: F.conv(_c(n), f, t),
    "cos": lambda x: F.cos(_c(x)),
    "cot": _cot,
    "crc32": lambda x: F.crc32(_c(x).cast("binary")),
    "degrees": lambda x: F.degrees(_c(x)),
    "exp": lambda x: F.exp(_c(x)),
    "floor": lambda x: F.floor(_c(x)),
    "ln": lambda x: F.log(_c(x)),
    "log": _log_mysql,
    "log10": lambda x: F.log10(_c(x)),
    "log2": lambda x: F.log2(_c(x)),
    "mod": lambda a, b: _c(a) % _c(b),
    "pi": lambda: F.lit(3.141592653589793),
    "pow": lambda x, y: F.pow(_c(x), _c(y)),
    "power": lambda x, y: F.pow(_c(x), _c(y)),
    "radians": lambda x: F.radians(_c(x)),
    "rand": lambda *a: F.rand(a[0]) if a else F.rand(),
    "round": lambda x, d=0: F.round(_c(x), d if isinstance(d, int) else 0),
    "sign": lambda x: F.signum(_c(x)).cast("int"),
    "sin": lambda x: F.sin(_c(x)),
    "sqrt": lambda x: F.sqrt(_c(x)),
    "tan": lambda x: F.tan(_c(x)),
    "truncate": _truncate,
}

# ---- string -----------------------------------------------------------------

def _insert(s, pos, length, news) -> Column:
    """MySQL INSERT(str,pos,len,newstr) (reference function/insert.go)."""
    s, news = _c(s), _c(news)
    pos, length = _c(pos), _c(length)
    out = F.concat(
        F.substring(s, F.lit(1), pos - 1),
        news,
        F.substring(s, pos + length, F.length(s)),
    )
    return F.when((pos < 1) | (pos > F.length(s)), s).otherwise(out)


def _field(x, *candidates) -> Column:
    """FIELD(x, a, b, …): 1-based index of x in the list, 0 if absent."""
    return F.array_position(F.array(*[_c(c) for c in candidates]), _c(x)).cast("int")


def _strcmp(a, b) -> Column:
    a, b = _c(a), _c(b)
    return F.when(a < b, -1).when(a > b, 1).otherwise(0)


def _export_set(bits, on, off, sep=",", n_bits=64) -> Column:
    """EXPORT_SET(bits,on,off[,sep[,bits]]) (reference export_set.go):
    per bit i (LSB first) emit `on` if set else `off`, joined by sep."""
    bits, on, off = _c(bits), _c(on), _c(off)
    parts = None
    for i in range(n_bits):
        piece = F.when(bits.cast("long").bitwiseAND(F.lit(1 << i)) != 0, on).otherwise(off)
        parts = piece if parts is None else F.concat(parts, F.lit(sep), piece)
    return parts


def _make_set(bits, *strs) -> Column:
    """MAKE_SET(bits, s1, s2, …): comma-join of strs whose bit is set."""
    bits = _c(bits)
    arr = F.array(*[
        F.when(bits.cast("long").bitwiseAND(F.lit(1 << i)) != 0, _c(s))
        for i, s in enumerate(strs)
    ])
    return F.array_join(F.filter(arr, lambda x: x.isNotNull()), ",")


def _quote(s) -> Column:
    s = _c(s)
    return F.when(
        s.isNull(), F.lit("NULL")
    ).otherwise(
        F.concat(F.lit("'"),
                 F.regexp_replace(s, r"(['\\])", r"\\$1"),
                 F.lit("'"))
    )


STRING = {
    "ascii": lambda s: F.ascii(_c(s)),
    "bin": lambda n: F.bin(_c(n)),
    "bit_length": lambda s: F.bit_length(_c(s)),
    "char": lambda *ns: F.concat(*[F.char(_c(n)) for n in ns]),
    "char_length": lambda s: F.char_length(_c(s)),
    "character_length": lambda s: F.char_length(_c(s)),
    "concat": lambda *a: F.concat(*[_c(x) for x in a]),
    "concat_ws": lambda sep, *a: F.concat_ws(sep, *[_c(x) for x in a]),
    "elt": lambda n, *a: F.elt(_c(n), *[_c(x) for x in a]),
    "export_set": _export_set,
    "field": _field,
    "find_in_set": lambda x, s: F.find_in_set(_c(x), _c(s)),
    "format": lambda x, d: F.format_number(_c(x), d),
    "from_base64": lambda s: F.unbase64(_c(s)),
    "hex": lambda x: F.hex(_c(x)),
    "insert": _insert,
    "instr": lambda s, sub: F.instr(_c(s), sub),
    "lcase": lambda s: F.lower(_c(s)),
    "left": lambda s, n: F.substring(_c(s), 1, n),
    "length": lambda s: F.octet_length(_c(s)),  # MySQL LENGTH = bytes
    "locate": lambda sub, s, *pos: F.locate(sub, _c(s), pos[0] if pos else 1),
    "lower": lambda s: F.lower(_c(s)),
    "lpad": lambda s, n, p: F.lpad(_c(s), n, p),
    "ltrim": lambda s: F.ltrim(_c(s)),
    "make_set": _make_set,
    "mid": lambda s, pos, n: F.substring(_c(s), pos, n),
    "oct": lambda n: F.conv(_c(n).cast("string"), 10, 8),
    "octet_length": lambda s: F.octet_length(_c(s)),
    "ord": lambda s: F.ascii(_c(s)),  # ASCII-range shim (MySQL multibyte ord differs)
    "quote": _quote,
    "repeat": lambda s, n: F.repeat(_c(s), n),
    "replace": lambda s, a, b: F.replace(_c(s), _c(a), _c(b)),
    "reverse": lambda s: F.reverse(_c(s)),
    "right": lambda s, n: F.substring(_c(s), -n, n),
    "rpad": lambda s, n, p: F.rpad(_c(s), n, p),
    "rtrim": lambda s: F.rtrim(_c(s)),
    "soundex": lambda s: F.soundex(_c(s)),
    "space": lambda n: F.repeat(F.lit(" "), n),
    "strcmp": _strcmp,
    "substr": lambda s, pos, *n: F.substring(_c(s), pos, n[0] if n else 2147483647),
    "substring": lambda s, pos, *n: F.substring(_c(s), pos, n[0] if n else 2147483647),
    "substring_index": lambda s, d, n: F.substring_index(_c(s), d, n),
    "to_base64": lambda s: F.base64(_c(s).cast("binary")),
    "ucase": lambda s: F.upper(_c(s)),
    "unhex": lambda s: F.unhex(_c(s)),
    "upper": lambda s: F.upper(_c(s)),
}

# ---- conditional ------------------------------------------------------------

CONDITIONAL = {
    "coalesce": lambda *a: F.coalesce(*[_c(x) for x in a]),
    "if": lambda c, a, b: F.when(_c(c), _c(a)).otherwise(_c(b)),
    "ifnull": lambda a, b: F.ifnull(_c(a), _c(b)),
    "isnull": lambda x: _c(x).isNull().cast("int"),
    "nullif": lambda a, b: F.nullif(_c(a), _c(b)),
    "greatest": lambda *a: F.greatest(*[_c(x) for x in a]),
    "least": lambda *a: F.least(*[_c(x) for x in a]),
    "interval": lambda x, *bounds: sum(
        (F.when(_c(b) <= _c(x), 1).otherwise(0) for b in bounds), F.lit(0)
    ),
}

FUNCTIONS = {**MATH, **STRING, **CONDITIONAL}
