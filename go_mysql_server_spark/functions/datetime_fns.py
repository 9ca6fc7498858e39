"""Date/time scalar shims (reference registry.go; implementations under
reference sql/expression/function/time*.go, date_format.go, dateparse.go).

MySQL conventions preserved:
- DAYOFWEEK: 1=Sunday..7=Saturday — Spark's dayofweek matches 1:1.
- WEEKDAY: 0=Monday..6=Sunday — derived from dayofweek.
- TO_DAYS/FROM_DAYS: days since year 0 (offset 719528 from epoch).
- WEEK(d) mode 0: Sunday-start, week 0 for days before the first Sunday.
- %-format language translated by dialect/transpiler.translate_datetime_format.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..dialect.transpiler import translate_datetime_format

# days from year 0 (MySQL TO_DAYS epoch) to 1970-01-01
_DAYS_Y0_TO_EPOCH = 719528


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


def _weekday(d) -> Column:
    """0=Monday..6=Sunday (reference time.go Weekday)."""
    return (F.dayofweek(_c(d)) + 5) % 7


def _week_mode0(d) -> Column:
    """WEEK(d, 0): Sunday-start weeks, 0..53; week 0 covers days before the
    year's first Sunday."""
    d = _c(d)
    jan1 = F.trunc(d, "year")
    jan1_dow = F.dayofweek(jan1)  # 1=Sunday
    days_before_first_sunday = (F.lit(8) - jan1_dow) % 7
    doy = F.dayofyear(d)
    return F.when(doy <= days_before_first_sunday, 0).otherwise(
        F.floor((doy - days_before_first_sunday - 1) / 7) + 1
    ).cast("int")


def _yearweek(d) -> Column:
    d = _c(d)
    return (F.year(d) * 100 + _week_mode0(d)).cast("int")


def _to_days(d) -> Column:
    return (F.datediff(_c(d), F.lit("1970-01-01")) + _DAYS_Y0_TO_EPOCH).cast("long")


def _from_days(n) -> Column:
    return F.date_add(F.lit("1970-01-01"), (_c(n) - _DAYS_Y0_TO_EPOCH).cast("int"))


def _timestampdiff(unit: str, a, b) -> Column:
    """TIMESTAMPDIFF(unit, a, b) = b - a in `unit` (integer, truncated)."""
    a, b = _c(a).cast("timestamp"), _c(b).cast("timestamp")
    unit = unit.strip("'\"").upper()
    seconds = b.cast("long") - a.cast("long")
    per = {"SECOND": 1, "MINUTE": 60, "HOUR": 3600, "DAY": 86400, "WEEK": 604800}
    if unit in per:
        return (seconds / per[unit]).cast("long")
    months = (F.year(b) - F.year(a)) * 12 + (F.month(b) - F.month(a))
    # truncate toward zero if the day-of-month hasn't been reached
    adjust = F.when(
        (months > 0) & (F.dayofmonth(b) < F.dayofmonth(a)), months - 1
    ).when(
        (months < 0) & (F.dayofmonth(b) > F.dayofmonth(a)), months + 1
    ).otherwise(months)
    if unit == "MONTH":
        return adjust.cast("long")
    if unit == "QUARTER":
        return (adjust / 3).cast("long")
    if unit == "YEAR":
        return (adjust / 12).cast("long")
    raise ValueError(f"unsupported TIMESTAMPDIFF unit {unit!r}")


def _time_to_sec(t) -> Column:
    """TIME_TO_SEC('HH:MM:SS') for non-negative times (TIME-as-string shim)."""
    t = _c(t)
    p = F.split(t, ":")
    return (
        p.getItem(0).cast("long") * 3600
        + p.getItem(1).cast("long") * 60
        + p.getItem(2).cast("double").cast("long")
    )


def _sec_to_time(s) -> Column:
    s = _c(s).cast("long")
    return F.format_string(
        "%02d:%02d:%02d", (s / 3600).cast("long"), ((s % 3600) / 60).cast("long"),
        (s % 60).cast("long")
    )


def _addtime(t, delta) -> Column:
    """ADDTIME('HH:MM:SS','HH:MM:SS') — TIME duration addition (reference
    sql/expression/function/time.go; TIME-as-string shim)."""
    return _sec_to_time(_time_to_sec(t) + _time_to_sec(delta))


def _subtime(t, delta) -> Column:
    return _sec_to_time(_time_to_sec(t) - _time_to_sec(delta))


def _maketime(h, m, s) -> Column:
    return F.format_string(
        "%02d:%02d:%02d", _c(h).cast("long"), _c(m).cast("long"),
        _c(s).cast("long"))


def _timediff(a, b) -> Column:
    """TIMEDIFF(a,b) = a-b as 'HH:MM:SS' (may exceed 24h; sign-aware)."""
    secs = _c(a).cast("timestamp").cast("long") - _c(b).cast("timestamp").cast("long")
    absd = F.abs(secs)
    body = F.format_string(
        "%02d:%02d:%02d", (absd / 3600).cast("long"),
        ((absd % 3600) / 60).cast("long"), (absd % 60).cast("long")
    )
    return F.when(secs < 0, F.concat(F.lit("-"), body)).otherwise(body)


def _date_add_interval(d, n, unit: str) -> Column:
    unit = unit.upper()
    n = _c(n)
    d = _c(d)
    if unit == "DAY":
        return F.timestamp_add("DAY", n, d)
    return F.timestamp_add(unit, n, d)


def _dateformat(d, fmt: str) -> Column:
    return F.date_format(_c(d), translate_datetime_format(fmt))


FUNCTIONS = {
    "adddate": lambda d, n: F.date_add(_c(d), n),
    "curdate": lambda: F.current_date(),
    "current_date": lambda: F.current_date(),
    "current_time": lambda: F.date_format(F.current_timestamp(), "HH:mm:ss"),
    "current_timestamp": lambda: F.current_timestamp(),
    "curtime": lambda: F.date_format(F.current_timestamp(), "HH:mm:ss"),
    "date": lambda d: F.to_date(_c(d)),
    "date_add": _date_add_interval,
    "date_format": _dateformat,
    "date_sub": lambda d, n, unit="DAY": _date_add_interval(d, -n if isinstance(n, int) else -_c(n), unit),
    "datediff": lambda a, b: F.datediff(_c(a), _c(b)),
    "day": lambda d: F.dayofmonth(_c(d)),
    "dayname": lambda d: F.date_format(_c(d), "EEEE"),
    "dayofmonth": lambda d: F.dayofmonth(_c(d)),
    "dayofweek": lambda d: F.dayofweek(_c(d)),
    "dayofyear": lambda d: F.dayofyear(_c(d)),
    "extract": lambda unit, d: {
        "YEAR": F.year, "QUARTER": F.quarter, "MONTH": F.month,
        "WEEK": F.weekofyear, "DAY": F.dayofmonth, "HOUR": F.hour,
        "MINUTE": F.minute, "SECOND": F.second, "DAYOFYEAR": F.dayofyear,
    }[unit.strip("'\"").upper()](_c(d)),
    "from_days": _from_days,
    "from_unixtime": lambda s, *fmt: (
        _dateformat(F.to_timestamp(F.from_unixtime(_c(s))), fmt[0])
        if fmt else F.to_timestamp(F.from_unixtime(_c(s)))
    ),
    "hour": lambda t: F.hour(_c(t)),
    "last_day": lambda d: F.last_day(_c(d)),
    "localtime": lambda: F.current_timestamp(),
    "localtimestamp": lambda: F.current_timestamp(),
    "makedate": lambda y, doy: F.date_add(F.make_date(_c(y), F.lit(1), F.lit(1)),
                                          (_c(doy) - 1).cast("int")),
    "microsecond": lambda t: (F.unix_micros(_c(t)) % 1_000_000).cast("int"),
    "minute": lambda t: F.minute(_c(t)),
    "month": lambda d: F.month(_c(d)),
    "monthname": lambda d: F.date_format(_c(d), "MMMM"),
    "now": lambda: F.current_timestamp(),
    "quarter": lambda d: F.quarter(_c(d)),
    "sec_to_time": _sec_to_time,
    "second": lambda t: F.second(_c(t)),
    "str_to_date": lambda s, fmt: F.to_timestamp(_c(s), translate_datetime_format(fmt)),
    "subdate": lambda d, n: F.date_sub(_c(d), n),
    "sysdate": lambda: F.current_timestamp(),
    "time": lambda t: F.date_format(_c(t), "HH:mm:ss"),
    "time_format": _dateformat,
    "time_to_sec": _time_to_sec,
    "timediff": _timediff,
    "addtime": _addtime,
    "subtime": _subtime,
    "maketime": _maketime,
    "timestamp": lambda d: _c(d).cast("timestamp"),
    "timestampdiff": _timestampdiff,
    "to_days": _to_days,
    "unix_timestamp": lambda *d: F.unix_timestamp(_c(d[0])) if d else F.unix_timestamp(),
    "utc_timestamp": lambda: F.current_timestamp(),  # session tz is UTC
    "week": lambda d, *mode: _week_mode0(d),
    "weekday": _weekday,
    "weekofyear": lambda d: F.weekofyear(_c(d)),
    "year": lambda d: F.year(_c(d)),
    "yearweek": _yearweek,
}
