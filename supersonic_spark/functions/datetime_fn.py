"""Date/time expressions — expression/core/date_expressions.h.

The reference's DATETIME is int64 **microseconds** since epoch
(proto/supersonic.proto:24); Spark TimestampType is µs-precision, so parity
is exact.  DATE is int32 days (supersonic.proto:23) == Spark DateType.

Const builders (:31-39), Now (:43), UnixTimestamp/FromUnixTime (:47-51),
MakeDate/MakeDatetime (:56-62), ParseDateTime/DateFormat strftime-style
(:81,:168-175), UTC extractors Year..Microsecond (:87-134) with *Local
variants (session-timezone), AddMinute(s)/AddDay(s)/AddMonth(s) (:137-156).

All extractors below are the UTC variants when the session timezone is UTC
(supersonic_spark.session sets this); *_local variants use whatever the
session timezone is — same split as the reference.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x if isinstance(x, Column) else F.lit(x)


# --- constructors ---

def const_datetime_from_microseconds(us: int) -> Column:
    return F.timestamp_micros(F.lit(us))


def const_datetime_from_seconds(s: int) -> Column:
    return F.timestamp_seconds(F.lit(s))


def now() -> Column:
    return F.current_timestamp()


def unix_timestamp(ts) -> Column:
    """Seconds since epoch (date_expressions.h:47) — truncates sub-seconds."""
    return F.unix_timestamp(_c(ts))


def from_unix_time(secs) -> Column:
    return F.timestamp_seconds(_c(secs))


def make_date(year, month, day) -> Column:
    return F.make_date(_c(year), _c(month), _c(day))


def make_datetime(year, month, day, hour, minute, second) -> Column:
    return F.make_timestamp(_c(year), _c(month), _c(day), _c(hour), _c(minute), _c(second))


def parse_datetime(s, fmt: str) -> Column:
    """ParseDateTime (strftime-style in the reference, :81) — the engine
    accepts Spark/Java datetime patterns; callers translate %Y-%m-%d style
    via ``strftime_to_spark``."""
    return F.to_timestamp(_c(s), fmt)


_STRFTIME_MAP = [
    ("%Y", "yyyy"),
    ("%m", "MM"),
    ("%d", "dd"),
    ("%H", "HH"),
    ("%M", "mm"),
    ("%S", "ss"),
    ("%j", "DDD"),
    ("%y", "yy"),
]


def strftime_to_spark(fmt: str) -> str:
    """Translate the reference's strftime patterns (date_expressions.h:168-175)
    to Spark's java.time patterns for the common specifiers."""
    for a, b in _STRFTIME_MAP:
        fmt = fmt.replace(a, b)
    return fmt


def date_format(ts, fmt: str, strftime: bool = False) -> Column:
    return F.date_format(_c(ts), strftime_to_spark(fmt) if strftime else fmt)


# --- extractors (date_expressions.h:87-134) ---

def year(ts) -> Column:
    return F.year(_c(ts))


def quarter(ts) -> Column:
    return F.quarter(_c(ts))


def month(ts) -> Column:
    return F.month(_c(ts))


def day(ts) -> Column:
    return F.dayofmonth(_c(ts))


def weekday(ts) -> Column:
    """Reference Weekday: 0=Monday..6=Sunday (tm_wday shifted);
    Spark dayofweek is 1=Sunday..7=Saturday → convert."""
    return (F.dayofweek(_c(ts)) + 5) % 7


def yearday(ts) -> Column:
    return F.dayofyear(_c(ts))


def hour(ts) -> Column:
    return F.hour(_c(ts))


def minute(ts) -> Column:
    return F.minute(_c(ts))


def second(ts) -> Column:
    return F.second(_c(ts))


def microsecond(ts) -> Column:
    """µs within the second (date_expressions.h:131-134).  unix_micros is
    exact µs since epoch; mod 1e6 with floor-mod for pre-epoch values."""
    return F.pmod(F.unix_micros(_c(ts)), F.lit(1_000_000)).cast("int")


# --- arithmetic (date_expressions.h:137-156) — µs-exact ---

def add_minutes(ts, n) -> Column:
    return F.timestamp_micros(F.unix_micros(_c(ts)) + _c(n).cast("long") * 60_000_000)


def add_minute(ts) -> Column:
    return add_minutes(ts, 1)


def add_days(ts, n) -> Column:
    return F.timestamp_micros(F.unix_micros(_c(ts)) + _c(n).cast("long") * 86_400_000_000)


def add_day(ts) -> Column:
    return add_days(ts, 1)


def add_months(ts, n) -> Column:
    """Calendar-aware month addition (clamps day-of-month like the
    reference's tm-based arithmetic). Preserves the µs time-of-day."""
    t = _c(ts)
    d = F.to_date(t)
    shifted = F.add_months(d, _c(n))
    tod_us = F.unix_micros(t) - F.unix_micros(d.cast("timestamp"))
    return F.timestamp_micros(F.unix_micros(shifted.cast("timestamp")) + tod_us)


def add_month(ts) -> Column:
    return add_months(ts, 1)
