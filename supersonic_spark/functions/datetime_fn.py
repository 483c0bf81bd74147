"""Date/time expressions — expression/core/date_expressions.h.

The reference's DATETIME is int64 **microseconds** since epoch
(proto/supersonic.proto:24); Spark TimestampType is µs-precision, so parity
is exact.  DATE is int32 days (supersonic.proto:23) == Spark DateType.

Const builders (:31-39), Now (:43), UnixTimestamp/FromUnixTime (:47-51),
MakeDate/MakeDatetime (:56-62), ParseDateTime/DateFormat strftime-style
(:81,:168-175), UTC extractors Year..Microsecond (:87-134) with *Local
variants (session-timezone), AddMinute(s)/AddDay(s)/AddMonth(s) (:137-156).

All plain extractors below are the UTC variants when the session timezone
is UTC (supersonic_spark.session pins this).  The paired ``*_local``
variants (date_expressions.h:87-134 *Local, :168-175 DateFormatLocal)
extract in an explicit IANA timezone — or, with ``tz=None``, in whatever
the session timezone is (the reference's process-local semantics).  They
are implemented by converting the instant to a TIMESTAMP_NTZ wall clock in
the target zone (``convert_timezone``), so they stay correct — including
across DST transitions — regardless of the session timezone setting.
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


# --- *Local extractors (date_expressions.h:87-134,168-175) ---

def local_wallclock(ts, tz: str | None = None) -> Column:
    """The instant ``ts`` as a naive TIMESTAMP_NTZ wall clock in ``tz``
    (IANA name) — or in the session timezone when ``tz`` is None, matching
    the reference's process-local *Local semantics.  The NTZ cast renders
    the instant in the session zone; ``convert_timezone`` then re-renders
    that wall clock in the target zone.  Extractors over NTZ are
    timezone-agnostic, so the composition is session-setting-independent."""
    ntz = _c(ts).cast("timestamp").cast("timestamp_ntz")
    if tz is None:
        return ntz
    return F.convert_timezone(F.current_timezone(), F.lit(tz), ntz)


def year_local(ts, tz: str | None = None) -> Column:
    return F.year(local_wallclock(ts, tz))


def quarter_local(ts, tz: str | None = None) -> Column:
    return F.quarter(local_wallclock(ts, tz))


def month_local(ts, tz: str | None = None) -> Column:
    return F.month(local_wallclock(ts, tz))


def day_local(ts, tz: str | None = None) -> Column:
    return F.dayofmonth(local_wallclock(ts, tz))


def weekday_local(ts, tz: str | None = None) -> Column:
    """0=Monday..6=Sunday, as :func:`weekday`."""
    return (F.dayofweek(local_wallclock(ts, tz)) + 5) % 7


def yearday_local(ts, tz: str | None = None) -> Column:
    return F.dayofyear(local_wallclock(ts, tz))


def hour_local(ts, tz: str | None = None) -> Column:
    return F.hour(local_wallclock(ts, tz))


def minute_local(ts, tz: str | None = None) -> Column:
    return F.minute(local_wallclock(ts, tz))


def second_local(ts, tz: str | None = None) -> Column:
    return F.second(local_wallclock(ts, tz))


def date_format_local(ts, fmt: str, tz: str | None = None, strftime: bool = False) -> Column:
    """DateFormatLocal (date_expressions.h:168-175): format the instant's
    wall clock in ``tz`` (session timezone when None)."""
    return F.date_format(
        local_wallclock(ts, tz), strftime_to_spark(fmt) if strftime else fmt
    )


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
