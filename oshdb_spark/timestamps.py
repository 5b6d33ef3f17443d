"""Regularly spaced ISO-8601 timestamp lists.

Reference: OSHDBTimestamps
(/root/reference/oshdb-util/src/main/java/org/heigit/ohsome/oshdb/util/time/OSHDBTimestamps.java:28-40)
generates timestamps from a start, stepping by an ISO-8601 period
(YEARLY "P1Y" ... HOURLY "PT1H"), inclusive of every step <= end; ISO
datetime parsing per IsoDateTimeParser.  Calendar stepping is
day-of-month-clamping like java.time (Jan 31 + P1M = Feb 28/29).

All timestamps are epoch MICROSECONDS (the engine's native unit — parquet
TIMESTAMP is micros) in UTC.
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timezone

YEARLY = "P1Y"
QUARTERLY = "P3M"
MONTHLY = "P1M"
WEEKLY = "P7D"
DAILY = "P1D"
HOURLY = "PT1H"

_PERIOD_RE = re.compile(
    r"^P(?:(\d+)Y)?(?:(\d+)M)?(?:(\d+)W)?(?:(\d+)D)?"
    r"(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?)?$"
)


def parse_period(period: str) -> tuple[int, int, int]:
    """ISO-8601 period -> (months, days, seconds)."""
    m = _PERIOD_RE.match(period.strip().upper())
    if not m or period.strip().upper() == "P":
        raise ValueError(f"invalid ISO-8601 period: {period!r}")
    y, mo, w, d, h, mi, s = (float(g) if g else 0 for g in m.groups())
    months = int(y) * 12 + int(mo)
    days = int(w) * 7 + int(d)
    seconds = int(h) * 3600 + int(mi) * 60 + int(s)
    if months == 0 and days == 0 and seconds == 0:
        raise ValueError(f"zero-length period: {period!r}")
    return months, days, seconds


def parse_iso(ts: str | int | datetime) -> int:
    """ISO date/datetime string (or epoch-micros int / datetime) -> epoch micros."""
    if isinstance(ts, int):
        return ts
    if isinstance(ts, datetime):
        dt = ts if ts.tzinfo else ts.replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1_000_000)
    s = ts.strip()
    # IsoDateTimeParser.java rejections: negative years, short years and
    # any explicit timezone offset (only Z / naive-as-UTC are accepted)
    if s.startswith("-"):
        raise ValueError(f"negative dates are not supported: {ts!r}")
    if re.search(r"[+](?:\d{2}(?::?\d{2})?)$", s) or re.search(
        r"T.*-\d{2}(?::?\d{2})?$", s
    ):
        raise ValueError(f"timezone offsets are not supported: {ts!r}")
    if s.endswith("Z"):
        s = s[:-1]
    if s.isdigit():
        # basic ISO formats by length: yyyy / yyyymm / yyyymmdd
        fmts = {4: "%Y", 6: "%Y%m", 8: "%Y%m%d"}
        fmt = fmts.get(len(s))
        if fmt is None:
            raise ValueError(f"unparseable ISO timestamp: {ts!r}")
        dt = datetime.strptime(s, fmt).replace(tzinfo=timezone.utc)
        return int(dt.timestamp()) * 1_000_000
    for fmt in (
        "%Y-%m-%dT%H:%M:%S.%f",
        "%Y-%m-%dT%H:%M:%S",
        "%Y-%m-%dT%H:%M",
        "%Y-%m-%dT%H",
        "%Y-%m-%d",
        "%Y-%m",
    ):
        try:
            dt = datetime.strptime(s, fmt).replace(tzinfo=timezone.utc)
            return int(dt.timestamp()) * 1_000_000 + dt.microsecond
        except ValueError:
            continue
    raise ValueError(f"unparseable ISO timestamp: {ts!r}")


def _add_period(dt: datetime, months: int, days: int, seconds: int) -> datetime:
    if months:
        total = dt.year * 12 + (dt.month - 1) + months
        year, month = divmod(total, 12)
        month += 1
        day = min(dt.day, calendar.monthrange(year, month)[1])
        dt = dt.replace(year=year, month=month, day=day)
    if days or seconds:
        from datetime import timedelta

        dt = dt + timedelta(days=days, seconds=seconds)
    return dt


def timestamps(
    start: str | int, end: str | int, period: str | None = None
) -> list[int]:
    """Epoch-micros list [start, start+P, ...] up to and including end.

    With no period: just [start, end] (the two-timestamp overload,
    MapReducer.timestamps(isoDateStart, isoDateEnd)).
    """
    t0, t1 = parse_iso(start), parse_iso(end)
    if t1 < t0:
        raise ValueError("end before start")
    if period is None:
        return [t0, t1] if t1 != t0 else [t0]
    months, days, seconds = parse_period(period)
    # Each step is start + i*period computed FROM THE ORIGINAL START, matching
    # OSHDBTimestamps' fromDate.plus(intervalLength.multipliedBy(i)) — chaining
    # from the previous (possibly day-clamped) timestamp would make the clamp
    # stick (2020-01-31 + P1M + P1M would give Mar 29 instead of Mar 31).
    start_dt = datetime.fromtimestamp(t0 / 1_000_000, tz=timezone.utc)
    out = []
    i = 0
    cur = t0
    while cur <= t1:
        out.append(cur)
        i += 1
        dt = _add_period(start_dt, i * months, i * days, i * seconds)
        cur = int(dt.timestamp()) * 1_000_000 + dt.microsecond
    return out


class TimestampInterval:
    """From-to time interval with OSHDBTimestampInterval parity
    (/root/reference/oshdb-util/src/main/java/org/heigit/ohsome/oshdb/util/time/OSHDBTimestampInterval.java):
    ``intersects`` is closed on both ends, ``includes`` is half-open
    ``[from, to)`` — the engine's snapshot/contribution interval
    convention — and ordering compares ``from`` then ``to``.

    Timestamps are plain ints in any consistent unit (the engine uses
    epoch microseconds); the no-arg constructor is the reference's
    unbounded interval (Long.MIN_VALUE, Long.MAX_VALUE analog).
    """

    __slots__ = ("from_ts", "to_ts")

    _MIN = -(2**63)
    _MAX = 2**63 - 1

    def __init__(self, from_ts: int | None = None, to_ts: int | None = None):
        self.from_ts = self._MIN if from_ts is None else int(from_ts)
        self.to_ts = self._MAX if to_ts is None else int(to_ts)

    def intersects(self, other: "TimestampInterval") -> bool:
        return other.to_ts >= self.from_ts and other.from_ts <= self.to_ts

    def includes(self, ts: int) -> bool:
        return self.from_ts <= ts < self.to_ts

    def compare_against_timestamp(self, ts: int) -> int:
        if self.includes(ts):
            return 0
        return -1 if ts < self.from_ts else 1

    def compare_to(self, other: "TimestampInterval") -> int:
        c = (self.from_ts > other.from_ts) - (self.from_ts < other.from_ts)
        if c == 0:
            c = (self.to_ts > other.to_ts) - (self.to_ts < other.to_ts)
        return c

    def __lt__(self, other: "TimestampInterval") -> bool:
        return self.compare_to(other) < 0

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, TimestampInterval)
            and self.from_ts == other.from_ts
            and self.to_ts == other.to_ts
        )

    def __hash__(self) -> int:
        return hash((self.from_ts, self.to_ts))

    def __repr__(self) -> str:
        return f"TimestampInterval({self.from_ts}, {self.to_ts})"
