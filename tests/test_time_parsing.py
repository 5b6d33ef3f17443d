"""ISO-8601 datetime/period parsing + timestamp-list parity.

1:1 ports of IsoDateTimeParserTest.java and OSHDBTimestampsTest.java
(reference oshdb-util util/time): accepted basic/extended ISO variants,
the rejection rules (negative years, short years, explicit timezone
offsets, zero-length and malformed periods), and interval stepping with
day-of-month clamping across all six named intervals.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from oshdb_spark.timestamps import (
    DAILY,
    HOURLY,
    MONTHLY,
    QUARTERLY,
    WEEKLY,
    YEARLY,
    parse_iso,
    parse_period,
    timestamps,
)


def _us(iso: str) -> int:
    return int(
        datetime.strptime(iso, "%Y-%m-%dT%H:%M:%S")
        .replace(tzinfo=timezone.utc)
        .timestamp()
    ) * 1_000_000


class TestParseIsoDateTime:
    # (expected extended form, input) — IsoDateTimeParserTest:20-72
    ACCEPTED = [
        ("2020-01-01T00:00:00", "2020"),
        ("2020-02-01T00:00:00", "202002"),
        ("2020-02-17T00:00:00", "20200217"),
        ("2020-02-01T00:00:00", "2020-02"),
        ("2020-02-17T00:00:00", "2020-02-17"),
        ("2020-02-17T23:00:00", "2020-02-17T23"),
        ("2020-02-17T23:00:00", "2020-02-17T23Z"),
        ("2020-02-17T23:55:00", "2020-02-17T23:55"),
        ("2020-02-17T23:55:00", "2020-02-17T23:55Z"),
        ("2020-02-17T23:55:12", "2020-02-17T23:55:12"),
        ("2020-02-17T23:55:12", "2020-02-17T23:55:12Z"),
    ]

    @pytest.mark.parametrize("expected,raw", ACCEPTED)
    def test_accepted_variants(self, expected, raw):
        assert parse_iso(raw) == _us(expected)

    def test_fractional_seconds(self):
        assert parse_iso("2020-02-17T23:55:12.999") == (
            _us("2020-02-17T23:55:12") + 999_000
        )
        assert parse_iso("2020-02-17T23:55:12.999Z") == (
            _us("2020-02-17T23:55:12") + 999_000
        )

    @pytest.mark.parametrize(
        "bad",
        [
            "-0333",  # negative date
            "12",  # short year
            "2020-02-17T23:55+02",
            "2020-02-17T23:55+0230",
            "2020-02-17T23:55+02:30",
            "2020-02-17T23:55-02",
            "2020-02-17T23:55-0230",
            "2020-02-17T23:55-02:30",
            "2020-13-01T00:00",  # wrong month
        ],
    )
    def test_rejected_variants(self, bad):
        with pytest.raises(ValueError):
            parse_iso(bad)


class TestParseIsoPeriod:
    def test_full_datetime_period(self):
        # P1Y3M10DT1H15M25S -> period P1Y3M10D + duration PT1H15M25S
        months, days, seconds = parse_period("P1Y3M10DT1H15M25S")
        assert (months, days) == (15, 10)
        assert seconds == 1 * 3600 + 15 * 60 + 25

    def test_full_date_period(self):
        months, days, seconds = parse_period("P1Y3M10D")
        assert (months, days, seconds) == (15, 10, 0)

    def test_short_date_period(self):
        months, days, seconds = parse_period("P3M10D")
        assert (months, days, seconds) == (3, 10, 0)

    def test_week_period(self):
        months, days, seconds = parse_period("P2W")
        assert (months, days, seconds) == (0, 14, 0)

    def test_throws_format(self):
        with pytest.raises(ValueError):
            parse_period("PT1Y2M")

    def test_throws_zero_length(self):
        with pytest.raises(ValueError):
            parse_period("PT0S")


class TestTimestampsIntervals:
    # OSHDBTimestampsTest.testTimeIntervals: every named interval, with
    # day-of-month clamping (Jan 31 + P3M = Apr 30; + P1M = Feb 29)
    CASES = [
        ("2008-01-31T12:34:56", "2010-01-31T12:34:56", YEARLY,
         ["2008-01-31T12:34:56", "2009-01-31T12:34:56",
          "2010-01-31T12:34:56"]),
        ("2008-01-31T12:34:56", "2008-07-31T12:34:56", QUARTERLY,
         ["2008-01-31T12:34:56", "2008-04-30T12:34:56",
          "2008-07-31T12:34:56"]),
        ("2008-01-31T12:34:56", "2008-03-31T12:34:56", MONTHLY,
         ["2008-01-31T12:34:56", "2008-02-29T12:34:56",
          "2008-03-31T12:34:56"]),
        ("2008-01-31T12:34:56", "2008-02-14T12:34:56", WEEKLY,
         ["2008-01-31T12:34:56", "2008-02-07T12:34:56",
          "2008-02-14T12:34:56"]),
        ("2008-01-31T12:34:56", "2008-02-02T12:34:56", DAILY,
         ["2008-01-31T12:34:56", "2008-02-01T12:34:56",
          "2008-02-02T12:34:56"]),
        ("2008-01-31T12:34:56", "2008-01-31T15:00:00", HOURLY,
         ["2008-01-31T12:34:56", "2008-01-31T13:34:56",
          "2008-01-31T14:34:56"]),
    ]

    @pytest.mark.parametrize("start,end,interval,expected", CASES)
    def test_interval(self, start, end, interval, expected):
        assert timestamps(start, end, interval) == [_us(e) for e in expected]

    def test_all_named_intervals_covered(self):
        tested = {c[2] for c in self.CASES}
        assert tested == {YEARLY, QUARTERLY, MONTHLY, WEEKLY, DAILY, HOURLY}

    def test_invalid_timestamp(self):
        with pytest.raises(ValueError):
            parse_iso("test123")
