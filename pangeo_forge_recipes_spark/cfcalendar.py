"""CF non-standard calendar support without the cftime library.

The reference handles non-standard calendars (360_day, noleap, all_leap)
by decoding to cftime objects (``aggregation.py:193-197`` initializes
templates with ``cftime.num2date``). This engine follows SURVEY §1.2's
design instead: times in non-standard calendars stay as **int64 offsets
plus ``{units, calendar}`` encoding metadata** end-to-end — exact, Spark
/ Parquet / Zarr friendly, and loss-free (the reference round-trips
through object arrays to reach the same stored ints).

This module supplies the calendar arithmetic cftime would provide:

* :func:`date2num` — (year, month, day[, h, m, s]) tuples → offsets
* :func:`num2date_components` — offsets → vectorized component arrays
  (the analog of a decoded cftime array, but SQL-groupable)

The fixed-year calendars (360_day, noleap, all_leap) are pure modular
integer arithmetic; ``julian`` adds the 4-year leap cycle (every year
divisible by 4 is leap, no century exception) via 1461-day cycle
arithmetic; ``standard``/``gregorian`` use the true CF **mixed
Julian/Gregorian** calendar (Julian through 1582-10-04, Gregorian from
1582-10-15, the ten dropped days raise — cftime's udunits semantics);
``proleptic_gregorian`` is the pure Gregorian rule. All paths are
vectorized numpy; negative offsets / years before the epoch work via
floor division. In the array-IO fast path the ``standard`` family still
decodes through numpy datetime64 (:mod:`.ndset`) — exact for the
post-1582 dates datetime64 itself implies; datasets reaching pre-1582
use these component APIs with exact mixed arithmetic.
"""

from __future__ import annotations

from typing import Dict, Iterable, Tuple

import numpy as np

from .ndset import _NP_UNIT, _UNITS_RE

STANDARD_CALENDARS = frozenset({"proleptic_gregorian", "gregorian", "standard"})

_MONTH_DAYS = {
    "360_day": [30] * 12,
    "noleap": [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31],
    "365_day": [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31],
    "all_leap": [31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31],
    "366_day": [31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31],
}

_UNIT_SECONDS = {"ns": None, "us": None, "ms": None, "s": 1, "m": 60, "h": 3600, "D": 86400}


def is_standard_calendar(calendar: str) -> bool:
    return calendar in STANDARD_CALENDARS


def is_supported_calendar(calendar: str) -> bool:
    return (
        calendar in STANDARD_CALENDARS
        or calendar in _MONTH_DAYS
        or calendar == "julian"
    )


def _calendar_tables(calendar: str) -> Tuple[np.ndarray, int]:
    try:
        month_days = np.array(_MONTH_DAYS[calendar], dtype=np.int64)
    except KeyError:
        raise NotImplementedError(
            f"calendar {calendar!r} is not supported without cftime "
            f"(supported: standard family + julian + {sorted(_MONTH_DAYS)})"
        ) from None
    return month_days, int(month_days.sum())


def _parse_units(units: str) -> Tuple[int, Tuple[int, int, int, int, int, int]]:
    """→ (seconds per unit, epoch components). Sub-second units are
    rejected for non-standard calendars (nothing produces them)."""
    m = _UNITS_RE.match(units.strip())
    if not m:
        raise ValueError(f"Unparseable time units: {units!r}")
    np_unit = _NP_UNIT[m.group("unit")]
    unit_sec = _UNIT_SECONDS.get(np_unit)
    if unit_sec is None:
        raise NotImplementedError(
            f"sub-second units {units!r} are not supported for "
            "non-standard calendars"
        )
    epoch = m.group("epoch").strip().replace("T", " ")
    date, _, time = epoch.partition(" ")
    y, mo, d = (int(p) for p in date.split("-"))
    h = mi = s = 0
    if time:
        parts = time.split(":")
        h = int(parts[0])
        mi = int(parts[1]) if len(parts) > 1 else 0
        s = int(float(parts[2])) if len(parts) > 2 else 0
    return unit_sec, (y, mo, d, h, mi, s)


_CUM_NOLEAP = np.concatenate(
    [[0], np.cumsum(_MONTH_DAYS["noleap"])[:-1]]
)


def _greg_ordinal(
    year: np.ndarray, month: np.ndarray, day: np.ndarray
) -> np.ndarray:
    """Proleptic-Gregorian absolute day (day 0 = year 0, Jan 1)."""
    leap = ((year % 4 == 0) & (year % 100 != 0)) | (year % 400 == 0)
    return (
        365 * year
        + (year + 3) // 4
        - (year + 99) // 100
        + (year + 399) // 400
        + _CUM_NOLEAP[month - 1]
        + (leap & (month > 2)).astype(np.int64)
        + (day - 1)
    )


def _greg_inverse(day: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of :func:`_greg_ordinal` (Hinnant's public civil_from_days
    era algorithm, vectorized; 146097-day 400-year eras)."""
    z = np.asarray(day, dtype=np.int64) - 719528 + 719468  # days since 0000-03-01
    era = z // 146097
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    dom = doy - (153 * mp + 2) // 5 + 1
    month = np.where(mp < 10, mp + 3, mp - 9).astype(np.int64)
    return y + (month <= 2), month, dom


def _julian_ordinal(
    year: np.ndarray, month: np.ndarray, day: np.ndarray
) -> np.ndarray:
    leap = (year % 4) == 0
    return (
        365 * year
        + (year + 3) // 4
        + _CUM_NOLEAP[month - 1]
        + (leap & (month > 2)).astype(np.int64)
        + (day - 1)
    )


# mixed Julian/Gregorian cutover: 1582-10-04 (Julian) is followed by
# 1582-10-15 (Gregorian). The mixed timeline equals the Julian ordinal
# before the cutover and the Gregorian ordinal plus _MIXED_K after it.
_JULIAN_END = int(_julian_ordinal(np.array([1582]), np.array([10]), np.array([4]))[0])
_GREG_START = int(_greg_ordinal(np.array([1582]), np.array([10]), np.array([15]))[0])
_MIXED_K = _JULIAN_END + 1 - _GREG_START


def _julian_inverse(
    day: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of :func:`_julian_ordinal` via 1461-day cycles starting at
    a leap year: [366, 365, 365, 365]."""
    day = np.asarray(day, dtype=np.int64)
    cyc, dic = np.divmod(day, 1461)
    yic = np.where(dic < 366, 0, (dic - 366) // 365 + 1)
    doy = dic - np.where(yic == 0, 0, 366 + 365 * (yic - 1))
    year = 4 * cyc + yic
    leap = yic == 0
    cum_n = np.cumsum(_MONTH_DAYS["noleap"])
    cum_l = np.cumsum(_MONTH_DAYS["all_leap"])
    month = (
        np.where(
            leap,
            np.searchsorted(cum_l, doy, side="right"),
            np.searchsorted(cum_n, doy, side="right"),
        )
        + 1
    ).astype(np.int64)
    start_n = np.concatenate([[0], cum_n[:-1]])
    start_l = np.concatenate([[0], cum_l[:-1]])
    dom = doy - np.where(leap, start_l[month - 1], start_n[month - 1]) + 1
    return year, month, dom


def _ordinal(
    year: np.ndarray, month: np.ndarray, day: np.ndarray, calendar: str
) -> np.ndarray:
    """Absolute day number of (year, month, day) in the calendar (day 0 =
    year 0, Jan 1). Vectorized; months are 1-based; negative years work
    via floor division."""
    year = np.asarray(year, dtype=np.int64)
    month = np.asarray(month, dtype=np.int64)
    day = np.asarray(day, dtype=np.int64)
    if calendar == "proleptic_gregorian":
        return _greg_ordinal(year, month, day)
    if calendar in ("standard", "gregorian"):
        jord = _julian_ordinal(year, month, day)
        gord = _greg_ordinal(year, month, day) + _MIXED_K
        is_greg = gord >= _JULIAN_END + 1
        # dates in the dropped window decode as neither side: Julian says
        # >= cutover, Gregorian says < cutover
        dropped = (~is_greg) & (jord > _JULIAN_END)
        if np.any(dropped):
            raise ValueError(
                "dates 1582-10-05 .. 1582-10-14 do not exist in the mixed "
                "standard calendar"
            )
        return np.where(is_greg, gord, jord)
    if calendar == "julian":
        # julian leap rule: every year % 4 == 0 (year 0 included, no
        # century exception). Leap days fully before year y: ceil(y/4)
        # == floor((y+3)/4), valid for negative y with floor division.
        return _julian_ordinal(year, month, day)
    month_days, year_len = _calendar_tables(calendar)
    cum = np.concatenate([[0], np.cumsum(month_days)[:-1]])
    return year * year_len + cum[month - 1] + (day - 1)


def date2num(
    dates: Iterable[Tuple[int, ...]], units: str, calendar: str
) -> np.ndarray:
    """Encode (year, month, day[, hour, minute, second]) tuples as int64
    offsets in ``units`` of the fixed ``calendar`` (cftime.date2num
    analog). Offsets that are not whole units raise."""
    unit_sec, ep = _parse_units(units)
    rows = [tuple(d) + (0,) * (6 - len(d)) for d in dates]
    arr = np.array(rows, dtype=np.int64).reshape(-1, 6)
    day = _ordinal(arr[:, 0], arr[:, 1], arr[:, 2], calendar)
    secs = (
        day * 86400
        + arr[:, 3] * 3600
        + arr[:, 4] * 60
        + arr[:, 5]
        - (_ordinal([ep[0]], [ep[1]], [ep[2]], calendar)[0] * 86400
           + ep[3] * 3600 + ep[4] * 60 + ep[5])
    )
    if np.any(secs % unit_sec):
        raise ValueError(
            f"dates are not representable as whole {units.split()[0]}"
        )
    return secs // unit_sec


def num2date_components(
    values: np.ndarray, units: str, calendar: str
) -> Dict[str, np.ndarray]:
    """Decode int64 offsets into vectorized calendar components
    ``{year, month, day, hour, minute, second}`` (cftime.num2date analog,
    but arrays ready for SQL grouping instead of object scalars)."""
    unit_sec, ep = _parse_units(units)
    epoch_secs = (
        _ordinal([ep[0]], [ep[1]], [ep[2]], calendar)[0] * 86400
        + ep[3] * 3600 + ep[4] * 60 + ep[5]
    )
    total = np.asarray(values, dtype=np.int64) * unit_sec + epoch_secs
    day, rem = np.divmod(total, 86400)
    if calendar == "proleptic_gregorian":
        year, month, dom = _greg_inverse(day)
    elif calendar in ("standard", "gregorian"):
        in_julian = day <= _JULIAN_END
        jy, jm, jd = _julian_inverse(day)
        gy, gm, gd = _greg_inverse(day - _MIXED_K)
        year = np.where(in_julian, jy, gy)
        month = np.where(in_julian, jm, gm)
        dom = np.where(in_julian, jd, gd)
    elif calendar == "julian":
        year, month, dom = _julian_inverse(day)
    else:
        month_days, year_len = _calendar_tables(calendar)
        cum = np.cumsum(month_days)
        year, doy = np.divmod(day, year_len)
        month = np.searchsorted(cum, doy, side="right") + 1
        dom = doy - np.concatenate([[0], cum[:-1]])[month - 1] + 1
    hour, rem = np.divmod(rem, 3600)
    minute, second = np.divmod(rem, 60)
    return {
        "year": year,
        "month": month.astype(np.int64),
        "day": dom,
        "hour": hour,
        "minute": minute,
        "second": second,
    }
