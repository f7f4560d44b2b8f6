"""Non-standard CF calendars without cftime (reference parity:
``aggregation.py:183-201`` cftime template init and the cftime case in
``tests/test_aggregation.py:66-108``). SURVEY §1.2 design: times stay
int64 offsets + {units, calendar} encoding end-to-end."""

from __future__ import annotations

import os

import numpy as np
import pytest

from pangeo_forge_recipes_spark import pattern_from_file_sequence, store_to_zarr
from pangeo_forge_recipes_spark.aggregation import dataset_to_schema
from pangeo_forge_recipes_spark.cfcalendar import (
    date2num,
    is_standard_calendar,
    num2date_components,
)
from pangeo_forge_recipes_spark.dsio import (
    open_zarr_group,
    schema_to_zarr,
    write_npz,
    zarr_group_schema,
)
from pangeo_forge_recipes_spark.ndset import NDDataset, Variable, assert_equal


def test_date2num_roundtrip_360_day():
    units = "days since 1850-01-01"
    dates = [(1850, 1, 1), (1850, 2, 30), (1850, 12, 30), (1851, 1, 1), (1849, 12, 30)]
    nums = date2num(dates, units, "360_day")
    # 360_day: every month has 30 days
    np.testing.assert_array_equal(nums, [0, 59, 359, 360, -1])
    comp = num2date_components(nums, units, "360_day")
    got = list(zip(comp["year"], comp["month"], comp["day"]))
    assert got == [t[:3] for t in dates]


def test_date2num_roundtrip_noleap_and_all_leap():
    units = "days since 2000-01-01"
    # noleap: Feb has 28 days even in (gregorian-)leap years
    nums = date2num([(2000, 3, 1)], units, "noleap")
    np.testing.assert_array_equal(nums, [59])
    comp = num2date_components(np.array([59]), units, "noleap")
    assert (comp["year"][0], comp["month"][0], comp["day"][0]) == (2000, 3, 1)
    # all_leap: Feb always has 29 days
    nums = date2num([(2000, 3, 1)], units, "all_leap")
    np.testing.assert_array_equal(nums, [60])
    # sub-day units + time components
    units_h = "hours since 2000-01-01 06:00:00"
    nums = date2num([(2000, 1, 2, 18, 0, 0)], units_h, "noleap")
    np.testing.assert_array_equal(nums, [36])
    comp = num2date_components(nums, units_h, "noleap")
    assert comp["day"][0] == 2 and comp["hour"][0] == 18


def test_unsupported_calendar_raises():
    with pytest.raises(NotImplementedError, match="not supported"):
        date2num([(2000, 1, 1)], "days since 2000-01-01", "mixed")
    assert is_standard_calendar("proleptic_gregorian")
    assert not is_standard_calendar("360_day")
    assert not is_standard_calendar("julian")


def test_julian_calendar_known_offsets():
    """Julian leap rule: every year % 4 == 0, INCLUDING century years
    (1900 and 2100 have a Feb 29, unlike gregorian). Reference decodes
    julian via cftime (aggregation.py:193-197); offsets here are
    hand-computed from the leap rule."""
    units = "days since 2000-01-01"
    dates = [
        (2000, 1, 1),
        (2000, 2, 29),  # 2000 % 4 == 0 → leap
        (2000, 3, 1),
        (2001, 3, 1),
        (1900, 2, 29),  # julian century leap day (not in gregorian)
        (2100, 2, 29),
        (1996, 2, 29),
        (1999, 12, 31),
    ]
    nums = date2num(dates, units, "julian")
    np.testing.assert_array_equal(
        nums, [0, 59, 60, 425, -36466, 36584, -1402, -1]
    )
    comp = num2date_components(nums, units, "julian")
    got = list(zip(comp["year"], comp["month"], comp["day"]))
    assert got == [t[:3] for t in dates]


def test_julian_calendar_subday_units_and_negative_years():
    units_h = "hours since 2000-01-01 06:00:00"
    nums = date2num([(2000, 1, 2, 18, 0, 0)], units_h, "julian")
    np.testing.assert_array_equal(nums, [36])
    comp = num2date_components(nums, units_h, "julian")
    assert comp["day"][0] == 2 and comp["hour"][0] == 18
    # negative years: year 0 and year -4 are leap (0 % 4 == -4 % 4 == 0)
    units0 = "days since 0000-01-01"
    nums = date2num([(0, 3, 1), (-1, 12, 31), (-4, 2, 29)], units0, "julian")
    np.testing.assert_array_equal(nums, [60, -1, -1402])
    comp = num2date_components(nums, units0, "julian")
    got = list(zip(comp["year"], comp["month"], comp["day"]))
    assert got == [(0, 3, 1), (-1, 12, 31), (-4, 2, 29)]


def _make_360day_ds(nt: int, start_num: int = 0) -> NDDataset:
    """make_ds analog with a 360_day time coordinate (int64 + encoding)."""
    rng = np.random.RandomState(7)
    ny, nx = 4, 5
    return NDDataset(
        {
            "foo": Variable(("time", "lat", "lon"), rng.rand(nt, ny, nx)),
        },
        {
            "time": Variable(
                ("time",),
                np.arange(start_num, start_num + nt, dtype="int64"),
                encoding={"units": "days since 1850-01-01", "calendar": "360_day"},
            ),
            "lat": Variable(("lat",), np.arange(ny, dtype="float64")),
            "lon": Variable(("lon",), np.arange(nx, dtype="float64")),
        },
        {},
    )


def test_store_to_zarr_roundtrip_360_day(spark, tmp_path):
    """End-to-end distributed pipeline with a 360_day calendar: offsets and
    encoding survive the full store → open round-trip."""
    ds = _make_360day_ds(nt=6)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"f{i}.npz")
        write_npz(p, ds.isel(time=slice(2 * i, 2 * i + 2)))
        paths.append(p)
    pattern = pattern_from_file_sequence(
        paths, "time", nitems_per_file=2, file_type="npz"
    )
    result = store_to_zarr(
        spark, pattern, str(tmp_path), "cf.zarr", target_chunks={"time": 3}
    )
    rt = result.open()
    assert rt.coords["time"].data.dtype == np.int64
    np.testing.assert_array_equal(rt.coords["time"].data, ds.coords["time"].data)
    assert rt.coords["time"].encoding == {
        "units": "days since 1850-01-01",
        "calendar": "360_day",
    }
    assert_equal(rt, ds, check_attrs=False)
    # the stored zarr array advertises the CF metadata for other readers
    schema = zarr_group_schema(str(tmp_path / "cf.zarr"))
    assert schema["coords"]["time"]["dtype"] == "int64"
    assert schema["coords"]["time"]["encoding"]["calendar"] == "360_day"


def test_store_to_zarr_roundtrip_julian(spark, tmp_path):
    """End-to-end distributed pipeline with the julian calendar."""
    rng = np.random.RandomState(3)
    ds = NDDataset(
        {"foo": Variable(("time", "x"), rng.rand(4, 3))},
        {
            "time": Variable(
                ("time",),
                np.arange(4, dtype="int64"),
                encoding={"units": "days since 1900-02-27", "calendar": "julian"},
            ),
            "x": Variable(("x",), np.arange(3, dtype="float64")),
        },
        {},
    )
    paths = []
    for i in range(2):
        p = str(tmp_path / f"j{i}.npz")
        write_npz(p, ds.isel(time=slice(2 * i, 2 * i + 2)))
        paths.append(p)
    pattern = pattern_from_file_sequence(
        paths, "time", nitems_per_file=2, file_type="npz"
    )
    result = store_to_zarr(
        spark, pattern, str(tmp_path), "jul.zarr", target_chunks={"time": 2}
    )
    rt = result.open()
    assert_equal(rt, ds, check_attrs=False)
    assert rt.coords["time"].encoding["calendar"] == "julian"
    # the offsets span the julian century leap day 1900-02-29
    comp = num2date_components(
        rt.coords["time"].data, "days since 1900-02-27", "julian"
    )
    assert list(zip(comp["month"], comp["day"])) == [
        (2, 27),
        (2, 28),
        (2, 29),
        (3, 1),
    ]


def test_schema_template_preserves_cftime_units(tmp_path):
    """Reference ``test_schema_to_template_ds_cftime``: an object-dtype
    (cftime) schema with units+calendar encoding initializes an int64
    template store carrying the same metadata instead of raising."""
    ds = _make_360day_ds(nt=3)
    schema = dataset_to_schema(ds)
    # imported cftime schemas arrive as object dtype — same template path
    schema["coords"]["time"]["dtype"] = "object"
    store = str(tmp_path / "tpl.zarr")
    schema_to_zarr(schema, store, target_chunks={"time": 3})
    tpl = zarr_group_schema(store)
    assert tpl["coords"]["time"]["dtype"] == "int64"
    assert tpl["coords"]["time"]["encoding"] == {
        "units": "days since 1850-01-01",
        "calendar": "360_day",
    }


def test_append_along_360_day_time(spark, tmp_path):
    """Incremental append keeps extending the non-standard-calendar
    coordinate (offsets are plain ints — append math is exact)."""
    ds = _make_360day_ds(nt=4)
    paths = []
    for i in range(4):
        p = str(tmp_path / f"a{i}.npz")
        write_npz(p, ds.isel(time=slice(i, i + 1)))
        paths.append(p)
    first = pattern_from_file_sequence(paths[:2], "time", nitems_per_file=1, file_type="npz")
    store_to_zarr(spark, first, str(tmp_path), "ap.zarr",
                  target_chunks={"time": 2}, consolidate_coords=False)
    rest = pattern_from_file_sequence(paths[2:], "time", nitems_per_file=1, file_type="npz")
    result = store_to_zarr(spark, rest, str(tmp_path), "ap.zarr",
                           target_chunks={"time": 2}, append_dim="time",
                           consolidate_coords=False)
    rt = result.open()
    assert_equal(rt, ds, check_attrs=False)
    np.testing.assert_array_equal(rt.coords["time"].data, np.arange(4))


# ---------------------------------------------------------------------------
# mixed standard Gregorian/Julian + proleptic_gregorian component APIs
# ---------------------------------------------------------------------------


def test_mixed_standard_cutover():
    from pangeo_forge_recipes_spark.cfcalendar import date2num

    # 1582-10-04 (Julian) is immediately followed by 1582-10-15
    vals = date2num(
        [(1582, 10, 4), (1582, 10, 15)], "days since 1582-01-01", "standard"
    )
    assert vals[1] - vals[0] == 1
    # the dropped days do not exist
    import pytest as _pytest

    with _pytest.raises(ValueError, match="do not exist"):
        date2num([(1582, 10, 10)], "days since 1582-01-01", "standard")


def test_mixed_standard_julian_day_number_anchor():
    from pangeo_forge_recipes_spark.cfcalendar import date2num

    # public anchor: the astronomical Julian Day count has JDN 0 =
    # -4712-01-01 (Julian), JDN 2299160 = 1582-10-04 (Julian, the last
    # Julian day), JDN 2299161 = 1582-10-15 (Gregorian)
    vals = date2num(
        [(-4712, 1, 1), (1582, 10, 4), (1582, 10, 15)],
        "days since 1582-10-15",
        "standard",
    )
    assert vals[1] - vals[0] == 2299160
    assert vals[2] - vals[0] == 2299161


def test_mixed_standard_matches_datetime64_post_cutover():
    from pangeo_forge_recipes_spark.cfcalendar import date2num

    # modern dates: mixed == proleptic == datetime64 arithmetic
    import numpy as np

    got = date2num(
        [(2000, 1, 1), (2024, 3, 1, 12, 0, 0)],
        "hours since 2000-01-01",
        "standard",
    )
    want = (
        np.array(["2000-01-01", "2024-03-01T12:00"], dtype="datetime64[s]")
        - np.datetime64("2000-01-01", "s")
    ) // np.timedelta64(3600, "s")
    np.testing.assert_array_equal(got, want.astype("int64"))


def test_mixed_standard_roundtrip_across_cutover():
    import numpy as np

    from pangeo_forge_recipes_spark.cfcalendar import (
        date2num,
        num2date_components,
    )

    dates = [
        (-500, 2, 29),   # julian leap year
        (300, 2, 28),
        (1500, 2, 29),   # leap in julian, not in gregorian
        (1582, 10, 4),
        (1582, 10, 15),
        (1700, 2, 28),   # 1700 not leap in gregorian
        (1600, 2, 29),   # 1600 leap in both
        (2024, 2, 29),
    ]
    vals = date2num(dates, "days since 1-01-01", "standard")
    comp = num2date_components(vals, "days since 1-01-01", "standard")
    got = list(zip(comp["year"], comp["month"], comp["day"]))
    assert [tuple(int(x) for x in g) for g in got] == dates
    # consecutive offsets around the cutover decode to consecutive dates
    around = num2date_components(
        np.arange(vals[3], vals[3] + 3), "days since 1-01-01", "standard"
    )
    assert [tuple(int(x) for x in t) for t in zip(
        around["year"], around["month"], around["day"]
    )] == [(1582, 10, 4), (1582, 10, 15), (1582, 10, 16)]


def test_proleptic_gregorian_components_match_numpy():
    import numpy as np

    from pangeo_forge_recipes_spark.cfcalendar import (
        date2num,
        num2date_components,
    )

    rng = np.random.RandomState(3)
    offs = rng.randint(-800_000, 800_000, size=200)
    comp = num2date_components(offs, "days since 1970-01-01", "proleptic_gregorian")
    want = np.datetime64("1970-01-01", "D") + offs.astype("timedelta64[D]")
    ys = want.astype("datetime64[Y]").astype("int64") + 1970
    ms = want.astype("datetime64[M]").astype("int64") % 12 + 1
    ds = (want - want.astype("datetime64[M]")).astype("int64") + 1
    np.testing.assert_array_equal(comp["year"], ys)
    np.testing.assert_array_equal(comp["month"], ms)
    np.testing.assert_array_equal(comp["day"], ds)
    # and date2num inverts
    back = date2num(
        list(zip(ys, ms, ds)), "days since 1970-01-01", "proleptic_gregorian"
    )
    np.testing.assert_array_equal(back, offs)


def test_julian_gregorian_agreement_window():
    from pangeo_forge_recipes_spark.cfcalendar import date2num

    # the Julian and Gregorian calendars named the same days from
    # 200-03-01 through 300-02-28 — the mixed (Julian-side) and pure
    # proleptic ordinals of those dates coincide
    for d in [(200, 3, 1), (250, 7, 4), (300, 2, 28)]:
        a = date2num([d], "days since 2000-01-01", "standard")[0]
        b = date2num([d], "days since 2000-01-01", "proleptic_gregorian")[0]
        assert a == b, d
