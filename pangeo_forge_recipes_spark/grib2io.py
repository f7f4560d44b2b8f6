"""Pure-Python GRIB2 reader/scanner (and a minimal writer used to
generate test fixtures, since no GRIB library exists in this container).

Reference parity: ``openers.py:40-47`` routes FileType.grib through the
cfgrib engine and ``openers.py:191-199`` through kerchunk ``scan_grib``;
this module provides both capabilities natively for the common subset:

* edition 2, one field per message
* grid definition templates 3.0 (regular latitude/longitude), 3.10
  (Mercator), 3.20 (polar stereographic — the NCEP polar grids), 3.30
  (Lambert conformal conic — the HRRR/NAM projection; spherical earth,
  x/y grid coords in meters plus derived 2-D latitude/longitude) and
  3.40 (Gaussian latitude/longitude — the ECMWF/NCEP spectral grid,
  latitudes computed from Legendre-polynomial roots)
* product definition templates 4.0 (analysis/forecast at a point in
  time) and 4.8 (statistically processed over an interval — the
  accumulation/average encoding of precipitation-style fields; valid
  time = end of the interval, ``stepType`` attr carries the process)
* data representation templates 5.0 (simple packing), 5.2 (complex
  packing with group splitting), 5.3 (complex packing + first/second
  order spatial differencing — the encoding real NWP archives like HRRR
  use heavily), 5.4 (IEEE floating point — exact, no quantization),
  5.40 (JPEG2000 code stream — decoded by the engine's own
  :mod:`.jp2kio` T.800 codec; the ECMWF/NCEP "ccsds/jpeg" packing) and
  5.41 (PNG code stream, decoded by the engine's own :mod:`.pngio`)
* bitmaps (section 6 indicator 0): missing grid points decode to NaN,
  and the writer emits a bitmap automatically for non-finite values
* message-filter pushdown (the reference's ``filter_by_keys``, applied
  while scanning headers — reader-level predicate pushdown per SURVEY
  §2's GRIB-filter row; matching messages never have their data bits
  unpacked)

Messages for the same (shortName, typeOfLevel, level) are stacked along
``time`` (valid time = reference time + forecast offset), producing
cfgrib-style datasets with dims ``(time, latitude, longitude)``.

The writer (`write_grib2`) emits one message per variable per time step
with exact simple packing (it picks a binary scale so values round-trip
bit-exactly, or raises), used by the tests to exercise the scanner.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from .ndset import NDDataset, Variable

# (discipline, parameterCategory, parameterNumber) -> cfgrib-style shortName
_SHORTNAMES = {
    (0, 0, 0): "t",
    (0, 1, 1): "r",
    (0, 2, 2): "u",
    (0, 2, 3): "v",
    (0, 3, 0): "pres",
    (0, 3, 1): "prmsl",
    (2, 0, 0): "lsm",
}
_PARAM_FOR_NAME = {v: k for k, v in _SHORTNAMES.items()}

_LEVEL_TYPES = {1: "surface", 100: "isobaricInhPa", 103: "heightAboveGround"}
_LEVEL_CODES = {v: k for k, v in _LEVEL_TYPES.items()}


def _sm_decode(v: int, nbytes: int) -> int:
    """GRIB sign-magnitude integer (MSB = sign bit)."""
    sign = 1 << (8 * nbytes - 1)
    return -(v & ~sign) if v & sign else v


def _sm_encode(v: int, nbytes: int) -> int:
    return (abs(v) | (1 << (8 * nbytes - 1))) if v < 0 else v


def _unpack_bits(buf: bytes, n: int, nbits: int) -> np.ndarray:
    """Big-endian bitstream → n unsigned ints of nbits each (vectorized)."""
    if nbits == 0:
        return np.zeros(n, dtype=np.int64)
    bits = np.unpackbits(np.frombuffer(buf, np.uint8))[: n * nbits]
    weights = (np.int64(1) << np.arange(nbits - 1, -1, -1, dtype=np.int64))
    return bits.reshape(n, nbits).astype(np.int64) @ weights


def _pack_bits(values: np.ndarray, nbits: int) -> bytes:
    if nbits == 0:
        return b""
    n = len(values)
    bits = np.unpackbits(
        values.astype(">u4").view(np.uint8).reshape(n, 4), axis=1
    )[:, 32 - nbits :]
    stream = bits.ravel()
    pad = (-len(stream)) % 8
    if pad:
        stream = np.concatenate([stream, np.zeros(pad, np.uint8)])
    return np.packbits(stream).tobytes()


# ---------------------------------------------------------------------------
# message scanning
# ---------------------------------------------------------------------------


def _be(buf: bytes, off: int, n: int) -> int:
    return int.from_bytes(buf[off : off + n], "big")


def scan_grib2_messages(path: str) -> List[dict]:
    """Walk a GRIB2 file's messages, parsing section headers only (data
    bits are located via seek, never read — section 7's payload is
    replaced by a placeholder in the parsed view). Each entry describes
    one field. ``http(s)://`` paths scan in place over block-cached
    Range GETs: the walk transfers O(headers + bitmaps), not the file —
    the NOMADS/HRRR kerchunk-from-remote-GRIB pattern."""
    out: List[dict] = []
    from .storage import is_remote_url, open_range_file

    if is_remote_url(str(path)):
        f = open_range_file(path)
        size = f.size
    else:
        f = open(path, "rb")
        size = os.path.getsize(path)
    with f:
        pos = 0
        while pos < size:
            head = f.read(16)
            if len(head) < 16:
                break
            if head[0:4] != b"GRIB":
                raise ValueError(f"{path}: bad GRIB indicator at offset {pos}")
            if head[7] != 2:
                raise NotImplementedError(
                    f"{path}: GRIB edition {head[7]} unsupported (only 2)"
                )
            discipline = head[6]
            total = _be(head, 8, 8)
            # assemble the header view section by section; section 7's
            # payload is zero-filled (same offsets, nothing transferred:
            # _parse_message records only its position and length)
            parts = [head]
            p = 16
            while p < total - 4:
                hdr5 = f.read(5)
                if len(hdr5) < 5:
                    break
                sec_len = _be(hdr5, 0, 4)
                sec_num = hdr5[4]
                if sec_len < 5:
                    raise ValueError(
                        f"{path}: corrupt section length {sec_len} at "
                        f"message offset {pos}+{p}"
                    )
                if sec_num == 7 and sec_len > 5:
                    parts.append(hdr5 + b"\x00" * (sec_len - 5))
                    f.seek(pos + p + sec_len)
                else:
                    parts.append(hdr5 + f.read(sec_len - 5))
                p += sec_len
            body = b"".join(parts)
            msg = _parse_message(body, discipline, pos, total, path)
            out.append(msg)
            pos += total
            f.seek(pos)
    return out


def _parse_message(body: bytes, discipline: int, offset: int, total: int, path: str) -> dict:
    msg: dict = {"offset": offset, "length": total, "discipline": discipline}
    p = 16
    while p < total - 4:
        sec_len = _be(body, p, 4)
        sec_num = body[p + 4]
        sec = body[p : p + sec_len]
        if sec_num == 1:
            year = _be(sec, 12, 2)
            msg["ref_time"] = np.datetime64(
                f"{year:04d}-{sec[14]:02d}-{sec[15]:02d}"
                f"T{sec[16]:02d}:{sec[17]:02d}:{sec[18]:02d}",
                "ns",
            )
        elif sec_num == 3:
            tmpl = _be(sec, 12, 2)
            if tmpl not in (0, 1, 10, 20, 30, 40):
                raise NotImplementedError(
                    f"{path}: grid definition template {tmpl} unsupported "
                    "(supported: 3.0 regular lat/lon, 3.1 rotated lat/lon, "
                    "3.10 Mercator, 3.20 polar stereographic, 3.30 Lambert "
                    "conformal, 3.40 Gaussian lat/lon)"
                )
            msg["grid_template"] = tmpl
            msg["ni"] = _be(sec, 30, 4)
            msg["nj"] = _be(sec, 34, 4)

            def _earth_radius() -> float:
                shape = sec[14]
                if shape == 6:
                    return 6371229.0
                if shape == 0:
                    return 6367470.0
                if shape == 1:
                    return _be(sec, 16, 4) / 10.0 ** sec[15]
                raise NotImplementedError(
                    f"{path}: shape of earth {shape} (spherical only)"
                )

            if tmpl in (0, 1, 40):
                msg["la1"] = _sm_decode(_be(sec, 46, 4), 4) / 1e6
                msg["lo1"] = _be(sec, 50, 4) / 1e6
                msg["la2"] = _sm_decode(_be(sec, 55, 4), 4) / 1e6
                msg["lo2"] = _be(sec, 59, 4) / 1e6
                if tmpl == 40:
                    # octets 68-71: N = parallels between pole and equator
                    msg["gauss_n"] = _be(sec, 67, 4)
                if tmpl == 1:
                    # rotated lat/lon (COSMO/HARMONIE regional grids):
                    # octets 73-84 = southern-pole lat/lon + rotation
                    # angle of the projection, all 10^-6 degrees; la/lo
                    # above are in the ROTATED frame
                    msg["sp_lat"] = _sm_decode(_be(sec, 72, 4), 4) / 1e6
                    msg["sp_lon"] = _be(sec, 76, 4) / 1e6
                    msg["rot_angle"] = _sm_decode(_be(sec, 80, 4), 4) / 1e6
                scan_mode = sec[71]
                if scan_mode & 0xF0:
                    raise NotImplementedError(
                        f"{path}: scanning mode {scan_mode:#x} unsupported"
                    )
            elif tmpl == 10:  # Mercator
                msg["earth_radius"] = _earth_radius()
                msg["la1"] = _sm_decode(_be(sec, 38, 4), 4) / 1e6
                msg["lo1"] = _be(sec, 42, 4) / 1e6
                msg["lad"] = _sm_decode(_be(sec, 47, 4), 4) / 1e6
                msg["la2"] = _sm_decode(_be(sec, 51, 4), 4) / 1e6
                msg["lo2"] = _be(sec, 55, 4) / 1e6
                scan_mode = sec[59]
                if scan_mode not in (0x40, 0x00):
                    raise NotImplementedError(
                        f"{path}: Mercator scanning mode {scan_mode:#x} "
                        "(supported: +i/+j 0x40 and +i/-j 0x00)"
                    )
                msg["j_positive"] = bool(scan_mode & 0x40)
                msg["dx"] = _be(sec, 64, 4) / 1e3  # mm → m
                msg["dy"] = _be(sec, 68, 4) / 1e3
            elif tmpl == 20:  # polar stereographic
                msg["earth_radius"] = _earth_radius()
                msg["la1"] = _sm_decode(_be(sec, 38, 4), 4) / 1e6
                msg["lo1"] = _be(sec, 42, 4) / 1e6
                msg["lad"] = _sm_decode(_be(sec, 47, 4), 4) / 1e6
                msg["lov"] = _be(sec, 51, 4) / 1e6
                msg["dx"] = _be(sec, 55, 4) / 1e3
                msg["dy"] = _be(sec, 59, 4) / 1e3
                msg["south_pole_proj"] = bool(sec[63] & 0x80)
                scan_mode = sec[64]
                if scan_mode not in (0x40, 0x00):
                    raise NotImplementedError(
                        f"{path}: polar-stereo scanning mode {scan_mode:#x} "
                        "(supported: +x/+y 0x40 and +x/-y 0x00)"
                    )
                msg["j_positive"] = bool(scan_mode & 0x40)
            else:  # 3.30 Lambert conformal conic
                msg["earth_radius"] = _earth_radius()
                msg["la1"] = _sm_decode(_be(sec, 38, 4), 4) / 1e6
                msg["lo1"] = _be(sec, 42, 4) / 1e6
                msg["lad"] = _sm_decode(_be(sec, 47, 4), 4) / 1e6
                msg["lov"] = _be(sec, 51, 4) / 1e6
                msg["dx"] = _be(sec, 55, 4) / 1e3  # mm → m
                msg["dy"] = _be(sec, 59, 4) / 1e3
                scan_mode = sec[64]
                if scan_mode not in (0x40, 0x00):
                    raise NotImplementedError(
                        f"{path}: Lambert scanning mode {scan_mode:#x} "
                        "(supported: +x/+y 0x40 and +x/-y 0x00)"
                    )
                msg["j_positive"] = bool(scan_mode & 0x40)
                msg["latin1"] = _sm_decode(_be(sec, 65, 4), 4) / 1e6
                msg["latin2"] = _sm_decode(_be(sec, 69, 4), 4) / 1e6
        elif sec_num == 4:
            tmpl = _be(sec, 7, 2)
            if tmpl not in (0, 1, 2, 5, 8, 9, 11):
                raise NotImplementedError(
                    f"{path}: product definition template {tmpl} unsupported "
                    "(supported: 4.0 instantaneous, 4.1 ensemble member, "
                    "4.2 derived ensemble, 4.5/4.9 probability forecasts, "
                    "4.8 statistical interval, 4.11 ensemble + interval)"
                )
            cat, num = sec[9], sec[10]
            msg["parameterCategory"] = cat
            msg["parameterNumber"] = num
            msg["shortName"] = _SHORTNAMES.get(
                (discipline, cat, num), f"p{discipline}_{cat}_{num}"
            )
            unit = sec[17]
            ftime = _be(sec, 18, 4)
            hours = {0: 1 / 60, 1: 1.0, 2: 24.0, 10: 3.0, 11: 6.0, 12: 12.0}.get(unit)
            if hours is None:
                raise NotImplementedError(f"{path}: forecast time unit {unit}")
            msg["forecast_hours"] = ftime * hours
            lev_type = sec[22]
            msg["typeOfLevel"] = _LEVEL_TYPES.get(lev_type, f"level_{lev_type}")
            scale = sec[23]
            value = _be(sec, 24, 4)
            if value == 0xFFFFFFFF:
                value = 0
            msg["level"] = (
                value / (10 ** _sm_decode(scale, 1)) if scale not in (0, 0xFF)
                else float(value)
            )
            if tmpl in (1, 11):
                # ensemble: octet 35 = type of ensemble forecast, 36 =
                # perturbation (member) number, 37 = ensemble size
                msg["number"] = sec[35]
                msg["n_ens"] = sec[36]
            if tmpl == 2:
                # derived ensemble product: octet 35 = derived type
                # (0 unweighted mean, 2/4 spread/stddev families),
                # 36 = ensemble size
                code = sec[34]
                msg["derived_type"] = {
                    0: "mean", 1: "wmean", 2: "spread", 3: "spread_norm",
                    4: "spread",
                }.get(code, f"derived_{code}")
                msg["n_ens"] = sec[35]
            if tmpl in (5, 9):
                # probability forecast: octets 35/36 = forecast/total
                # number, 37 = probability type (0 below lower, 1 above
                # lower, 2 between, 3 above upper, 4 below upper),
                # 38-42 lower (scale + scaled value), 43-47 upper
                ptype = sec[36]

                def _thresh(scale_off: int) -> Optional[float]:
                    scale, val = sec[scale_off], _be(sec, scale_off + 1, 4)
                    if val == 0xFFFFFFFF:
                        return None
                    return _sm_decode(val, 4) / 10 ** _sm_decode(scale, 1)

                lower, upper = _thresh(37), _thresh(42)
                msg["probability_type"] = ptype
                if lower is not None:
                    msg["prob_lower"] = lower
                if upper is not None:
                    msg["prob_upper"] = upper
                # distinct variable per threshold definition, cfgrib-style
                lim = (
                    f"gt{lower:g}" if ptype in (1, 3) and lower is not None
                    else f"lt{upper if upper is not None else lower:g}"
                    if ptype in (0, 4)
                    else f"{lower:g}-{upper:g}"
                    if lower is not None and upper is not None
                    else "p"
                )
                msg["derived_type"] = f"prob_{lim}"
            if tmpl in (8, 9, 11):
                # statistical processing over a time interval (octets
                # shifted +3 for 4.11's ensemble block, +13 for 4.9's
                # probability block): the interval END (= the valid time
                # for accumulations) + the process code
                off = {8: 0, 9: 13, 11: 3}[tmpl]
                year = _be(sec, 34 + off, 2)
                msg["interval_end"] = np.datetime64(
                    f"{year:04d}-{sec[36 + off]:02d}-{sec[37 + off]:02d}"
                    f"T{sec[38 + off]:02d}:{sec[39 + off]:02d}"
                    f":{sec[40 + off]:02d}",
                    "ns",
                )
                stat = sec[46 + off]
                msg["stepType"] = {
                    0: "avg", 1: "accum", 2: "max", 3: "min",
                }.get(stat, f"stat_{stat}")
        elif sec_num == 5:
            tmpl = _be(sec, 9, 2)
            if tmpl not in (0, 2, 3, 4, 40, 41):
                raise NotImplementedError(
                    f"{path}: data representation template {tmpl} unsupported "
                    "(supported: 5.0 simple, 5.2 complex, 5.3 complex + "
                    "spatial differencing, 5.4 IEEE float, 5.40 JPEG2000, "
                    "5.41 PNG)"
                )
            msg["drs_template"] = tmpl
            msg["n_values"] = _be(sec, 5, 4)
            if tmpl == 4:
                # IEEE floating point: octet 12 = precision code
                msg["ieee_precision"] = sec[11]
                if sec[11] not in (1, 2):
                    raise NotImplementedError(
                        f"{path}: IEEE packing precision code {sec[11]} "
                        "(1 = 32-bit and 2 = 64-bit are supported)"
                    )
                p += sec_len
                continue
            msg["R"] = float(
                np.frombuffer(sec[11:15], dtype=">f4")[0]
            )
            msg["E"] = _sm_decode(_be(sec, 15, 2), 2)
            msg["D"] = _sm_decode(_be(sec, 17, 2), 2)
            msg["nbits"] = sec[19]
            if tmpl == 40:
                # octet 22: compression type (0 = lossless); octet 23:
                # target compression ratio M:1 (255 = missing; the spec
                # expects a real ratio when octet 22 signals lossy)
                msg["j2k_lossless"] = sec[21] == 0
                msg["j2k_target_ratio"] = sec[22]
            if tmpl in (2, 3):
                if sec[21] != 1:
                    raise NotImplementedError(
                        f"{path}: group splitting method {sec[21]} "
                        "(only 1, general group splitting)"
                    )
                if sec[22] != 0:
                    raise NotImplementedError(
                        f"{path}: missing-value management {sec[22]} "
                        "(only 0, no embedded missing values)"
                    )
                msg["NG"] = _be(sec, 31, 4)
                msg["group_width_ref"] = sec[35]
                msg["group_width_bits"] = sec[36]
                msg["group_len_ref"] = _be(sec, 37, 4)
                msg["group_len_inc"] = sec[41]
                msg["last_group_len"] = _be(sec, 42, 4)
                msg["group_len_bits"] = sec[46]
            if tmpl == 3:
                msg["spatial_order"] = sec[47]
                msg["extra_octets"] = sec[48]
                if msg["spatial_order"] not in (1, 2):
                    raise NotImplementedError(
                        f"{path}: spatial differencing order "
                        f"{msg['spatial_order']} (only 1 or 2)"
                    )
        elif sec_num == 6:
            if sec[5] == 0:
                # bitmap applies: one bit per grid point, 1 = data present;
                # section 7 stores only the present points' values
                msg["bitmap"] = sec[6:]
            elif sec[5] != 255:
                raise NotImplementedError(
                    f"{path}: bitmap indicator {sec[5]} unsupported "
                    "(0 = bitmap present and 255 = none are handled; "
                    "predefined/reused bitmaps are not)"
                )
        elif sec_num == 7:
            msg["data_offset"] = offset + p + 5
            msg["data_nbytes"] = sec_len - 5
        p += sec_len
    if "interval_end" in msg:
        msg["valid_time"] = msg["interval_end"]
    else:
        msg["valid_time"] = msg["ref_time"] + np.timedelta64(
            int(msg.get("forecast_hours", 0) * 3600), "s"
        )
    return msg


_FILTER_KEYS = {
    "shortName", "typeOfLevel", "level", "discipline",
    "parameterCategory", "parameterNumber", "stepType", "number",
}


def _match(msg: dict, filter_by_keys: Optional[dict]) -> bool:
    if not filter_by_keys:
        return True
    for k, v in filter_by_keys.items():
        if k not in _FILTER_KEYS:
            raise ValueError(
                f"unsupported filter key {k!r}; supported: {sorted(_FILTER_KEYS)}"
            )
        if msg.get(k) != v:
            return False
    return True


def _decode_complex(msg: dict, packed: bytes) -> np.ndarray:
    """Decode data section templates 7.2 / 7.3 (complex packing with
    group splitting, optional spatial differencing). Fully vectorized:
    the three group-descriptor arrays unpack in one shot each, and the
    ragged per-group value stream unpacks in one gather per distinct
    group width (≤ 32 iterations), never per group."""
    n = msg["n_values"]
    ng = msg["NG"]
    pos = 0
    ivals: List[int] = []
    gmin = 0
    if msg["drs_template"] == 3:
        eo = msg["extra_octets"]
        order = msg["spatial_order"]
        for _ in range(order + 1):
            ivals.append(_sm_decode(_be(packed, pos, eo), eo))
            pos += eo
        gmin = ivals.pop()
    bits = np.unpackbits(np.frombuffer(packed[pos:], np.uint8))
    bp = 0

    def take(count: int, width: int) -> np.ndarray:
        """One octet-aligned descriptor array (spec: each of the group
        reference / width / length arrays starts on a byte boundary)."""
        nonlocal bp
        if width == 0:
            out = np.zeros(count, dtype=np.int64)
        else:
            seg = bits[bp : bp + count * width].reshape(count, width)
            w = np.int64(1) << np.arange(width - 1, -1, -1, dtype=np.int64)
            out = seg.astype(np.int64) @ w
            bp += count * width
        bp = (bp + 7) & ~7
        return out

    refs = take(ng, msg["nbits"])
    widths = msg["group_width_ref"] + take(ng, msg["group_width_bits"])
    lengths = (
        msg["group_len_ref"]
        + take(ng, msg["group_len_bits"]) * msg["group_len_inc"]
    )
    if ng:
        lengths[-1] = msg["last_group_len"]
    if int(lengths.sum()) != n:
        raise ValueError(
            f"complex packing: group lengths sum to {int(lengths.sum())}, "
            f"expected {n} values"
        )
    # expand groups: value i in group g starts at
    # group_bit_start(g) + (i - first_index(g)) * width(g)
    rep_w = np.repeat(widths, lengths)
    rep_ref = np.repeat(refs, lengths)
    group_bit_start = np.concatenate(
        [[0], np.cumsum(widths * lengths)[:-1]]
    ) + bp
    first_idx = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    val_start = (
        np.repeat(group_bit_start - widths * first_idx, lengths)
        + np.arange(n, dtype=np.int64) * rep_w
    )
    x = np.zeros(n, dtype=np.int64)
    for w in np.unique(rep_w):
        if w == 0:
            continue
        m = rep_w == w
        idx = val_start[m][:, None] + np.arange(w)[None, :]
        wt = np.int64(1) << np.arange(w - 1, -1, -1, dtype=np.int64)
        x[m] = bits[idx].astype(np.int64) @ wt
    x = x + rep_ref
    if msg["drs_template"] == 3:
        # the unpacked ints are spatial differences (plus the overall
        # minimum); reconstruct by iterated prefix sums (g2lib recurrence
        # f(j) = d(j) + gmin + 2 f(j-1) - f(j-2) for order 2)
        if msg["spatial_order"] == 1:
            x[0] = ivals[0]
            x[1:] = x[1:] + gmin
            x = np.cumsum(x)
        else:
            d = x[2:] + gmin
            u = np.cumsum(np.concatenate([[ivals[1] - ivals[0]], d]))
            x = np.cumsum(np.concatenate([[ivals[0]], u]))
    return (msg["R"] + x * 2.0 ** msg["E"]) / 10.0 ** msg["D"]


def _apply_bitmap(msg: dict, values: np.ndarray) -> np.ndarray:
    """Scatter the packed (present-only) values into the full grid; bitmap
    gaps become NaN (cfgrib's missing-value convention)."""
    bitmap = msg.get("bitmap")
    if bitmap is None:
        return values
    npoints = msg["ni"] * msg["nj"]
    mask = np.unpackbits(np.frombuffer(bitmap, np.uint8))[:npoints].astype(bool)
    if int(mask.sum()) != len(values):
        raise ValueError(
            f"GRIB2 bitmap marks {int(mask.sum())} present points but the "
            f"data section holds {len(values)} values"
        )
    full = np.full(npoints, np.nan)
    full[mask] = values
    return full


def _decode_png_ints(msg: dict, packed: bytes) -> np.ndarray:
    """Decode data template 7.41: the scaled ints are a PNG code stream
    (grayscale for depth ≤ 16; RGB/RGBA carry 24/32-bit ints across
    channels, most significant first)."""
    from .pngio import decode_png

    img = decode_png(bytes(packed))
    if img.ndim == 3:
        c = img.shape[2]
        x = np.zeros(img.shape[:2], dtype=np.int64)
        for ch in range(c):
            x = (x << 8) | img[:, :, ch].astype(np.int64)
    else:
        x = img.astype(np.int64)
    x = x.ravel()
    if x.size != msg["n_values"]:
        raise ValueError(
            f"PNG-packed field holds {x.size} values, section 5 says "
            f"{msg['n_values']}"
        )
    return x


def _decode_values(msg: dict, packed: bytes) -> np.ndarray:
    tmpl = msg.get("drs_template", 0)
    if tmpl in (2, 3):
        return _apply_bitmap(msg, _decode_complex(msg, packed))
    if tmpl == 4:
        dt = ">f4" if msg["ieee_precision"] == 1 else ">f8"
        vals = np.frombuffer(packed, dtype=dt, count=msg["n_values"]).astype("float64")
        return _apply_bitmap(msg, vals)
    if tmpl == 41:
        x = _decode_png_ints(msg, packed)
    elif tmpl == 40:
        from .jp2kio import decode_j2k

        if msg["n_values"] == 0:
            x = np.zeros(0, dtype=np.int64)
        else:
            x = decode_j2k(bytes(packed))[0].ravel()
        if x.size != msg["n_values"]:
            raise ValueError(
                f"JPEG2000-packed field holds {x.size} values, section 5 "
                f"says {msg['n_values']}"
            )
    else:
        x = _unpack_bits(packed, msg["n_values"], msg["nbits"])
    return _apply_bitmap(msg, (msg["R"] + x * 2.0 ** msg["E"]) / 10.0 ** msg["D"])


def decode_grib2_message(buf: bytes) -> np.ndarray:
    """Decode one complete GRIB2 message (as raw bytes) to its 2D field —
    the engine's ``grib2-msg`` virtual-store codec (whole messages are the
    only self-contained byte ranges: packing parameters live in section 5,
    so a chunk must carry its own header)."""
    if buf[0:4] != b"GRIB":
        raise ValueError("grib2-msg codec: buffer is not a GRIB2 message")
    total = _be(buf, 8, 8)
    msg = _parse_message(buf[:total], buf[6], 0, total, "<chunk>")
    packed = buf[msg["data_offset"] : msg["data_offset"] + msg["data_nbytes"]]
    return _decode_values(msg, packed).reshape(msg["nj"], msg["ni"])


# ---------------------------------------------------------------------------
# reading
# ---------------------------------------------------------------------------


def _grid_coords(msg: dict) -> Tuple[np.ndarray, np.ndarray]:
    lats = np.linspace(msg["la1"], msg["la2"], msg["nj"])
    lons = np.linspace(msg["lo1"], msg["lo2"], msg["ni"])
    return lats, lons


# -- rotated lat/lon (grid template 3.1; the COSMO/HARMONIE regional
#    convention — public spherical rotation, same form as eccodes'
#    unrotation: tilt by (sp_lat + 90) about the meridian of the southern
#    pole, longitudes measured from sp_lon) ----------------------------------


def _rotated_grid(msg: dict):
    """1-D rotated lat/lon coords + 2-D true lat/lon of a 3.1 grid.
    Verified against the public COSMO-EU pole: southern pole (-40, 10)
    puts the rotated north pole at (40, -170). The optional angle of
    rotation spins the rotated frame about its own pole before the
    tilt (zero in all known products)."""
    lo1, lo2 = msg["lo1"], msg["lo2"]
    if lo2 < lo1:  # stored 0..360; grid crosses the wrap
        lo2 += 360.0
    rlons = np.linspace(lo1, lo2, msg["ni"])
    if lo1 >= 180.0:  # rotated-frame convention is ±180 (cfgrib parity)
        rlons = rlons - 360.0
    rlats = np.linspace(msg["la1"], msg["la2"], msg["nj"])
    th = np.radians(msg["sp_lat"] + 90.0)
    sy, cy = np.sin(th), np.cos(th)
    phr = np.radians(rlats)[:, None]
    lmr = np.radians(rlons + msg.get("rot_angle", 0.0))[None, :]
    sxrot = np.cos(phr) * np.sin(lmr)
    cxrot = np.cos(phr) * np.cos(lmr)
    syrot = np.sin(phr) * np.ones_like(lmr)
    lat = np.degrees(np.arcsin(np.clip(cy * syrot + sy * cxrot, -1.0, 1.0)))
    lon = np.degrees(np.arctan2(sxrot, cy * cxrot - sy * syrot)) + msg["sp_lon"]
    lon = (lon + 180.0) % 360.0 - 180.0
    return rlats, rlons, lat, lon


# -- Lambert conformal conic (grid template 3.30; public map projection
#    formulas, spherical earth) ----------------------------------------------


def _lambert_params(msg: dict) -> Tuple[float, float, float, float]:
    R = msg["earth_radius"]
    p1, p2 = np.radians(msg["latin1"]), np.radians(msg["latin2"])
    if abs(p1 - p2) < 1e-12:
        n = float(np.sin(p1))
    else:
        n = float(
            np.log(np.cos(p1) / np.cos(p2))
            / np.log(np.tan(np.pi / 4 + p2 / 2) / np.tan(np.pi / 4 + p1 / 2))
        )
    F = float(np.cos(p1) * np.tan(np.pi / 4 + p1 / 2) ** n / n)
    rho0 = R * F / np.tan(np.pi / 4 + np.radians(msg["lad"]) / 2) ** n
    return R, n, F, float(rho0)


def _lambert_forward(msg: dict, lat_deg, lon_deg):
    """(lat, lon) degrees → projection-plane (x, y) meters."""
    R, n, F, rho0 = _lambert_params(msg)
    lam0 = np.radians(msg["lov"])
    phi = np.radians(np.asarray(lat_deg, dtype="float64"))
    dlam = (np.radians(np.asarray(lon_deg, dtype="float64")) - lam0 + np.pi) % (
        2 * np.pi
    ) - np.pi
    rho = R * F / np.tan(np.pi / 4 + phi / 2) ** n
    return rho * np.sin(n * dlam), rho0 - rho * np.cos(n * dlam)


def _lambert_inverse(msg: dict, x, y):
    """Projection-plane (x, y) meters → (lat, lon) degrees (lon in
    [0, 360), GRIB convention)."""
    R, n, F, rho0 = _lambert_params(msg)
    lam0 = np.radians(msg["lov"])
    x = np.asarray(x, dtype="float64")
    y = np.asarray(y, dtype="float64")
    sgn = 1.0 if n >= 0 else -1.0
    rho = sgn * np.hypot(x, rho0 - y)
    theta = np.arctan2(sgn * x, sgn * (rho0 - y))
    phi = 2 * np.arctan((R * F / rho) ** (1.0 / n)) - np.pi / 2
    lon = (np.degrees(lam0 + theta / n)) % 360.0
    return np.degrees(phi), lon


def _lambert_grid(msg: dict):
    """1-D x/y coords (meters) + 2-D lat/lon of a 3.30 grid."""
    x1, y1 = _lambert_forward(msg, msg["la1"], msg["lo1"])
    x = float(x1) + np.arange(msg["ni"], dtype="float64") * msg["dx"]
    step = msg["dy"] if msg.get("j_positive", True) else -msg["dy"]
    y = float(y1) + np.arange(msg["nj"], dtype="float64") * step
    xx, yy = np.meshgrid(x, y)
    lat, lon = _lambert_inverse(msg, xx, yy)
    return x, y, lat, lon


# -- polar stereographic (grid template 3.20; public spherical formulas,
#    NCEP w3fb05/w3fb06 convention: scale true at LaD, y axis along
#    LoV+180 for the north-pole case) ----------------------------------------


def _pstereo_params(msg: dict) -> Tuple[float, float]:
    s = -1.0 if msg.get("south_pole_proj") else 1.0
    de = (1.0 + np.sin(np.radians(abs(msg["lad"])))) * msg["earth_radius"]
    return s, float(de)


def _pstereo_forward(msg: dict, lat_deg, lon_deg):
    """(lat, lon) degrees → projection-plane (x, y) meters from the pole."""
    s, de = _pstereo_params(msg)
    lam0 = np.radians(msg["lov"])
    phi = np.radians(np.asarray(lat_deg, dtype="float64"))
    dlam = np.radians(np.asarray(lon_deg, dtype="float64")) - lam0
    dr = de * np.cos(phi) / (1.0 + s * np.sin(phi))
    return dr * np.sin(dlam), -s * dr * np.cos(dlam)


def _pstereo_inverse(msg: dict, x, y):
    s, de = _pstereo_params(msg)
    lam0 = np.radians(msg["lov"])
    x = np.asarray(x, dtype="float64")
    y = np.asarray(y, dtype="float64")
    r2 = x * x + y * y
    lat = s * np.degrees(np.arcsin((de * de - r2) / (de * de + r2)))
    lon = np.degrees(lam0 + np.arctan2(x, -s * y)) % 360.0
    return lat, lon


def _pstereo_grid(msg: dict):
    """1-D x/y coords (meters) + 2-D lat/lon of a 3.20 grid."""
    x1, y1 = _pstereo_forward(msg, msg["la1"], msg["lo1"])
    x = float(x1) + np.arange(msg["ni"], dtype="float64") * msg["dx"]
    step = msg["dy"] if msg.get("j_positive", True) else -msg["dy"]
    y = float(y1) + np.arange(msg["nj"], dtype="float64") * step
    xx, yy = np.meshgrid(x, y)
    lat, lon = _pstereo_inverse(msg, xx, yy)
    return x, y, lat, lon


# -- Mercator (grid template 3.10; spherical, scale true at LaD) -------------


def _mercator_y(msg: dict, lat_deg) -> np.ndarray:
    k = msg["earth_radius"] * np.cos(np.radians(msg["lad"]))
    phi = np.radians(np.asarray(lat_deg, dtype="float64"))
    return k * np.log(np.tan(np.pi / 4 + phi / 2))


def _mercator_lat(msg: dict, y) -> np.ndarray:
    k = msg["earth_radius"] * np.cos(np.radians(msg["lad"]))
    y = np.asarray(y, dtype="float64")
    return np.degrees(2.0 * np.arctan(np.exp(y / k)) - np.pi / 2)


def _mercator_lats(msg: dict) -> np.ndarray:
    """1-D latitudes of a 3.10 grid from La1 and the Dj step in meters."""
    y1 = float(_mercator_y(msg, msg["la1"]))
    step = msg["dy"] if msg.get("j_positive", True) else -msg["dy"]
    return _mercator_lat(msg, y1 + np.arange(msg["nj"], dtype="float64") * step)


# -- Gaussian latitudes (grid template 3.40) ---------------------------------


def gaussian_latitudes(n: int) -> np.ndarray:
    """Latitudes (degrees, north→south) of the global Gaussian grid with
    ``n`` parallels between pole and equator: arcsines of the roots of
    the Legendre polynomial of degree 2n (the public definition; cf. the
    quadrature grids of ECMWF/NCEP spectral models)."""
    if n < 1:
        raise ValueError("gaussian grid needs n >= 1")
    nodes, _ = np.polynomial.legendre.leggauss(2 * n)
    return np.degrees(np.arcsin(np.sort(nodes)[::-1]))


def _gaussian_grid_lats(msg: dict) -> np.ndarray:
    """Latitudes of a 3.40 message: the global set for nj == 2N, else the
    contiguous run of global Gaussian latitudes starting nearest La1
    (regional subset), oriented La1 → La2."""
    full = gaussian_latitudes(msg["gauss_n"])  # north → south
    nj = msg["nj"]
    if msg["la1"] < msg["la2"]:  # south → north scan
        full = full[::-1]
    if nj == len(full):
        return full
    if nj > len(full):
        raise ValueError(
            f"gaussian grid claims nj={nj} > 2N={len(full)} latitudes"
        )
    start = int(np.argmin(np.abs(full - msg["la1"])))
    if start + nj > len(full):
        start = len(full) - nj
    return full[start : start + nj]


def _var_attrs(group: List[dict]) -> dict:
    """cfgrib-style variable attributes for one message group."""
    attrs = {
        "shortName": group[0]["shortName"],
        "typeOfLevel": group[0]["typeOfLevel"],
        "level": group[0]["level"],
    }
    if "stepType" in group[0]:
        attrs["stepType"] = group[0]["stepType"]
    return attrs


def _grid_parts(grid: dict) -> Tuple[Tuple[str, str], Dict[str, "Variable"]]:
    """((ydim, xdim), coords) for either grid template — the spatial half
    of the dataset; callers prepend the time axis."""
    tmpl = grid.get("grid_template", 0)
    if tmpl in (20, 30):
        x, y, lat, lon = (
            _lambert_grid(grid) if tmpl == 30 else _pstereo_grid(grid)
        )
        coords = {
            "y": Variable(("y",), y, {"units": "m", "axis": "Y"}),
            "x": Variable(("x",), x, {"units": "m", "axis": "X"}),
            "latitude": Variable(("y", "x"), lat, {"units": "degrees_north"}),
            "longitude": Variable(("y", "x"), lon, {"units": "degrees_east"}),
        }
        return ("y", "x"), coords
    if tmpl == 1:
        rlats, rlons, lat, lon = _rotated_grid(grid)
        coords = {
            "rlat": Variable(
                ("rlat",), rlats,
                {"units": "degrees", "long_name": "latitude in rotated pole grid"},
            ),
            "rlon": Variable(
                ("rlon",), rlons,
                {"units": "degrees", "long_name": "longitude in rotated pole grid"},
            ),
            "latitude": Variable(("rlat", "rlon"), lat, {"units": "degrees_north"}),
            "longitude": Variable(("rlat", "rlon"), lon, {"units": "degrees_east"}),
        }
        return ("rlat", "rlon"), coords
    if tmpl == 10:
        lats = _mercator_lats(grid)
        lons = np.linspace(
            grid["lo1"],
            grid["lo2"] + (360.0 if grid["lo2"] < grid["lo1"] else 0.0),
            grid["ni"],
        )
        coords = {
            "latitude": Variable(("latitude",), lats, {"units": "degrees_north"}),
            "longitude": Variable(("longitude",), lons, {"units": "degrees_east"}),
        }
        return ("latitude", "longitude"), coords
    if tmpl == 40:
        lats = _gaussian_grid_lats(grid)
        lons = np.linspace(grid["lo1"], grid["lo2"], grid["ni"])
        coords = {
            "latitude": Variable(("latitude",), lats, {"units": "degrees_north"}),
            "longitude": Variable(("longitude",), lons, {"units": "degrees_east"}),
        }
        return ("latitude", "longitude"), coords
    lats, lons = _grid_coords(grid)
    coords = {
        "latitude": Variable(("latitude",), lats, {"units": "degrees_north"}),
        "longitude": Variable(("longitude",), lons, {"units": "degrees_east"}),
    }
    return ("latitude", "longitude"), coords


def _group_messages(
    msgs: List[dict], filter_by_keys: Optional[dict]
) -> Tuple[Dict[str, dict], np.ndarray, dict]:
    """Group matching messages per variable, validated against a common
    grid and time axis. Returns (groups, valid_times, grid_msg).

    Each group value is a dict: ``msgs`` is a ``[time]`` list for
    single-level variables, or a ``[level][time]`` nested list plus
    ``levels`` (coordinate values) and ``level_dim`` (= typeOfLevel,
    the cfgrib convention) when the same shortName appears on several
    levels forming a complete level × time grid. Incomplete level grids
    fall back to per-level suffixed variable names."""
    selected = [m for m in msgs if _match(m, filter_by_keys)]
    if not selected:
        raise ValueError(f"no GRIB2 messages match filter {filter_by_keys!r}")
    first = selected[0]
    for m in selected:
        if (m["ni"], m["nj"], m["la1"], m["lo1"]) != (
            first["ni"], first["nj"], first["la1"], first["lo1"]
        ):
            raise NotImplementedError(
                "heterogeneous grids in one GRIB2 file; filter_by_keys to a "
                "single grid"
            )
    times = np.array(
        sorted({m["valid_time"] for m in selected}), dtype="datetime64[ns]"
    )
    nt = len(times)
    t_index = {t: i for i, t in enumerate(times)}

    # bucket by (shortName, typeOfLevel) → {(level, member) → [time] list}
    buckets: Dict[
        Tuple[str, str], Dict[Tuple[float, Optional[int]], List[Optional[dict]]]
    ] = {}
    for m in selected:
        # derived ensemble products (template 4.2) become distinct
        # variables: t_mean / t_spread next to the per-member t
        sn = m["shortName"] + (
            f"_{m['derived_type']}" if "derived_type" in m else ""
        )
        per_key = buckets.setdefault((sn, m["typeOfLevel"]), {})
        slots = per_key.setdefault((m["level"], m.get("number")), [None] * nt)
        i = t_index[m["valid_time"]]
        if slots[i] is not None:
            raise ValueError(
                f"duplicate GRIB2 message for {m['shortName']!r} at "
                f"level {m['level']:g}, time {m['valid_time']}"
            )
        slots[i] = m

    short_counts: Dict[str, int] = {}
    for sn, _ in buckets:
        short_counts[sn] = short_counts.get(sn, 0) + 1

    groups: Dict[str, dict] = {}

    def emit(name: str, entry: dict) -> None:
        if name in groups:
            raise ValueError(f"GRIB2 variable name collision on {name!r}")
        groups[name] = entry

    for (sn, lev_type), per_key in sorted(buckets.items()):
        base = sn if short_counts[sn] == 1 else f"{sn}_{lev_type}"
        complete = all(
            all(s is not None for s in slots) for slots in per_key.values()
        )
        lev_set = sorted({lv for lv, _ in per_key})
        mem_set = sorted(
            {mb for _, mb in per_key}, key=lambda v: (v is None, v)
        )
        if len(mem_set) > 1:
            # ensemble stacking (cfgrib "number" dim); with several
            # levels too, the full member x level x time cross-product
            # stacks into (time, number, level, y, x)
            if None in mem_set:
                raise NotImplementedError(
                    f"variable {sn!r} mixes ensemble (template 4.1) and "
                    "deterministic messages; filter_by_keys to one kind"
                )
            if not complete or len(per_key) != len(lev_set) * len(mem_set):
                raise ValueError(
                    f"variable {sn!r} has an incomplete "
                    "member x level x time grid"
                )
            if len(lev_set) > 1:
                levels = sorted(
                    lev_set, reverse=(lev_type == "isobaricInhPa")
                )
                emit(
                    base,
                    {
                        "msgs": [
                            [per_key[(lv, mb)] for lv in levels]
                            for mb in mem_set
                        ],
                        "levels": np.array(levels, dtype="float64"),
                        "level_dim": lev_type,
                        "members": np.array(mem_set, dtype="int64"),
                    },
                )
            else:
                (lv,) = lev_set
                emit(
                    base,
                    {
                        "msgs": [per_key[(lv, mb)] for mb in mem_set],
                        "levels": np.array(mem_set, dtype="int64"),
                        "level_dim": "number",
                    },
                )
            continue
        per_level = {lv: slots for (lv, _), slots in per_key.items()}
        if len(per_level) == 1 and complete:
            (slots,) = per_level.values()
            emit(base, {"msgs": slots, "levels": None, "level_dim": None})
        elif complete:
            # full level × time grid → one variable with a level dim
            # (descending for pressure levels, the conventional order)
            levels = sorted(per_level, reverse=(lev_type == "isobaricInhPa"))
            emit(
                base,
                {
                    "msgs": [per_level[lv] for lv in levels],
                    "levels": np.array(levels, dtype="float64"),
                    "level_dim": lev_type,
                },
            )
        else:
            for lv, slots in sorted(per_level.items()):
                present = [s for s in slots if s is not None]
                if len(present) != nt:
                    raise ValueError(
                        f"variable {sn!r} level {lv:g} has {len(present)} "
                        f"messages but the file spans {nt} valid times"
                    )
                emit(
                    f"{sn}_{lev_type}{lv:g}",
                    {"msgs": slots, "levels": None, "level_dim": None},
                )
    return groups, times, first


def _group_attrs(entry: dict) -> dict:
    """Variable attrs from a group entry's first message."""
    m = entry["msgs"]
    while isinstance(m, list):  # descend [member][level][time] nesting
        m = m[0]
    group = [m]
    attrs = _var_attrs(group)
    if entry["levels"] is not None:
        attrs.pop("level", None)  # the level dim carries the values
    return attrs


def read_grib2(path: str, filter_by_keys: Optional[dict] = None) -> NDDataset:
    """Open a GRIB2 file as an NDDataset with cfgrib-style dims
    ``(time, latitude, longitude)``. ``filter_by_keys`` selects messages
    at scan time (reference reader-pushdown, ``openers.py:191-199``) —
    non-matching messages are skipped without unpacking their data."""
    msgs = scan_grib2_messages(path)
    groups, times, grid = _group_messages(msgs, filter_by_keys)
    (ydim, xdim), space_coords = _grid_parts(grid)
    data_vars = {}
    level_coords: Dict[str, np.ndarray] = {}

    with open(path, "rb") as f:

        def decode(m: dict) -> np.ndarray:
            f.seek(m["data_offset"])
            packed = f.read(m["data_nbytes"])
            return _decode_values(m, packed).reshape(m["nj"], m["ni"])

        for name, entry in groups.items():
            attrs = _group_attrs(entry)
            if entry["levels"] is None:
                planes = [decode(m) for m in entry["msgs"]]
                data_vars[name] = Variable(
                    ("time", ydim, xdim), np.stack(planes), attrs
                )
                continue
            ld = entry["level_dim"]
            prev = level_coords.get(ld)
            if prev is not None and not np.array_equal(prev, entry["levels"]):
                raise NotImplementedError(
                    f"variables share level dim {ld!r} with different "
                    "level sets; filter_by_keys to one variable"
                )
            level_coords[ld] = entry["levels"]
            if entry.get("members") is not None:
                # (member, level, time, y, x) -> (time, number, level, y, x)
                cube = np.stack(
                    [
                        [[decode(m) for m in trow] for trow in memblock]
                        for memblock in entry["msgs"]
                    ]
                ).transpose(2, 0, 1, 3, 4)
                level_coords["number"] = entry["members"]
                data_vars[name] = Variable(
                    ("time", "number", ld, ydim, xdim), cube, attrs
                )
            else:
                cube = np.stack(
                    [[decode(m) for m in row] for row in entry["msgs"]]
                ).swapaxes(0, 1)  # (time, level, y, x)
                data_vars[name] = Variable(("time", ld, ydim, xdim), cube, attrs)

    coords = {"time": Variable(("time",), times), **space_coords}
    sizes = {"time": len(times), ydim: grid["nj"], xdim: grid["ni"]}
    for ld, levels in level_coords.items():
        attrs_ld = (
            {"long_name": "ensemble member"}
            if ld == "number"
            else {"typeOfLevel": ld}
        )
        coords[ld] = Variable((ld,), levels, attrs_ld)
        sizes[ld] = len(levels)
    return NDDataset(data_vars, coords, {}, sizes)


def grib2_schema(path: str, filter_by_keys: Optional[dict] = None) -> dict:
    """Header-only schema (same contract as ``netcdf3_schema`` /
    ``hdf5_schema``): section headers are parsed, data bits never read."""
    msgs = scan_grib2_messages(path)
    groups, times, grid = _group_messages(msgs, filter_by_keys)
    (ydim, xdim), space_coords = _grid_parts(grid)
    dims = {"time": len(times), ydim: grid["nj"], xdim: grid["ni"]}
    schema: dict = {"attrs": {}, "coords": {}, "data_vars": {}, "dims": dims, "chunks": {}}
    schema["coords"]["time"] = {
        "dims": ["time"],
        "attrs": {},
        "dtype": "datetime64[ns]",
        "shape": [len(times)],
        "encoding": {},
    }
    for cname, var in space_coords.items():
        schema["coords"][cname] = {
            "dims": list(var.dims),
            "attrs": dict(var.attrs),
            "dtype": str(var.data.dtype),
            "shape": list(var.data.shape),
            "encoding": {},
        }
    def _level_coord(ld: str, values: np.ndarray) -> None:
        dims[ld] = len(values)
        schema["coords"][ld] = {
            "dims": [ld],
            "attrs": (
                {"long_name": "ensemble member"}
                if ld == "number"
                else {"typeOfLevel": ld}
            ),
            "dtype": "int64" if ld == "number" else "float64",
            "shape": [len(values)],
            "encoding": {},
        }

    for name, entry in groups.items():
        if entry["levels"] is None:
            vdims = ["time", ydim, xdim]
        elif entry.get("members") is not None:
            ld = entry["level_dim"]
            _level_coord("number", entry["members"])
            _level_coord(ld, entry["levels"])
            vdims = ["time", "number", ld, ydim, xdim]
        else:
            ld = entry["level_dim"]
            _level_coord(ld, entry["levels"])
            vdims = ["time", ld, ydim, xdim]
        schema["data_vars"][name] = {
            "dims": vdims,
            "attrs": _group_attrs(entry),
            "dtype": "float64",
            "shape": [dims[d] for d in vdims],
            "encoding": {},
        }
    return schema


def scan_grib2(
    path: str,
    inline_threshold: int = 300,
    filter_by_keys: Optional[dict] = None,
) -> dict:
    """Kerchunk-style virtual-Zarr references into a GRIB2 file (native
    analog of kerchunk ``scan_grib``; reference ``openers.py:191-199``).
    Each chunk is one whole message decoded by the ``grib2-msg`` codec
    (packing parameters are per-message, so the message is the smallest
    self-contained byte range). Coordinates are inlined."""
    import base64
    import json

    from .kerchunkio import ZARR_JSON, _array_meta

    msgs = scan_grib2_messages(path)
    groups, times, grid = _group_messages(msgs, filter_by_keys)
    (ydim, xdim), space_coords = _grid_parts(grid)
    if str(path).startswith(("http://", "https://", "s3://", "gs://", "abfs://", "abfss://", "az://")):
        url = path  # refs point at the remote source: range-GET reads
    else:
        url = f"file://{os.path.abspath(path)}"
    nt, nj, ni = len(times), grid["nj"], grid["ni"]
    # non-dim coords (the 2-D lat/lon of a projected grid) are declared
    # via the group 'coordinates' attribute, the engine's convention for
    # coord-vs-data classification on reopen
    group_attrs: Dict[str, str] = {}
    non_dim = sorted(
        n for n, v in space_coords.items() if list(v.dims) != [n]
    )
    if non_dim:
        group_attrs["coordinates"] = " ".join(non_dim)
    refs: Dict[str, object] = {
        ZARR_JSON: json.dumps(
            {"zarr_format": 3, "node_type": "group", "attributes": group_attrs}
        )
    }

    def inline_array(name: str, arr: np.ndarray, attrs: dict, dims: List[str]) -> None:
        shape = list(arr.shape)
        meta = _array_meta(shape, shape, str(arr.dtype), attrs, dims)
        refs[f"{name}/{ZARR_JSON}"] = json.dumps(meta)
        raw = np.ascontiguousarray(arr, dtype=arr.dtype.newbyteorder("<")).tobytes()
        key = "/".join([name, "c"] + ["0"] * max(arr.ndim, 1))
        refs[key] = "base64:" + base64.b64encode(raw).decode("ascii")

    # time inlined as CF ints so the virtual store stays numeric
    epoch = np.datetime64("1970-01-01T00:00:00", "s")
    tvals = ((times.astype("datetime64[s]") - epoch) // np.timedelta64(1, "s")).astype(
        "int64"
    )
    inline_array(
        "time", tvals,
        {"units": "seconds since 1970-01-01", "calendar": "proleptic_gregorian"},
        ["time"],
    )
    for cname, var in space_coords.items():
        inline_array(cname, var.data, dict(var.attrs), list(var.dims))

    level_inlined: Dict[str, np.ndarray] = {}
    for name, entry in groups.items():
        attrs = _group_attrs(entry)
        if entry["levels"] is None:
            meta = _array_meta(
                [nt, nj, ni], [1, nj, ni], "float64", attrs,
                ["time", ydim, xdim],
            )
            meta["codecs"] = [{"name": "grib2-msg"}]
            meta["fill_value"] = "NaN"
            refs[f"{name}/{ZARR_JSON}"] = json.dumps(meta)
            for t, m in enumerate(entry["msgs"]):
                refs[f"{name}/c/{t}/0/0"] = [url, m["offset"], m["length"]]
        else:
            ld = entry["level_dim"]
            prev = level_inlined.get(ld)
            if prev is not None and not np.array_equal(prev, entry["levels"]):
                raise NotImplementedError(
                    f"variables share level dim {ld!r} with different "
                    "level sets; filter_by_keys to one variable"
                )
            if prev is None:
                level_inlined[ld] = entry["levels"]
                inline_array(
                    ld,
                    entry["levels"],
                    {"long_name": "ensemble member"}
                    if ld == "number"
                    else {"typeOfLevel": ld},
                    [ld],
                )
            nl = len(entry["levels"])
            if entry.get("members") is not None:
                if "number" not in level_inlined:
                    level_inlined["number"] = entry["members"]
                    inline_array(
                        "number", entry["members"],
                        {"long_name": "ensemble member"}, ["number"],
                    )
                nm = len(entry["members"])
                meta = _array_meta(
                    [nt, nm, nl, nj, ni], [1, 1, 1, nj, ni], "float64",
                    attrs, ["time", "number", ld, ydim, xdim],
                )
                meta["codecs"] = [{"name": "grib2-msg"}]
                meta["fill_value"] = "NaN"
                refs[f"{name}/{ZARR_JSON}"] = json.dumps(meta)
                for mi, memblock in enumerate(entry["msgs"]):
                    for li, row in enumerate(memblock):
                        for t, m in enumerate(row):
                            refs[f"{name}/c/{t}/{mi}/{li}/0/0"] = [
                                url, m["offset"], m["length"],
                            ]
                continue
            meta = _array_meta(
                [nt, nl, nj, ni], [1, 1, nj, ni], "float64", attrs,
                ["time", ld, ydim, xdim],
            )
            meta["codecs"] = [{"name": "grib2-msg"}]
            meta["fill_value"] = "NaN"
            refs[f"{name}/{ZARR_JSON}"] = json.dumps(meta)
            for li, row in enumerate(entry["msgs"]):
                for t, m in enumerate(row):
                    refs[f"{name}/c/{t}/{li}/0/0"] = [url, m["offset"], m["length"]]
    return refs


# ===========================================================================
# minimal writer (fixture generator — valid GRIB2 per the public WMO spec)
# ===========================================================================


def _packing_params(field: np.ndarray) -> Tuple[np.float32, int, int, np.ndarray]:
    """Exact simple-packing parameters: R (float32), E, nbits, X ints.
    Picks the largest binary scale E that represents every value exactly;
    raises if the data are not on a 2^E grid (quantize first)."""
    r32 = np.float32(field.min())
    resid = field.astype("float64") - np.float64(r32)
    if np.allclose(resid, 0):
        return r32, 0, 0, np.zeros(field.size, dtype=np.int64)
    for e in range(8, -25, -1):
        scaled = resid * 2.0 ** -e
        ints = np.round(scaled)
        if np.max(np.abs(scaled - ints)) == 0.0:
            if ints.max() >= 2 ** 24:
                continue
            nbits = max(1, int(ints.max()).bit_length())
            return r32, e, nbits, ints.astype(np.int64).ravel()
    raise ValueError(
        "GRIB2 simple packing stores values as R + X*2^E; this field is not "
        "exactly representable on any 2^E grid (E in [-24, 8]). Quantize the "
        "data (e.g. round to multiples of 2^-10) before writing."
    )


def _section(num: int, payload: bytes) -> bytes:
    return (len(payload) + 5).to_bytes(4, "big") + bytes([num]) + payload


def _complex_sections(
    x: np.ndarray, r32: np.float32, e: int, order: int, group_len: int = 20
) -> Tuple[bytes, bytes]:
    """Build section 5 (template 5.2 / 5.3) + section 7 (7.2 / 7.3)
    payloads for the simple-packing ints ``x``. ``order`` 0 → 5.2;
    1 or 2 → 5.3 with spatial differencing of that order."""
    extra = b""
    if order:
        ivals = [int(v) for v in x[:order]]
        d = np.diff(x, n=order).astype(np.int64)
        gmin = int(d.min()) if len(d) else 0
        arr = np.concatenate([np.zeros(order, dtype=np.int64), d - gmin])
        eo = 4
        for v in ivals + [gmin]:
            extra += _sm_encode(int(v), eo).to_bytes(eo, "big")
    else:
        arr = x.astype(np.int64)
    n = len(arr)
    ng = max(1, (n + group_len - 1) // group_len)
    refs = np.empty(ng, dtype=np.int64)
    widths = np.empty(ng, dtype=np.int64)
    data_bits = []
    for g in range(ng):
        seg = arr[g * group_len : (g + 1) * group_len]
        refs[g] = seg.min()
        rel = seg - refs[g]
        widths[g] = int(rel.max()).bit_length()
        if widths[g]:
            b = np.unpackbits(
                rel.astype(">u4").view(np.uint8).reshape(len(seg), 4), axis=1
            )[:, 32 - widths[g] :]
            data_bits.append(b.ravel())
    nbits_ref = int(refs.max()).bit_length() if ng else 0
    wbits = int(widths.max()).bit_length() if ng else 0
    last_len = n - (ng - 1) * group_len

    stream = (
        np.concatenate(data_bits) if data_bits else np.zeros(0, dtype=np.uint8)
    )
    pad = (-len(stream)) % 8
    if pad:
        stream = np.concatenate([stream, np.zeros(pad, np.uint8)])
    sec7 = (
        extra
        + _pack_bits(refs, nbits_ref)
        + _pack_bits(widths, wbits)
        + b""  # group lengths: 0 bits each (all equal the reference length)
        + np.packbits(stream).tobytes()
    )
    tmpl = 3 if order else 2
    sec5 = (
        n.to_bytes(4, "big")
        + tmpl.to_bytes(2, "big")
        + np.array(r32, dtype=">f4").tobytes()
        + _sm_encode(e, 2).to_bytes(2, "big")
        + _sm_encode(0, 2).to_bytes(2, "big")
        + bytes([nbits_ref, 0])  # bits per group ref; field type 0 (float)
        + bytes([1, 0])  # general group splitting; no missing values
        + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
        + ng.to_bytes(4, "big")
        + bytes([0, wbits])  # group width reference 0; bits per width
        + group_len.to_bytes(4, "big")  # group length reference
        + bytes([1])  # length increment
        + last_len.to_bytes(4, "big")
        + bytes([0])  # bits per scaled group length (all zero)
    )
    if order:
        sec5 += bytes([order, 4])
    return sec5, sec7


def write_grib2(
    path: str,
    ds: NDDataset,
    levels: Optional[Dict[str, Tuple[str, float]]] = None,
    param_map: Optional[Dict[str, Tuple[int, int, int]]] = None,
    packing: str = "simple",
    projection: Optional[dict] = None,
    statistics: Optional[Dict[str, Tuple[str, float]]] = None,
    grid: str = "latlon",
    derived: Optional[Dict[str, Tuple[str, int]]] = None,
    probability: Optional[Dict[str, Tuple[int, Optional[float], Optional[float], int]]] = None,
) -> None:
    """Write an NDDataset as GRIB2 (one message per variable per time
    step; grid template 3.0, product template 4.0). Variables must have
    dims ``(time, latitude, longitude)``. Variable names map to GRIB
    parameters via the built-in shortName table or ``param_map[name] =
    (discipline, category, number)``; ``levels[name] = (typeOfLevel,
    value)`` defaults to surface. ``packing`` selects the data
    representation: ``simple`` (5.0), ``complex`` (5.2),
    ``complex-diff1`` / ``complex-diff2`` (5.3 with first/second order
    spatial differencing), ``ieee`` (5.4 raw IEEE float32 — exact for
    data no 2^E grid represents), ``png`` (5.41 PNG code stream), or
    ``jpeg2000`` (5.40 lossless JPEG2000 code stream via
    :mod:`.jp2kio`). ``statistics[name] = (stepType,
    interval_hours)`` writes that variable with product template 4.8
    (accumulated/averaged over the interval ending at each time step;
    stepType one of avg/accum/max/min). ``projection`` switches the grid
    template: ``{"kind": "lambert", "latin1", "latin2", "lov", "lad"}``
    (3.30) or ``{"kind": "polar_stereo", "lad", "lov", "south"(opt)}``
    (3.20) with variables on dims ``(time, y, x)`` and x/y coords in
    meters, ``{"kind": "mercator", "lad"}`` (3.10) with dims
    ``(time, latitude, longitude)`` and Mercator-spaced latitudes, or
    ``{"kind": "rotated_latlon", "sp_lat", "sp_lon", "angle"(opt)}``
    (3.1) with variables on dims ``(time, rlat, rlon)`` and 1-D
    rlat/rlon coords in rotated degrees.
    ``grid="gaussian"`` writes template 3.40 from latitudes equal to
    :func:`gaussian_latitudes` of the global grid."""
    levels = levels or {}
    param_map = param_map or {}
    statistics = statistics or {}
    derived = derived or {}
    probability = probability or {}
    _DERIVED_CODES = {"mean": 0, "wmean": 1, "spread": 4}

    def _thresh_bytes(v: Optional[float]) -> bytes:
        if v is None:
            return bytes([0xFF]) + (0xFFFFFFFF).to_bytes(4, "big")
        scale = 6
        return bytes([_sm_encode(scale, 1)]) + _sm_encode(
            int(round(v * 10 ** scale)), 4
        ).to_bytes(4, "big")
    _STAT_CODES = {"avg": 0, "accum": 1, "max": 2, "min": 3}
    for sname, (stype, _hrs) in statistics.items():
        if stype not in _STAT_CODES:
            raise ValueError(
                f"statistics[{sname!r}]: stepType {stype!r} "
                f"(choose from {sorted(_STAT_CODES)})"
            )
    pack_modes = {
        "simple": None, "complex": 0, "complex-diff1": 1, "complex-diff2": 2,
        "ieee": None, "png": None, "jpeg2000": None,
        "jpeg2000-lossy": None,
    }
    if packing not in pack_modes:
        raise ValueError(f"packing {packing!r}; choose from {sorted(pack_modes)}")
    complex_order = pack_modes[packing]
    times = ds.coords["time"].data.astype("datetime64[s]")

    def microdeg(v: float) -> int:
        return int(round(v * 1e6))

    shape_block = (
        bytes([6, 0xFF]) + b"\xff\xff\xff\xff"
        + bytes([0xFF]) + b"\xff\xff\xff\xff"
        + bytes([0xFF]) + b"\xff\xff\xff\xff"
    )
    kind = (projection or {}).get("kind", "lambert")
    if projection is not None and kind in ("lambert", "polar_stereo"):
        xs = ds.coords["x"].data.astype("float64")
        ys = ds.coords["y"].data.astype("float64")
        for arr, what in ((xs, "x"), (ys, "y")):
            if len(arr) < 2 or not np.allclose(np.diff(arr), arr[1] - arr[0]):
                raise ValueError(f"projected grids need a regular {what} grid")
            if arr[1] <= arr[0]:
                raise ValueError(f"projected-grid writer needs increasing {what}")
        nj, ni = len(ys), len(xs)
        var_dims = ("time", "y", "x")
        if kind == "lambert":
            pmsg = {
                "earth_radius": projection.get("earth_radius", 6371229.0),
                "latin1": projection["latin1"],
                "latin2": projection["latin2"],
                "lov": projection["lov"],
                "lad": projection["lad"],
            }
            la1, lo1 = _lambert_inverse(pmsg, xs[0], ys[0])
            tmpl_grid = (30).to_bytes(2, "big") + (
                shape_block
                + ni.to_bytes(4, "big") + nj.to_bytes(4, "big")
                + _sm_encode(microdeg(float(la1)), 4).to_bytes(4, "big")
                + microdeg(float(lo1) % 360).to_bytes(4, "big")
                + bytes([0x08])
                + _sm_encode(microdeg(pmsg["lad"]), 4).to_bytes(4, "big")
                + microdeg(pmsg["lov"] % 360).to_bytes(4, "big")
                + int(round((xs[1] - xs[0]) * 1e3)).to_bytes(4, "big")
                + int(round((ys[1] - ys[0]) * 1e3)).to_bytes(4, "big")
                + bytes([0x00, 0x40])  # north-pole projection; +x +y scan
                + _sm_encode(microdeg(pmsg["latin1"]), 4).to_bytes(4, "big")
                + _sm_encode(microdeg(pmsg["latin2"]), 4).to_bytes(4, "big")
                + _sm_encode(microdeg(-90.0), 4).to_bytes(4, "big")
                + (0).to_bytes(4, "big")
            )
        else:  # polar_stereo (template 3.20)
            south = bool(projection.get("south", False))
            pmsg = {
                "earth_radius": projection.get("earth_radius", 6371229.0),
                "lad": projection["lad"],
                "lov": projection["lov"],
                "south_pole_proj": south,
            }
            la1, lo1 = _pstereo_inverse(pmsg, xs[0], ys[0])
            tmpl_grid = (20).to_bytes(2, "big") + (
                shape_block
                + ni.to_bytes(4, "big") + nj.to_bytes(4, "big")
                + _sm_encode(microdeg(float(la1)), 4).to_bytes(4, "big")
                + microdeg(float(lo1) % 360).to_bytes(4, "big")
                + bytes([0x08])
                + _sm_encode(microdeg(pmsg["lad"]), 4).to_bytes(4, "big")
                + microdeg(pmsg["lov"] % 360).to_bytes(4, "big")
                + int(round((xs[1] - xs[0]) * 1e3)).to_bytes(4, "big")
                + int(round((ys[1] - ys[0]) * 1e3)).to_bytes(4, "big")
                + bytes([0x80 if south else 0x00, 0x40])
            )
    elif projection is not None and kind == "rotated_latlon":
        rlats = ds.coords["rlat"].data.astype("float64")
        rlons = ds.coords["rlon"].data.astype("float64")
        for arr, what in ((rlats, "rlat"), (rlons, "rlon")):
            if len(arr) > 1 and not np.allclose(np.diff(arr), arr[1] - arr[0]):
                raise ValueError(f"template 3.1 needs a regular {what} grid")
        if len(rlons) > 1 and rlons[1] <= rlons[0]:
            # lo1/lo2 store mod 360, so a descending rlon would read back
            # as a different ascending wrapped grid — refuse, don't corrupt
            raise ValueError("template 3.1 writer needs increasing rlon")
        nj, ni = len(rlats), len(rlons)
        var_dims = ("time", "rlat", "rlon")
        tmpl_grid = (1).to_bytes(2, "big") + (
            bytes([6, 0xFF]) + b"\xff\xff\xff\xff"
            + bytes([0xFF]) + b"\xff\xff\xff\xff"
            + bytes([0xFF]) + b"\xff\xff\xff\xff"
            + ni.to_bytes(4, "big") + nj.to_bytes(4, "big")
            + (0).to_bytes(4, "big") + (0xFFFFFFFF).to_bytes(4, "big")
            + _sm_encode(microdeg(float(rlats[0])), 4).to_bytes(4, "big")
            + microdeg(float(rlons[0]) % 360).to_bytes(4, "big")
            + bytes([0x30])
            + _sm_encode(microdeg(float(rlats[-1])), 4).to_bytes(4, "big")
            + microdeg(float(rlons[-1]) % 360).to_bytes(4, "big")
            + abs(microdeg((rlons[-1] - rlons[0]) / max(ni - 1, 1))).to_bytes(4, "big")
            + abs(microdeg((rlats[-1] - rlats[0]) / max(nj - 1, 1))).to_bytes(4, "big")
            + bytes([0x00])
            + _sm_encode(microdeg(projection["sp_lat"]), 4).to_bytes(4, "big")
            + microdeg(projection["sp_lon"] % 360).to_bytes(4, "big")
            + _sm_encode(microdeg(projection.get("angle", 0.0)), 4).to_bytes(4, "big")
        )
    elif projection is not None and kind == "mercator":
        lats = ds.coords["latitude"].data.astype("float64")
        lons = ds.coords["longitude"].data.astype("float64")
        nj, ni = len(lats), len(lons)
        var_dims = ("time", "latitude", "longitude")
        pmsg = {
            "earth_radius": projection.get("earth_radius", 6371229.0),
            "lad": projection["lad"],
        }
        ys = np.asarray(_mercator_y(pmsg, lats))
        if len(ys) < 2 or not np.allclose(
            np.diff(ys), ys[1] - ys[0], rtol=1e-6
        ):
            raise ValueError(
                "template 3.10 needs Mercator-spaced latitudes (uniform "
                "projected y); build them with mercator latitudes from dy"
            )
        if len(lons) < 2 or not np.allclose(np.diff(lons), lons[1] - lons[0]):
            raise ValueError("template 3.10 needs uniform longitudes")
        dy = ys[1] - ys[0]
        k = pmsg["earth_radius"] * np.cos(np.radians(pmsg["lad"]))
        dx = np.radians(lons[1] - lons[0]) * k
        if dx <= 0 or dy == 0:
            raise ValueError("template 3.10 writer needs increasing coords")
        scan = 0x40 if dy > 0 else 0x00
        tmpl_grid = (10).to_bytes(2, "big") + (
            shape_block
            + ni.to_bytes(4, "big") + nj.to_bytes(4, "big")
            + _sm_encode(microdeg(float(lats[0])), 4).to_bytes(4, "big")
            + microdeg(float(lons[0]) % 360).to_bytes(4, "big")
            + bytes([0x08])
            + _sm_encode(microdeg(pmsg["lad"]), 4).to_bytes(4, "big")
            + _sm_encode(microdeg(float(lats[-1])), 4).to_bytes(4, "big")
            + microdeg(float(lons[-1]) % 360).to_bytes(4, "big")
            + bytes([scan])
            + (0).to_bytes(4, "big")  # orientation
            + int(round(dx * 1e3)).to_bytes(4, "big")
            + int(round(abs(dy) * 1e3)).to_bytes(4, "big")
        )
    elif grid == "gaussian":
        lats = ds.coords["latitude"].data.astype("float64")
        lons = ds.coords["longitude"].data.astype("float64")
        nj, ni = len(lats), len(lons)
        var_dims = ("time", "latitude", "longitude")
        if nj % 2:
            raise ValueError("global gaussian grid needs an even latitude count")
        gn = nj // 2
        want = gaussian_latitudes(gn)
        descending = lats[0] > lats[-1]
        if not np.allclose(lats, want if descending else want[::-1], atol=1e-3):
            raise ValueError(
                "gaussian writer: latitudes must equal gaussian_latitudes"
                f"({gn}) (global grid)"
            )
        if len(lons) > 1 and not np.allclose(np.diff(lons), lons[1] - lons[0]):
            raise ValueError("template 3.40 needs uniform longitudes")
        tmpl_grid = (40).to_bytes(2, "big") + (
            shape_block
            + ni.to_bytes(4, "big") + nj.to_bytes(4, "big")
            + (0).to_bytes(4, "big") + (0xFFFFFFFF).to_bytes(4, "big")
            + _sm_encode(microdeg(float(lats[0])), 4).to_bytes(4, "big")
            + microdeg(float(lons[0]) % 360).to_bytes(4, "big")
            + bytes([0x30])
            + _sm_encode(microdeg(float(lats[-1])), 4).to_bytes(4, "big")
            + microdeg(float(lons[-1]) % 360).to_bytes(4, "big")
            + abs(microdeg((lons[-1] - lons[0]) / max(ni - 1, 1))).to_bytes(4, "big")
            + gn.to_bytes(4, "big")
            + bytes([0x00])
        )
    else:
        lats = ds.coords["latitude"].data.astype("float64")
        lons = ds.coords["longitude"].data.astype("float64")
        for arr, what in ((lats, "latitude"), (lons, "longitude")):
            if len(arr) > 1 and not np.allclose(np.diff(arr), arr[1] - arr[0]):
                raise ValueError(f"GRIB2 template 3.0 needs a regular {what} grid")
        nj, ni = len(lats), len(lons)
        var_dims = ("time", "latitude", "longitude")
        tmpl_grid = None  # built per message below (template 3.0)

    messages = []
    for name, var in ds.data_vars.items():
        vdims = tuple(var.dims)
        ens_dims = var_dims[:1] + ("number",) + var_dims[1:]
        if vdims == ens_dims:
            # ensemble variable: one template-4.1 message per member/time
            # (dims (time, number, y, x) — the reader's stacking order)
            ens_members = [int(v) for v in ds.coords["number"].data]
        elif vdims == var_dims:
            ens_members = None
        else:
            raise ValueError(
                f"{name}: GRIB2 writer needs dims {var_dims} "
                f"(or {ens_dims} for ensembles)"
            )
        if name in param_map:
            disc, cat, num = param_map[name]
        elif name in _PARAM_FOR_NAME:
            disc, cat, num = _PARAM_FOR_NAME[name]
        else:
            raise ValueError(
                f"{name}: unknown shortName; pass param_map={{'{name}': "
                "(discipline, category, number)}}"
            )
        lev_name, lev_value = levels.get(name, ("surface", 0.0))
        lev_code = _LEVEL_CODES.get(lev_name)
        if lev_code is None:
            raise ValueError(f"unknown typeOfLevel {lev_name!r}")
        steps = [
            (None, t) for t in range(times.shape[0])
        ] if ens_members is None else [
            (mi, t)
            for mi in range(len(ens_members))
            for t in range(times.shape[0])
        ]
        for mi, t in steps:
            field = np.ascontiguousarray(
                var.data[t] if mi is None else var.data[t, mi],
                dtype="float64",
            )
            finite = np.isfinite(field.ravel())
            if finite.all():
                bitmap_sec6 = bytes([255])
                pack_src = field
            else:
                # NaN points → bitmap (one bit per grid point, 1 = present);
                # section 7 then stores only present values
                bitmap_sec6 = bytes([0]) + np.packbits(
                    finite.astype(np.uint8)
                ).tobytes()
                pack_src = field.ravel()[finite]
            if packing == "ieee":
                # no scaled-int representation needed — floats go verbatim
                r32, e, nbits, x = np.float32(0), 0, 0, np.zeros(0, np.int64)
                npacked = int(pack_src.size)
            elif pack_src.size:
                r32, e, nbits, x = _packing_params(pack_src)
                npacked = int(x.size)
            else:
                r32, e, nbits, x = np.float32(0), 0, 0, np.zeros(0, np.int64)
                npacked = 0
            ts = times[t].item()  # datetime.datetime
            stat = statistics.get(name)
            if stat is not None:
                # accumulation interval [ts - hours, ts]; reference time
                # is the interval start, valid time its end
                import datetime as _dt

                ref = ts - _dt.timedelta(hours=stat[1])
            else:
                ref = ts

            sec1 = (
                (0xFFFF).to_bytes(2, "big") + (0xFFFF).to_bytes(2, "big")
                + bytes([2, 0, 1])
                + ref.year.to_bytes(2, "big")
                + bytes([ref.month, ref.day, ref.hour, ref.minute, ref.second, 0, 2])
            )
            if tmpl_grid is not None:
                grid_body = tmpl_grid
            else:
                tmpl3 = (
                    bytes([6, 0xFF]) + b"\xff\xff\xff\xff"
                    + bytes([0xFF]) + b"\xff\xff\xff\xff"
                    + bytes([0xFF]) + b"\xff\xff\xff\xff"
                    + ni.to_bytes(4, "big") + nj.to_bytes(4, "big")
                    + (0).to_bytes(4, "big") + (0xFFFFFFFF).to_bytes(4, "big")
                    + _sm_encode(microdeg(lats[0]), 4).to_bytes(4, "big")
                    + microdeg(lons[0] % 360).to_bytes(4, "big")
                    + bytes([0x30])
                    + _sm_encode(microdeg(lats[-1]), 4).to_bytes(4, "big")
                    + microdeg(lons[-1] % 360).to_bytes(4, "big")
                    + abs(microdeg((lons[-1] - lons[0]) / max(ni - 1, 1))).to_bytes(4, "big")
                    + abs(microdeg((lats[-1] - lats[0]) / max(nj - 1, 1))).to_bytes(4, "big")
                    + bytes([0x00])
                )
                grid_body = (0).to_bytes(2, "big") + tmpl3
            sec3 = (
                bytes([0]) + (nj * ni).to_bytes(4, "big") + bytes([0, 0])
                + grid_body
            )
            sec4_common = (
                bytes([cat, num, 2, 0xFF, 0xFF]) + (0).to_bytes(2, "big")
                + bytes([0, 1]) + (0).to_bytes(4, "big")
                + bytes([lev_code, 0]) + int(lev_value).to_bytes(4, "big")
                + bytes([0xFF, 0xFF]) + (0xFFFFFFFF).to_bytes(4, "big")
            )
            if mi is None and name in probability:
                ptype, lo, hi, n_in_ens = probability[name]
                sec4 = (
                    (0).to_bytes(2, "big") + (5).to_bytes(2, "big")
                    + sec4_common
                    + bytes([0, int(n_in_ens), int(ptype)])
                    + _thresh_bytes(lo)
                    + _thresh_bytes(hi)
                )
            elif mi is None and name in derived:
                dtype_name, n_in_ens = derived[name]
                code = _DERIVED_CODES.get(dtype_name)
                if code is None:
                    raise ValueError(
                        f"derived[{name!r}]: type {dtype_name!r} "
                        f"(choose from {sorted(_DERIVED_CODES)})"
                    )
                sec4 = (
                    (0).to_bytes(2, "big") + (2).to_bytes(2, "big")
                    + sec4_common
                    + bytes([code, int(n_in_ens)])
                )
            elif mi is not None and stat is not None:
                # template 4.11: ensemble block then the interval block
                stype, hrs = stat
                sec4 = (
                    (0).to_bytes(2, "big") + (11).to_bytes(2, "big")
                    + sec4_common
                    + bytes([3, ens_members[mi], len(ens_members)])
                    + ts.year.to_bytes(2, "big")
                    + bytes([ts.month, ts.day, ts.hour, ts.minute, ts.second])
                    + bytes([1]) + (0).to_bytes(4, "big")
                    + bytes([_STAT_CODES[stype], 2, 1])
                    + int(round(hrs)).to_bytes(4, "big")
                    + bytes([1]) + (0).to_bytes(4, "big")
                )
            elif mi is not None:
                # template 4.1: 4.0 fields + (ens type 3 = perturbed,
                # perturbation number, ensemble size)
                sec4 = (
                    (0).to_bytes(2, "big") + (1).to_bytes(2, "big")
                    + sec4_common
                    + bytes([3, ens_members[mi], len(ens_members)])
                )
            elif stat is None:
                sec4 = (
                    (0).to_bytes(2, "big") + (0).to_bytes(2, "big")
                    + sec4_common
                )
            else:
                stype, hrs = stat
                sec4 = (
                    (0).to_bytes(2, "big") + (8).to_bytes(2, "big")
                    + sec4_common
                    # end of overall interval = the time-coordinate value
                    + ts.year.to_bytes(2, "big")
                    + bytes([ts.month, ts.day, ts.hour, ts.minute, ts.second])
                    + bytes([1]) + (0).to_bytes(4, "big")  # 1 range, 0 missing
                    + bytes([_STAT_CODES[stype], 2, 1])  # process, incr type, unit h
                    + int(round(hrs)).to_bytes(4, "big")
                    + bytes([1]) + (0).to_bytes(4, "big")  # incr unit h, incr 0
                )
            if packing == "ieee":
                # template 5.4/7.4: raw IEEE floats, no scaling
                sec5 = (
                    npacked.to_bytes(4, "big") + (4).to_bytes(2, "big")
                    + bytes([1])  # precision 1 = 32-bit
                )
                sec7 = np.ascontiguousarray(pack_src, dtype=">f4").tobytes()
            elif packing == "png":
                # template 5.41/7.41: scaled ints as a PNG code stream
                from .pngio import encode_png

                if nbits <= 8:
                    depth = 8
                    img = x.astype(np.uint8)
                elif nbits <= 24:
                    depth = 24
                    img = np.stack(
                        [(x >> 16) & 0xFF, (x >> 8) & 0xFF, x & 0xFF], axis=-1
                    ).astype(np.uint8)
                else:
                    depth = 32
                    img = np.stack(
                        [(x >> s) & 0xFF for s in (24, 16, 8, 0)], axis=-1
                    ).astype(np.uint8)
                shape = (nj, ni) if npacked == nj * ni else (1, npacked)
                img = img.reshape(shape + img.shape[1:])
                sec5 = (
                    npacked.to_bytes(4, "big") + (41).to_bytes(2, "big")
                    + np.array(r32, dtype=">f4").tobytes()
                    + _sm_encode(e, 2).to_bytes(2, "big")
                    + _sm_encode(0, 2).to_bytes(2, "big")
                    + bytes([depth, 0])
                )
                sec7 = encode_png(img, filters=[0, 1, 2, 3, 4])
            elif packing in ("jpeg2000", "jpeg2000-lossy"):
                # template 5.40/7.40: scaled ints as a J2K stream —
                # lossless 5/3 by default, or the ECMWF-style lossy 9/7
                # path (compression-type octet 1) quantizing at one
                # integer level (±0.5 · 2^E · 10^-D in physical units)
                from .jp2kio import encode_j2k

                lossy = packing == "jpeg2000-lossy"
                depth = max(int(nbits), 1)
                shape = (nj, ni) if npacked == nj * ni else (1, npacked)
                img = x.reshape(shape)
                sec7 = (
                    encode_j2k(img, depth=depth, irreversible=lossy, qstep=1.0)
                    if npacked
                    else b""
                )
                # octet 23: target compression ratio M:1 — the spec expects
                # a real ratio when octet 22 signals lossy; report the
                # achieved ratio vs the depth-bit packed size (255 = missing
                # stays for lossless, where the octet does not apply)
                if lossy and sec7:
                    ratio = round(npacked * depth / 8 / len(sec7))
                    ratio = max(1, min(254, ratio))
                else:
                    ratio = 255
                sec5 = (
                    npacked.to_bytes(4, "big") + (40).to_bytes(2, "big")
                    + np.array(r32, dtype=">f4").tobytes()
                    + _sm_encode(e, 2).to_bytes(2, "big")
                    + _sm_encode(0, 2).to_bytes(2, "big")
                    + bytes([depth, 0, 1 if lossy else 0, ratio])
                )
            elif complex_order is None:
                sec5 = (
                    npacked.to_bytes(4, "big") + (0).to_bytes(2, "big")
                    + np.array(r32, dtype=">f4").tobytes()
                    + _sm_encode(e, 2).to_bytes(2, "big")
                    + _sm_encode(0, 2).to_bytes(2, "big")
                    + bytes([nbits, 0])
                )
                sec7 = _pack_bits(x, nbits)
            else:
                sec5, sec7 = _complex_sections(x, r32, e, complex_order)
            sec6 = bitmap_sec6

            payload = (
                _section(1, sec1) + _section(3, sec3) + _section(4, sec4)
                + _section(5, sec5) + _section(6, sec6) + _section(7, sec7)
                + b"7777"
            )
            total = 16 + len(payload)
            sec0 = b"GRIB" + b"\x00\x00" + bytes([disc, 2]) + total.to_bytes(8, "big")
            messages.append(sec0 + payload)

    with open(path, "wb") as f:
        for m in messages:
            f.write(m)
