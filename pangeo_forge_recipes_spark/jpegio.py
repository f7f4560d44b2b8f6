"""Pure stdlib+numpy baseline JPEG codec (ITU-T T.81 sequential DCT).

Makes the multimodal JPEG path REAL with no external library: the
decoder handles baseline and extended-sequential Huffman JPEGs —
grayscale and YCbCr with 4:4:4 / 4:2:2 / 4:2:0 chroma subsampling,
restart intervals, byte stuffing, 8-bit quantization tables — and the
encoder produces spec-conformant baseline files (canonical Huffman
tables built per image, so no reliance on remembering the Annex K
defaults; the DHT segment carries whatever we build).

Progressive Huffman JPEGs (SOF2 — the dominant web encoding) decode
too: all scans accumulate into per-component coefficient stores
(spectral selection, successive approximation with the libjpeg-
compatible refinement algorithm, EOB runs), and the encoder can emit a
progressive scan script that decodes bit-identically to its baseline
output. 12-bit precision (extended-sequential SOF1 and 12-bit SOF2,
16-bit quantization tables, wider Huffman alphabets) and lossless SOF3
(T.81 Annex H: predictors 1-7, point transform, modulo-2^16
differences, SSSS=16, 2..16-bit samples — the DNG/medical mode) are
implemented in both directions. Arithmetic coding and hierarchical
modes raise ``NotImplementedError`` with a clear message.

Reference parity: the reference delegates image decoding to external
libraries; this engine decodes JPEG natively so ``decode_image``
(operators/multimodal.py) runs on genuine compressed payloads.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

# zig-zag scan order (T.81 figure 5): ZIGZAG[i] = raster index of the
# i-th coefficient in transmission order
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix M: F = M f M^T, f = M^T F M."""
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    m[0, :] *= 1 / np.sqrt(2)
    return m


_M = _dct_matrix()


def idct_8x8(coeffs: np.ndarray) -> np.ndarray:
    """2-D inverse DCT of one or more 8x8 blocks (…, 8, 8)."""
    return _M.T @ coeffs @ _M


def fdct_8x8(pixels: np.ndarray) -> np.ndarray:
    return _M @ pixels @ _M.T


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map the t-bit magnitude v to its signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


class _Huff:
    """Canonical Huffman decode table (T.81 annex C/F)."""

    def __init__(self, bits: List[int], vals: List[int]):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for l in range(1, 17):
            if bits[l - 1]:
                self.valptr[l] = k
                self.mincode[l] = code
                code += bits[l - 1]
                k += bits[l - 1]
                self.maxcode[l] = code - 1
            code <<= 1

    def decode(self, reader: "_BitReader") -> int:
        code = 0
        for l in range(1, 17):
            code = (code << 1) | reader.bit()
            if self.maxcode[l] >= code >= self.mincode[l]:
                return self.vals[self.valptr[l] + code - self.mincode[l]]
        raise ValueError("corrupt JPEG: no Huffman code matched in 16 bits")


class _BitReader:
    """MSB-first bit reader over a de-stuffed entropy segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = 0
        self.acc = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                # past the end: T.81 pads with 1-bits
                return 1
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _read_entropy(buf: bytes, start: int) -> Tuple[List[bytes], int]:
    """De-stuff one scan's entropy data from ``start``; split at RSTn.
    Returns (segments, position of the next marker)."""
    segments: List[bytes] = []
    cur = bytearray()
    p = start
    n = len(buf)
    while p < n:
        b = buf[p]
        if b == 0xFF and p + 1 < n:
            m = buf[p + 1]
            if m == 0x00:
                cur.append(0xFF)
                p += 2
                continue
            if 0xD0 <= m <= 0xD7:  # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                p += 2
                continue
            break  # EOI or next marker
        cur.append(b)
        p += 1
    segments.append(bytes(cur))
    return segments, p


def _decode_scan(
    frame: dict,
    coef: List[np.ndarray],
    scan: List[dict],
    band: Tuple[int, int, int, int],
    segments: List[bytes],
    restart_interval: int,
    huff_dc: Dict[int, _Huff],
    huff_ac: Dict[int, _Huff],
) -> None:
    """Decode one scan (baseline or progressive) into the per-component
    zigzag coefficient stores (T.81 F.2 / G.2; successive-approximation
    refinement follows the bit-exact libjpeg-compatible algorithm)."""
    ss, se, ah, al = band
    comps = frame["comps"]
    by_id = {c["id"]: i for i, c in enumerate(comps)}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    interleaved = len(scan) > 1
    if interleaved:
        if ss != 0:
            raise ValueError("corrupt JPEG: interleaved AC scan")
        total_units = mcus_x * mcus_y
    else:
        c = comps[by_id[scan[0]["id"]]]
        nbw = -(-(-(-frame["w"] * c["h"] // hmax)) // 8)
        nbh = -(-(-(-frame["h"] * c["v"] // vmax)) // 8)
        total_units = nbw * nbh

    seg_idx = 0
    reader = _BitReader(segments[0])
    preds = [0] * len(comps)
    eobrun = 0

    def decode_block(blk: np.ndarray, ci: int, dc_tbl, ac_tbl) -> None:
        nonlocal eobrun
        if ss == 0:
            if ah == 0:  # DC first (or full baseline scan)
                t = dc_tbl.decode(reader)
                preds[ci] += _extend(reader.receive(t), t)
                blk[0] = preds[ci] << al
            else:  # DC refinement: one bit
                if reader.bit():
                    blk[0] |= 1 << al
            if se == 0:
                return
        k = max(ss, 1)
        if ah == 0:  # AC first pass (baseline reaches here with eobrun=0)
            if eobrun:
                eobrun -= 1
                return
            while k <= se:
                rs = ac_tbl.decode(reader)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:  # ZRL
                        k += 16
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.receive(r)
                    break
                k += r
                if k > 63:
                    raise ValueError("corrupt JPEG: AC index past 63")
                blk[k] = _extend(reader.receive(s), s) << al
                k += 1
            return
        # AC successive-approximation refinement
        p1 = 1 << al
        m1 = -p1
        if eobrun == 0:
            while k <= se:
                rs = ac_tbl.decode(reader)
                r, s = rs >> 4, rs & 0xF
                val = 0
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.receive(r)
                        break
                    # r == 15: ZRL — skip 16 zero-history coefficients
                else:
                    val = p1 if reader.bit() else m1
                while k <= se:
                    if blk[k] != 0:
                        if reader.bit() and (int(blk[k]) & p1) == 0:
                            blk[k] += p1 if blk[k] >= 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    blk[k] = val
                k += 1
        if eobrun > 0:
            while k <= se:
                if blk[k] != 0:
                    if reader.bit() and (int(blk[k]) & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                k += 1
            eobrun -= 1

    for unit in range(total_units):
        if restart_interval and unit and unit % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("corrupt JPEG: fewer restart segments than expected")
            reader = _BitReader(segments[seg_idx])
            preds = [0] * len(comps)
            eobrun = 0
        if interleaved:
            my, mx = divmod(unit, mcus_x)
            for sc in scan:
                ci = by_id[sc["id"]]
                comp = comps[ci]
                dc_tbl = huff_dc.get(sc["td"])
                ac_tbl = huff_ac.get(sc["ta"])
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        blk = coef[ci][my * comp["v"] + by, mx * comp["h"] + bx]
                        decode_block(blk, ci, dc_tbl, ac_tbl)
        else:
            sc = scan[0]
            ci = by_id[sc["id"]]
            by, bx = divmod(unit, nbw)
            decode_block(
                coef[ci][by, bx], ci, huff_dc.get(sc["td"]), huff_ac.get(sc["ta"])
            )


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Decode a baseline or progressive JPEG → uint8 (h, w) gray or
    (h, w, 3) RGB. All scans accumulate into per-component coefficient
    stores; dequantization + IDCT run vectorized at the end."""
    buf = bytes(buf)
    qtables: Dict[int, np.ndarray] = {}
    huff_dc: Dict[int, _Huff] = {}
    huff_ac: Dict[int, _Huff] = {}
    frame = None
    restart_interval = 0
    coef: List[np.ndarray] = []

    pos = 2
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    n = len(buf)
    while pos + 2 <= n:
        if buf[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at {pos}")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RST
            pos += 2
            continue
        (size,) = struct.unpack(">H", buf[pos + 2 : pos + 4])
        payload = buf[pos + 4 : pos + 2 + size]
        end = pos + 2 + size
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                p += 1
                if pq == 0:
                    q = np.frombuffer(payload[p : p + 64], np.uint8).astype(np.int32)
                    p += 64
                else:
                    q = np.frombuffer(payload[p : p + 128], ">u2").astype(np.int32)
                    p += 128
                qtables[tq] = q  # kept in zigzag order, matching the stores
        elif marker == 0xC4:  # DHT (tables may be redefined between scans)
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                cnt = sum(bits)
                vals = list(payload[p + 17 : p + 17 + cnt])
                (huff_dc if tc == 0 else huff_ac)[th] = _Huff(bits, vals)
                p += 17 + cnt
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            precision = payload[0]
            if precision == 12 and marker == 0xC0:
                raise ValueError("baseline SOF0 is 8-bit only (T.81)")
            if precision not in (8, 12):
                raise NotImplementedError(
                    f"JPEG precision {precision} (8- and 12-bit supported)"
                )
            h, w = struct.unpack(">HH", payload[1:5])
            ncomp = payload[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = payload[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {
                "h": h,
                "w": w,
                "comps": comps,
                "progressive": marker == 0xC2,
                "precision": precision,
            }
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            coef = [
                np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32)
                for c in comps
            ]
        elif marker == 0xC3:  # SOF3 lossless sequential Huffman
            precision = payload[0]
            if not (2 <= precision <= 16):
                raise ValueError(f"lossless JPEG precision {precision}")
            h, w = struct.unpack(">HH", payload[1:5])
            ncomp = payload[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = payload[6 + 3 * c : 9 + 3 * c]
                if hv != 0x11:
                    raise NotImplementedError(
                        "lossless JPEG with subsampling unsupported"
                    )
                comps.append({"id": cid, "h": 1, "v": 1, "tq": tq})
            frame = {
                "h": h,
                "w": w,
                "comps": comps,
                "progressive": False,
                "lossless": True,
                "precision": precision,
            }
            coef = [
                np.zeros((h, w), dtype=np.int64) for _ in comps
            ]  # sample planes, not DCT stores
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG frame type SOF{marker - 0xC0} unsupported "
                "(baseline, progressive and lossless Huffman are)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            ns = payload[0]
            scan = []
            for c in range(ns):
                cs, tdta = payload[1 + 2 * c : 3 + 2 * c]
                scan.append({"id": cs, "td": tdta >> 4, "ta": tdta & 0xF})
            ss, se = payload[1 + 2 * ns], payload[2 + 2 * ns]
            ahal = payload[3 + 2 * ns]
            if frame.get("lossless"):
                # ss = predictor selection, al = point transform
                segments, end = _read_entropy(buf, end)
                _decode_lossless_scan(
                    frame, coef, scan, ss, ahal & 0xF, segments,
                    restart_interval, huff_dc,
                )
                pos = end
                continue
            if not frame["progressive"]:
                ss, se, ahal = 0, 63, 0  # baseline ignores the band fields
            segments, end = _read_entropy(buf, end)
            _decode_scan(
                frame,
                coef,
                scan,
                (ss, se, ahal >> 4, ahal & 0xF),
                segments,
                restart_interval,
                huff_dc,
                huff_ac,
            )
        pos = end

    if frame is None or not coef:
        raise ValueError("corrupt JPEG: missing SOF/SOS")

    if frame.get("lossless"):
        precision = frame["precision"]
        out_dtype = np.uint8 if precision <= 8 else np.uint16
        planes = [p.astype(out_dtype) for p in coef]
        if len(planes) == 1:
            return planes[0]
        return np.stack(planes, axis=-1)

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    h, w = frame["h"], frame["w"]
    precision = frame.get("precision", 8)
    center = float(1 << (precision - 1))
    vmaxval = (1 << precision) - 1
    out_dtype = np.uint8 if precision == 8 else np.uint16
    out_planes = []
    for c, blocks in zip(comps, coef):
        q = qtables[c["tq"]]
        deq = (blocks.astype(np.int64) * q[None, None, :])[..., UNZIGZAG]
        bh, bw = blocks.shape[:2]
        spatial = _M.T @ deq.reshape(bh, bw, 8, 8).astype(np.float64) @ _M
        plane = spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8) + center
        if c["h"] != hmax or c["v"] != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        out_planes.append(plane[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, vmaxval).astype(out_dtype)
    if len(out_planes) != 3:
        raise NotImplementedError(f"{len(out_planes)}-component JPEG unsupported")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - center)
    g = y - 0.344136 * (cb - center) - 0.714136 * (cr - center)
    b = y + 1.772 * (cb - center)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, vmaxval).astype(out_dtype)


# ---------------------------------------------------------------------------
# lossless (SOF3) mode — T.81 Annex H
# ---------------------------------------------------------------------------


def _lossless_predict(
    plane: np.ndarray, y: int, x: int, sel: int, default: int
) -> int:
    """T.81 H.1.2.2 prediction with the Annex H boundary rules."""
    if y == 0 and x == 0:
        return default
    if y == 0:
        return int(plane[0, x - 1])  # first line: always Ra
    if x == 0:
        return int(plane[y - 1, 0])  # first column: always Rb
    ra = int(plane[y, x - 1])
    rb = int(plane[y - 1, x])
    rc = int(plane[y - 1, x - 1])
    if sel == 1:
        return ra
    if sel == 2:
        return rb
    if sel == 3:
        return rc
    if sel == 4:
        return ra + rb - rc
    if sel == 5:
        return ra + ((rb - rc) >> 1)
    if sel == 6:
        return rb + ((ra - rc) >> 1)
    if sel == 7:
        return (ra + rb) >> 1
    raise ValueError(f"lossless JPEG predictor {sel} invalid (1..7)")


def _decode_lossless_scan(
    frame: dict,
    planes: List[np.ndarray],
    scan: List[dict],
    predictor: int,
    pt: int,
    segments: List[bytes],
    restart_interval: int,
    huff_dc: Dict[int, _Huff],
) -> None:
    """Decode a lossless scan (interleaved sample-MCUs or single
    component) into the sample planes. Differences are Huffman category
    + extend, SSSS=16 means +32768, arithmetic is modulo 2^16, and the
    point transform shifts the reconstructed samples left at the end
    (T.81 H.1/H.2)."""
    h, w = frame["h"], frame["w"]
    precision = frame["precision"]
    by_id = {c["id"]: i for i, c in enumerate(frame["comps"])}
    idxs = [by_id[s["id"]] for s in scan]
    tbls = [huff_dc[s["td"]] for s in scan]
    default = 1 << (precision - pt - 1)
    # decoded (pre-point-transform) sample planes for prediction
    work = [np.zeros((h, w), dtype=np.int64) for _ in scan]
    seg_idx = 0
    reader = _BitReader(segments[0])
    samples_per_rst = restart_interval  # restart counts sample-MCUs
    count = 0
    fresh = True  # prediction reset pending (start of scan / after RST)
    for y in range(h):
        for x in range(w):
            if samples_per_rst and count and count % samples_per_rst == 0:
                seg_idx += 1
                reader = _BitReader(segments[seg_idx])
                fresh = True  # T.81 H.2.2: prediction re-initializes
            for si, (ci, tbl) in enumerate(zip(idxs, tbls)):
                t = tbl.decode(reader)
                if t == 16:
                    d = 32768
                elif t:
                    d = _extend(reader.receive(t), t)
                else:
                    d = 0
                if fresh:
                    px = default
                else:
                    px = _lossless_predict(work[si], y, x, predictor, default)
                work[si][y, x] = (px + d) & 0xFFFF
            fresh = False
            count += 1
    for si, ci in enumerate(idxs):
        planes[ci][:, :] = work[si] << pt


def encode_jpeg_lossless(
    arr: np.ndarray,
    precision: Optional[int] = None,
    predictor: int = 1,
    point_transform: int = 0,
) -> bytes:
    """Encode a 2-D (gray) or (h, w, c) integer array as lossless JPEG
    (SOF3, Huffman). ``precision`` defaults to 8 for uint8 input, 16 for
    uint16. Decoding the result reproduces the input exactly (up to the
    point transform's low bits)."""
    arr = np.asarray(arr)
    if precision is None:
        precision = 8 if arr.dtype == np.uint8 else 16
    if not (2 <= precision <= 16):
        raise ValueError(f"precision {precision} out of range 2..16")
    if arr.ndim == 2:
        planes = [arr.astype(np.int64)]
    elif arr.ndim == 3:
        planes = [arr[..., c].astype(np.int64) for c in range(arr.shape[-1])]
    else:
        raise ValueError("encode_jpeg_lossless needs 2-D or (h, w, c)")
    if int(max(int(p.max(initial=0)) for p in planes)) >= (1 << precision):
        raise ValueError(f"samples exceed {precision}-bit range")
    h, w = planes[0].shape
    pt = point_transform
    shifted = [p >> pt for p in planes]
    default = 1 << (precision - pt - 1)

    dc_enc = _HuffEncoder(list(range(17)), 5)
    writer = _BitWriter()
    for y in range(h):
        for x in range(w):
            for p in shifted:
                if y == 0 and x == 0:
                    px = default
                else:
                    px = _lossless_predict(p, y, x, predictor, default)
                d = (int(p[y, x]) - px) & 0xFFFF
                if d > 32768:
                    d -= 65536
                t = 16 if d == 32768 else int(abs(d)).bit_length()
                code, ln = dc_enc.codes[t]
                writer.write(code, ln)
                if 0 < t < 16:
                    writer.write(d if d >= 0 else d + (1 << t) - 1, t)
    entropy = writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    ncomp = len(planes)
    sof = struct.pack(">BHHB", precision, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])
    out += seg(0xC3, sof)
    out += seg(
        0xC4, bytes([0x00]) + bytes(dc_enc.bits) + bytes(dc_enc.huffval)
    )
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([predictor, 0, pt])
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

# base luminance / chrominance quantization tables (T.81 Annex K.1, the
# example tables every JPEG encoder ships) in raster order
_QUANT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)
_QUANT_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


class _HuffEncoder:
    """Fixed canonical Huffman table: every symbol the same code length
    (4 bits for the 12 DC categories, 8 bits for the 162 AC symbols).
    Deliberately suboptimal but spec-conformant — the DHT segment
    carries it, so any decoder reads the file."""

    def __init__(self, symbols: List[int], length: int):
        assert len(symbols) < (1 << length)
        self.bits = [0] * 16
        self.bits[length - 1] = len(symbols)
        self.huffval = list(symbols)
        self.codes = {s: (i, length) for i, s in enumerate(symbols)}


_DC_SYMS = list(range(12))
# s=0 column covers EOB/EOB0 (0x00), EOBn (0x10..0xE0) and ZRL (0xF0)
_AC_SYMS = [r << 4 for r in range(16)] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            self.acc = (self.acc << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _csize(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(
    writer: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc: _HuffEncoder,
    ac: _HuffEncoder,
) -> int:
    diff = int(zz[0]) - pred
    t = _csize(diff)
    code, ln = dc.codes[t]
    writer.write(code, ln)
    if t:
        writer.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac.codes[0xF0]
            writer.write(code, ln)
            run -= 16
        s = _csize(v)
        code, ln = ac.codes[(run << 4) | s]
        writer.write(code, ln)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
        if k == last_nz:
            break
    if last_nz < 63:
        code, ln = ac.codes[0x00]
        writer.write(code, ln)
    return int(zz[0])


def _encode_ac_first_block(
    writer: _BitWriter, zz: np.ndarray, ss: int, se: int, al: int, ac: _HuffEncoder,
    eobrun: int,
) -> int:
    """Progressive AC first pass for one block (T.81 G.1.2.2 /
    libjpeg encode_mcu_AC_first). Returns the updated EOB run."""
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = (abs(v) >> al) * (1 if v >= 0 else -1)
        if t == 0:
            r += 1
            continue
        if eobrun > 0:
            eobrun = _emit_eobrun(writer, ac, eobrun, [])
        while r > 15:
            code, ln = ac.codes[0xF0]
            writer.write(code, ln)
            r -= 16
        s = _csize(t)
        code, ln = ac.codes[(r << 4) | s]
        writer.write(code, ln)
        writer.write(t if t >= 0 else t + (1 << s) - 1, s)
        r = 0
    if r > 0:
        eobrun += 1
        if eobrun == 0x7FFF:
            eobrun = _emit_eobrun(writer, ac, eobrun, [])
    return eobrun


def _emit_eobrun(
    writer: _BitWriter, ac: _HuffEncoder, eobrun: int, corr_bits: List[int]
) -> int:
    """Emit a pending EOBn symbol (+ extension bits), then any buffered
    refinement correction bits; returns 0 (the cleared run)."""
    if eobrun > 0:
        nbits = eobrun.bit_length() - 1
        code, ln = ac.codes[nbits << 4]
        writer.write(code, ln)
        if nbits:
            writer.write(eobrun & ((1 << nbits) - 1), nbits)
    for b in corr_bits:
        writer.write(b, 1)
    corr_bits.clear()
    return 0


def _encode_ac_refine_block(
    writer: _BitWriter, zz: np.ndarray, ss: int, se: int, al: int, ac: _HuffEncoder,
    eobrun: int, corr_bits: List[int],
) -> int:
    """Progressive AC refinement for one block (T.81 G.1.2.3 /
    libjpeg encode_mcu_AC_refine): newly-significant coefficients emit
    (run,1)+sign, history coefficients buffer correction bits flushed
    after the covering symbol. Returns the updated EOB run."""
    absval = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob = 0  # band-relative index just past the last newly-significant coef
    for i, a in enumerate(absval):
        if a == 1:
            eob = i + 1
    r = 0
    pending: List[int] = []
    for i, a in enumerate(absval):
        if a == 0:
            r += 1
            continue
        while r > 15 and i < eob:
            eobrun = _emit_eobrun(writer, ac, eobrun, corr_bits)
            code, ln = ac.codes[0xF0]
            writer.write(code, ln)
            r -= 16
            for b in pending:
                writer.write(b, 1)
            pending = []
        if a > 1:  # already significant: buffer its correction bit
            pending.append(a & 1)
            continue
        # newly significant
        eobrun = _emit_eobrun(writer, ac, eobrun, corr_bits)
        code, ln = ac.codes[(r << 4) | 1]
        writer.write(code, ln)
        writer.write(1 if int(zz[ss + i]) >= 0 else 0, 1)
        for b in pending:
            writer.write(b, 1)
        pending = []
        r = 0
    if r > 0 or pending:
        eobrun += 1
        corr_bits.extend(pending)
        if eobrun == 0x7FFF or len(corr_bits) > 937:
            eobrun = _emit_eobrun(writer, ac, eobrun, corr_bits)
    return eobrun


def _encode_progressive_scans(
    coefs: List[np.ndarray],
    sampling: List[Tuple[int, int]],
    mcus_x: int,
    mcus_y: int,
    dc_enc: _HuffEncoder,
    ac_enc: _HuffEncoder,
    h: int,
    w: int,
) -> List[Tuple[List[int], Tuple[int, int, int, int], bytes]]:
    """Successive-approximation scan script (libjpeg-style): interleaved
    DC first at Al=1 + DC refine, then per-component AC first at Al=1 +
    AC refine. Returns [(component_indices, (Ss,Se,Ah,Al), entropy)]."""
    ncomp = len(coefs)
    scans: List[Tuple[List[int], Tuple[int, int, int, int], bytes]] = []

    # scan 1: DC first, all components interleaved, Al=1
    writer = _BitWriter()
    preds = [0] * ncomp
    for mcu in range(mcus_x * mcus_y):
        my, mx = divmod(mcu, mcus_x)
        for ci, (sh, sv) in enumerate(sampling):
            for by in range(sv):
                for bx in range(sh):
                    dc = int(coefs[ci][my * sv + by, mx * sh + bx, 0]) >> 1
                    diff = dc - preds[ci]
                    preds[ci] = dc
                    t = _csize(diff)
                    code, ln = dc_enc.codes[t]
                    writer.write(code, ln)
                    if t:
                        writer.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    scans.append((list(range(ncomp)), (0, 0, 0, 1), writer.flush()))

    # scan 2: DC refinement (bit 0), all components interleaved
    writer = _BitWriter()
    for mcu in range(mcus_x * mcus_y):
        my, mx = divmod(mcu, mcus_x)
        for ci, (sh, sv) in enumerate(sampling):
            for by in range(sv):
                for bx in range(sh):
                    writer.write(int(coefs[ci][my * sv + by, mx * sh + bx, 0]) & 1, 1)
    scans.append((list(range(ncomp)), (0, 0, 1, 0), writer.flush()))

    # per component: AC first (Al=1) then AC refinement (Ah=1, Al=0).
    # Non-interleaved scans walk the component's OWN block grid
    # (ceil(scaled size / 8)), not the MCU-padded grid — T.81 A.2.2.
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    for ci, (sh, sv) in enumerate(sampling):
        blocks = coefs[ci]
        nbw = -(-(-(-w * sh // hmax)) // 8)
        nbh = -(-(-(-h * sv // vmax)) // 8)
        writer = _BitWriter()
        eobrun = 0
        for by in range(nbh):
            for bx in range(nbw):
                eobrun = _encode_ac_first_block(
                    writer, blocks[by, bx], 1, 63, 1, ac_enc, eobrun
                )
        eobrun = _emit_eobrun(writer, ac_enc, eobrun, [])
        scans.append(([ci], (1, 63, 0, 1), writer.flush()))

        writer = _BitWriter()
        eobrun = 0
        corr: List[int] = []
        for by in range(nbh):
            for bx in range(nbw):
                eobrun = _encode_ac_refine_block(
                    writer, blocks[by, bx], 1, 63, 0, ac_enc, eobrun, corr
                )
        eobrun = _emit_eobrun(writer, ac_enc, eobrun, corr)
        scans.append(([ci], (1, 63, 1, 0), writer.flush()))
    return scans


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
    precision: int = 8,
) -> bytes:
    """Encode uint8 (h, w) gray or (h, w, 3) RGB as baseline JPEG.
    ``subsample=True`` uses 4:2:0 chroma subsampling (exercises the
    decoder's upsampling path); default 4:4:4. ``restart_interval`` > 0
    emits a DRI segment and RSTn markers every that many MCUs (baseline
    only). ``progressive=True`` emits SOF2 with a successive-
    approximation scan script (DC first/refine, per-component AC
    first/refine) — same coefficients, so it decodes bit-identically to
    the baseline encoding. ``precision=12`` takes uint16 samples
    (0..4095), emits extended-sequential SOF1 (or 12-bit SOF2), 16-bit
    quantization tables scaled x16, and wider Huffman alphabets."""
    arr = np.asarray(arr)
    if precision not in (8, 12):
        raise ValueError(f"precision must be 8 or 12, got {precision}")
    want = np.uint8 if precision == 8 else np.uint16
    if arr.dtype != want:
        raise ValueError(
            f"encode_jpeg needs {np.dtype(want).name} for {precision}-bit, "
            f"got {arr.dtype}"
        )
    if precision == 12 and int(arr.max(initial=0)) > 4095:
        raise ValueError("12-bit samples must be in 0..4095")
    center = float(1 << (precision - 1))
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        planes = [arr.astype(np.float64)]
        sampling = [(1, 1)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + center
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + center
        if subsample:
            # pad to even, then 2x2 mean
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            def pad2(p):
                return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = pad2(cb).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = pad2(cr).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            sampling = [(2, 2), (1, 1), (1, 1)]
        else:
            sampling = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]

    qlum = _scaled_quant(_QUANT_LUM, quality)
    qchrom = _scaled_quant(_QUANT_CHROM, quality)
    if precision == 12:
        # scale the 8-bit-tuned base tables x16 so relative quantization
        # (and coefficient magnitudes) match the 8-bit case
        qlum = np.clip(qlum * 16, 1, 65535).astype(np.int32)
        qchrom = np.clip(qchrom * 16, 1, 65535).astype(np.int32)
    qts = [qlum] + ([qchrom] if not gray else [])
    if precision == 12:
        dc_enc = _HuffEncoder(list(range(16)), 5)
        ac_enc = _HuffEncoder(
            [r << 4 for r in range(16)]
            + [(r << 4) | s for r in range(16) for s in range(1, 15)],
            8,
        )
    else:
        dc_enc = _HuffEncoder(_DC_SYMS, 4)
        ac_enc = _HuffEncoder(_AC_SYMS, 8)

    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # pad each plane to its full MCU grid
    padded = []
    for p, (sh, sv) in zip(planes, sampling):
        th, tw = mcus_y * sv * 8, mcus_x * sh * 8
        padded.append(
            np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        )

    # _QUANT_* are raster order; the FDCT output is raster order too
    qz_lum = qlum.reshape(8, 8)
    qz_chrom = qchrom.reshape(8, 8)
    # per-component zigzag coefficient stores on the MCU-padded grid
    coefs: List[np.ndarray] = []
    for ci, (p, (sh, sv)) in enumerate(zip(padded, sampling)):
        qz = qz_lum if ci == 0 else qz_chrom
        bh, bw = p.shape[0] // 8, p.shape[1] // 8
        blocks = p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - center
        cf = np.round((_M @ blocks @ _M.T) / qz).astype(np.int64)
        coefs.append(cf.reshape(bh, bw, 64)[:, :, ZIGZAG])

    if progressive:
        scans = _encode_progressive_scans(
            coefs, sampling, mcus_x, mcus_y, dc_enc, ac_enc, h, w
        )
    else:
        writer = _BitWriter()
        preds = [0] * len(planes)
        entropy_parts: List[bytes] = []
        for mcu in range(mcus_x * mcus_y):
            if restart_interval and mcu and mcu % restart_interval == 0:
                entropy_parts.append(writer.flush())
                entropy_parts.append(
                    bytes([0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)])
                )
                writer = _BitWriter()
                preds = [0] * len(planes)
            my, mx = divmod(mcu, mcus_x)
            for ci, (sh, sv) in enumerate(sampling):
                for by in range(sv):
                    for bx in range(sh):
                        zz = coefs[ci][my * sv + by, mx * sh + bx]
                        preds[ci] = _encode_block(writer, zz, preds[ci], dc_enc, ac_enc)
        entropy_parts.append(writer.flush())
        entropy = b"".join(entropy_parts)

    # assemble segments
    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for i, q in enumerate(qts):
        if precision == 12:
            out += seg(0xDB, bytes([0x10 | i]) + q[ZIGZAG].astype(">u2").tobytes())
        else:
            out += seg(0xDB, bytes([i]) + q[ZIGZAG].astype(np.uint8).tobytes())
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", precision, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = sampling[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    if progressive:
        sof_marker = 0xC2
    else:
        sof_marker = 0xC1 if precision == 12 else 0xC0
    out += seg(sof_marker, sof)
    if restart_interval and not progressive:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    for tc, enc in ((0, dc_enc), (1, ac_enc)):
        payload = bytes([tc << 4]) + bytes(enc.bits) + bytes(enc.huffval)
        out += seg(0xC4, payload)
    if progressive:
        for scan_comps, band, scan_entropy in scans:
            sos = bytes([len(scan_comps)])
            for ci in scan_comps:
                sos += bytes([ci + 1, 0x00])
            ss, se, ah, al = band
            sos += bytes([ss, se, (ah << 4) | al])
            out += seg(0xDA, sos)
            out += scan_entropy
    else:
        sos = bytes([ncomp])
        for ci in range(ncomp):
            sos += bytes([ci + 1, 0x00])
        sos += bytes([0, 63, 0])
        out += seg(0xDA, sos)
        out += entropy
    out += b"\xff\xd9"
    return bytes(out)
