"""Minimal pure-Python JPEG2000 (ITU-T T.800) codec for GRIB2 data
representation template 5.40.

The reference reads JPEG2000-packed GRIB through cfgrib → eccodes →
openjpeg (`reference/pangeo_forge_recipes/openers.py:40-47`); this
module implements the subset those archives use, from the public
specifications only:

* raw J2K codestreams (SOC..EOC, no JP2 container — what eccodes emits)
* one component, one tile, one quality layer, LRCP progression
* reversible 5/3 wavelet (lossless — the GRIB encoding default),
  arbitrary decomposition levels
* default (maximal) precincts, code-block style 0, no SOP/EPH
* the MQ arithmetic coder of ITU-T T.88 (the 47-state table), EBCOT
  Tier-1 three-pass bit-plane coding, and Tier-2 packet headers with
  tag trees

Both a decoder (:func:`decode_j2k`) and an encoder (:func:`encode_j2k`)
are provided; the encoder exists for the GRIB writer and fixtures, and
emits conforming streams of the same subset. Everything is written from
the published algorithm descriptions (T.800 annexes B/C/D, T.88) — no
code is taken from openjpeg or any other implementation.

Performance note: EBCOT Tier-1 is context-adaptive and inherently
bit-serial — this pure-Python implementation is correctness-grade
(fixtures, small NWP tiles, tests); at production GRIB field sizes the
Spark pipeline amortizes decode across executors and messages, and a
native codec would slot in behind the same decode_j2k signature.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# MQ arithmetic coder (ITU-T T.88). State table rows: (Qe, NMPS, NLPS,
# SWITCH).
# ---------------------------------------------------------------------------

_MQ_TABLE = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)

# Tier-1 context numbering: 0-8 zero coding, 9-13 sign coding, 14-16
# magnitude refinement, 17 run-length, 18 uniform.
N_CTX = 19
_CTX_RL = 17
_CTX_UNI = 18

def _initial_states() -> List[List[int]]:
    """[state_index, mps] per context; T.800 initial states: ZC ctx 0
    starts at 4, run-length at 3, uniform at 46, the rest at 0."""
    st = [[0, 0] for _ in range(N_CTX)]
    st[0] = [4, 0]
    st[_CTX_RL] = [3, 0]
    st[_CTX_UNI] = [46, 0]
    return st


class MQDecoder:
    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.ctx = _initial_states()
        self.bp = 0
        b = data[0] if self.n else 0xFF
        self.c = b << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _byte(self, i: int) -> int:
        return self.data[i] if i < self.n else 0xFF

    def _bytein(self) -> None:
        if self._byte(self.bp) == 0xFF:
            if self._byte(self.bp + 1) > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += self._byte(self.bp) << 9
                self.ct = 7
        else:
            self.bp += 1
            self.c += self._byte(self.bp) << 8
            self.ct = 8

    def decode(self, cx: int) -> int:
        state = self.ctx[cx]
        qe, nmps, nlps, switch = _MQ_TABLE[state[0]]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange path
            if self.a < qe:
                d = state[1]
                state[0] = nmps
            else:
                d = 1 - state[1]
                if switch:
                    state[1] = 1 - state[1]
                state[0] = nlps
            self.a = qe
            self._renorm()
        else:
            self.c -= qe << 16
            if (self.a & 0x8000) == 0:
                if self.a < qe:
                    d = 1 - state[1]
                    if switch:
                        state[1] = 1 - state[1]
                    state[0] = nlps
                else:
                    d = state[1]
                    state[0] = nmps
                self._renorm()
            else:
                d = state[1]
        return d

    def _renorm(self) -> None:
        while (self.a & 0x8000) == 0:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1


class MQEncoder:
    def __init__(self):
        self.ctx = _initial_states()
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.b: Optional[int] = None  # last produced byte, not yet pushed
        self.out = bytearray()

    def encode(self, d: int, cx: int) -> None:
        state = self.ctx[cx]
        qe, nmps, nlps, switch = _MQ_TABLE[state[0]]
        if d == state[1]:  # MPS
            self.a -= qe
            if (self.a & 0x8000) == 0:
                if self.a < qe:
                    self.a = qe
                else:
                    self.c += qe
                state[0] = nmps
                self._renorm()
            else:
                self.c += qe
        else:  # LPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                state[1] = 1 - state[1]
            state[0] = nlps
            self._renorm()

    def _renorm(self) -> None:
        while True:
            if self.ct == 0:
                self._byteout()
            self.a = (self.a << 1) & 0x1FFFF
            self.c = self.c << 1
            self.ct -= 1
            if self.a & 0x8000:
                break

    def _push(self) -> None:
        if self.b is not None:
            self.out.append(self.b)

    def _byteout(self) -> None:
        if self.b == 0xFF:
            self._push()
            self.b = (self.c >> 20) & 0xFF
            self.c &= 0xFFFFF
            self.ct = 7
        else:
            if self.c < 0x8000000:
                self._push()
                self.b = (self.c >> 19) & 0xFF
                self.c &= 0x7FFFF
                self.ct = 8
            else:
                self.b += 1
                if self.b == 0xFF:
                    self.c &= 0x7FFFFFF
                    self._push()
                    self.b = (self.c >> 20) & 0xFF
                    self.c &= 0xFFFFF
                    self.ct = 7
                else:
                    self._push()
                    self.b = (self.c >> 19) & 0xFF
                    self.c &= 0x7FFFF
                    self.ct = 8

    def flush(self) -> bytes:
        # SETBITS: fill the low 16 bits of C with 1s, clamped back under
        # C + A - 1 so the decoder's interval test still resolves
        tempc = self.c + self.a - 1
        self.c |= 0xFFFF
        if self.c > tempc:
            self.c -= 0x8000
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        if self.b is not None and self.b != 0xFF:
            self._push()
        return bytes(self.out)

# ---------------------------------------------------------------------------
# packet-header bit I/O with 0xFF bit-stuffing (T.800 B.10.1)
# ---------------------------------------------------------------------------


class _HdrWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0
        self.cap = 8

    def bit(self, b: int) -> None:
        self.cur = (self.cur << 1) | (b & 1)
        self.nbits += 1
        if self.nbits == self.cap:
            self.out.append(self.cur)
            self.cap = 7 if self.cur == 0xFF else 8
            self.cur = 0
            self.nbits = 0

    def bits(self, value: int, n: int) -> None:
        for k in range(n - 1, -1, -1):
            self.bit((value >> k) & 1)

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.cur << (self.cap - self.nbits))
        elif self.out and self.out[-1] == 0xFF:
            self.out.append(0x00)
        return bytes(self.out)


class _HdrReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0
        self.prev = 0

    def bit(self) -> int:
        if self.nbits == 0:
            self.cur = self.data[self.pos]
            self.pos += 1
            self.nbits = 7 if self.prev == 0xFF else 8
            self.prev = self.cur
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> int:
        """End of packet header: discard partial bits; a header whose
        last byte is 0xFF is followed by a stuffing byte."""
        self.nbits = 0
        if self.prev == 0xFF:
            self.pos += 1
        return self.pos


# ---------------------------------------------------------------------------
# tag trees (T.800 B.10.2)
# ---------------------------------------------------------------------------


class _TagTree:
    def __init__(self, w: int, h: int):
        self.levels: List[Tuple[int, int]] = []
        while True:
            self.levels.append((w, h))
            if w == 1 and h == 1:
                break
            w = (w + 1) // 2
            h = (h + 1) // 2
        # per level: value, low(er bound), known arrays
        self.value = [np.zeros((lh, lw), dtype=np.int64) for lw, lh in self.levels]
        self.low = [np.zeros((lh, lw), dtype=np.int64) for lw, lh in self.levels]
        self.known = [np.zeros((lh, lw), dtype=bool) for lw, lh in self.levels]

    def set_values(self, vals: np.ndarray) -> None:
        """Fill leaf values and propagate mins upward (encoder side)."""
        self.value[0][:, :] = vals
        for lv in range(1, len(self.levels)):
            prev = self.value[lv - 1]
            lw, lh = self.levels[lv]
            cur = np.full((lh, lw), np.iinfo(np.int64).max, dtype=np.int64)
            ph, pw = prev.shape
            for dy in (0, 1):
                for dx in (0, 1):
                    sub = prev[dy:ph:2, dx:pw:2]
                    cur[: sub.shape[0], : sub.shape[1]] = np.minimum(
                        cur[: sub.shape[0], : sub.shape[1]], sub
                    )
            self.value[lv][:, :] = cur

    def _path(self, i: int, j: int) -> List[Tuple[int, int, int]]:
        out = []
        for lv in range(len(self.levels) - 1, -1, -1):
            out.append((lv, i >> lv, j >> lv))
        return out

    def encode(self, bw: _HdrWriter, i: int, j: int, threshold: int) -> None:
        low = 0
        for lv, y, x in self._path(i, j):
            if low > self.low[lv][y, x]:
                self.low[lv][y, x] = low
            else:
                low = int(self.low[lv][y, x])
            while low < threshold:
                if low >= self.value[lv][y, x]:
                    if not self.known[lv][y, x]:
                        bw.bit(1)
                        self.known[lv][y, x] = True
                    break
                bw.bit(0)
                low += 1
            self.low[lv][y, x] = low

    def decode(self, br: _HdrReader, i: int, j: int, threshold: int) -> Optional[int]:
        """Return the leaf value if it is < threshold, else None (value
        is only known to be >= the running lower bound)."""
        low = 0
        for lv, y, x in self._path(i, j):
            if low > self.low[lv][y, x]:
                self.low[lv][y, x] = low
            low = int(self.low[lv][y, x])
            while not self.known[lv][y, x] and low < threshold:
                if br.bit():
                    self.known[lv][y, x] = True
                else:
                    low += 1
            self.low[lv][y, x] = low
            if not self.known[lv][y, x]:
                return None
        return low

# ---------------------------------------------------------------------------
# Tier-1: EBCOT bit-plane coding of one code-block (T.800 annex D).
# Contexts: zero coding 0-8 (band-dependent neighbor tables), sign
# coding 9-13 with XOR bit, magnitude refinement 14-16, run-length 17,
# uniform 18.
# ---------------------------------------------------------------------------

# zero-coding context from (sum_h, sum_v, sum_d), per subband family
def _zc_context(band: str, h: int, v: int, d: int) -> int:
    if band == "HL":  # transpose rule
        h, v = v, h
    if band in ("LL", "LH", "HL"):
        if h == 2:
            return 8
        if h == 1:
            if v >= 1:
                return 7
            return 6 if d >= 1 else 5
        if v == 2:
            return 4
        if v == 1:
            return 3
        if d >= 2:
            return 2
        return d  # 1 -> 1, 0 -> 0
    # HH
    hv = h + v
    if d >= 3:
        return 8
    if d == 2:
        return 7 if hv >= 1 else 6
    if d == 1:
        if hv >= 2:
            return 5
        return 4 if hv == 1 else 3
    if hv >= 2:
        return 2
    return hv  # 1 -> 1, 0 -> 0


# sign-coding context + xor from clamped neighbor contributions
_SC_TABLE = {
    (1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
    (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
    (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1),
}


class _T1Block:
    """Shared scan/context machinery for one code-block. Coefficient
    state lives in (h+2, w+2) padded arrays so neighbor lookups never
    branch on borders."""

    def __init__(self, w: int, h: int, band: str):
        self.w, self.h, self.band = w, h, band
        self.sig = np.zeros((h + 2, w + 2), dtype=np.uint8)
        self.sgn = np.zeros((h + 2, w + 2), dtype=np.int8)  # 1 / -1
        self.visited = np.zeros((h + 2, w + 2), dtype=np.uint8)  # pi
        self.refined = np.zeros((h + 2, w + 2), dtype=np.uint8)  # mu
        self.mag = np.zeros((h, w), dtype=np.int64)

    def _sums(self, y: int, x: int) -> Tuple[int, int, int]:
        s = self.sig
        hh = int(s[y, x - 1]) + int(s[y, x + 1])
        vv = int(s[y - 1, x]) + int(s[y + 1, x])
        dd = (
            int(s[y - 1, x - 1]) + int(s[y - 1, x + 1])
            + int(s[y + 1, x - 1]) + int(s[y + 1, x + 1])
        )
        return hh, vv, dd

    def _sign_ctx(self, y: int, x: int) -> Tuple[int, int]:
        s, g = self.sig, self.sgn
        hc = int(s[y, x - 1]) * int(g[y, x - 1]) + int(s[y, x + 1]) * int(g[y, x + 1])
        vc = int(s[y - 1, x]) * int(g[y - 1, x]) + int(s[y + 1, x]) * int(g[y + 1, x])
        hc = max(-1, min(1, hc))
        vc = max(-1, min(1, vc))
        return _SC_TABLE[(hc, vc)]

    def _mr_ctx(self, y: int, x: int) -> int:
        if self.refined[y, x]:
            return 16
        hh, vv, dd = self._sums(y, x)
        return 15 if (hh + vv + dd) else 14


class T1Decoder(_T1Block):
    def __init__(self, w: int, h: int, band: str, mq: MQDecoder):
        super().__init__(w, h, band)
        self.mq = mq

    def _decode_sign(self, y: int, x: int) -> None:
        cx, xor = self._sign_ctx(y, x)
        bit = self.mq.decode(cx)
        self.sgn[y, x] = -1 if (bit ^ xor) else 1

    def sig_pass(self, p: int) -> None:
        mq = self.mq
        for k0 in range(0, self.h, 4):
            for j in range(self.w):
                x = j + 1
                for i in range(k0, min(k0 + 4, self.h)):
                    y = i + 1
                    if self.sig[y, x]:
                        continue
                    hh, vv, dd = self._sums(y, x)
                    if hh + vv + dd == 0:
                        continue
                    self.visited[y, x] = 1
                    if mq.decode(_zc_context(self.band, hh, vv, dd)):
                        self.sig[y, x] = 1
                        self.mag[i, j] |= 1 << p
                        self._decode_sign(y, x)

    def ref_pass(self, p: int) -> None:
        mq = self.mq
        for k0 in range(0, self.h, 4):
            for j in range(self.w):
                x = j + 1
                for i in range(k0, min(k0 + 4, self.h)):
                    y = i + 1
                    if not self.sig[y, x] or self.visited[y, x]:
                        continue
                    bit = mq.decode(self._mr_ctx(y, x))
                    self.refined[y, x] = 1
                    if bit:
                        self.mag[i, j] |= 1 << p

    def cleanup_pass(self, p: int) -> None:
        mq = self.mq
        for k0 in range(0, self.h, 4):
            full = k0 + 4 <= self.h
            for j in range(self.w):
                x = j + 1
                start = k0
                if full:
                    # run-length mode: whole column insignificant,
                    # unvisited, and with no significant neighbors
                    rl = True
                    for i in range(k0, k0 + 4):
                        y = i + 1
                        if self.sig[y, x] or self.visited[y, x]:
                            rl = False
                            break
                        hh, vv, dd = self._sums(y, x)
                        if hh + vv + dd:
                            rl = False
                            break
                    if rl:
                        if not mq.decode(_CTX_RL):
                            continue
                        r = (mq.decode(_CTX_UNI) << 1) | mq.decode(_CTX_UNI)
                        i = k0 + r
                        y = i + 1
                        self.sig[y, x] = 1
                        self.mag[i, j] |= 1 << p
                        self._decode_sign(y, x)
                        start = i + 1
                for i in range(start, min(k0 + 4, self.h)):
                    y = i + 1
                    if self.sig[y, x] or self.visited[y, x]:
                        continue
                    hh, vv, dd = self._sums(y, x)
                    if mq.decode(_zc_context(self.band, hh, vv, dd)):
                        self.sig[y, x] = 1
                        self.mag[i, j] |= 1 << p
                        self._decode_sign(y, x)
        self.visited[:, :] = 0

    def decode(self, npasses: int, max_plane: int) -> np.ndarray:
        """Run ``npasses`` passes starting with the cleanup of plane
        ``max_plane``; returns the signed coefficient array."""
        p = max_plane
        done = 0
        while done < npasses:
            if p == max_plane:
                self.cleanup_pass(p)
                done += 1
            else:
                if done < npasses:
                    self.sig_pass(p)
                    done += 1
                if done < npasses:
                    self.ref_pass(p)
                    done += 1
                if done < npasses:
                    self.cleanup_pass(p)
                    done += 1
            p -= 1
        out = self.mag.copy()
        neg = self.sgn[1 : self.h + 1, 1 : self.w + 1] < 0
        out[neg] = -out[neg]
        return out


class T1Encoder(_T1Block):
    def __init__(self, coeffs: np.ndarray, band: str):
        h, w = coeffs.shape
        super().__init__(w, h, band)
        self.vals = np.abs(coeffs).astype(np.int64)
        self.neg = coeffs < 0
        self.mq = MQEncoder()

    def _encode_sign(self, y: int, x: int, i: int, j: int) -> None:
        cx, xor = self._sign_ctx(y, x)
        s = 1 if self.neg[i, j] else 0
        self.mq.encode(s ^ xor, cx)
        self.sgn[y, x] = -1 if self.neg[i, j] else 1

    def sig_pass(self, p: int) -> None:
        mq = self.mq
        for k0 in range(0, self.h, 4):
            for j in range(self.w):
                x = j + 1
                for i in range(k0, min(k0 + 4, self.h)):
                    y = i + 1
                    if self.sig[y, x]:
                        continue
                    hh, vv, dd = self._sums(y, x)
                    if hh + vv + dd == 0:
                        continue
                    self.visited[y, x] = 1
                    bit = (self.vals[i, j] >> p) & 1
                    mq.encode(bit, _zc_context(self.band, hh, vv, dd))
                    if bit:
                        self.sig[y, x] = 1
                        self._encode_sign(y, x, i, j)

    def ref_pass(self, p: int) -> None:
        mq = self.mq
        for k0 in range(0, self.h, 4):
            for j in range(self.w):
                x = j + 1
                for i in range(k0, min(k0 + 4, self.h)):
                    y = i + 1
                    if not self.sig[y, x] or self.visited[y, x]:
                        continue
                    mq.encode(int((self.vals[i, j] >> p) & 1), self._mr_ctx(y, x))
                    self.refined[y, x] = 1

    def cleanup_pass(self, p: int) -> None:
        mq = self.mq
        for k0 in range(0, self.h, 4):
            full = k0 + 4 <= self.h
            for j in range(self.w):
                x = j + 1
                start = k0
                if full:
                    rl = True
                    for i in range(k0, k0 + 4):
                        y = i + 1
                        if self.sig[y, x] or self.visited[y, x]:
                            rl = False
                            break
                        hh, vv, dd = self._sums(y, x)
                        if hh + vv + dd:
                            rl = False
                            break
                    if rl:
                        r = -1
                        for i in range(k0, k0 + 4):
                            if (self.vals[i, j] >> p) & 1:
                                r = i - k0
                                break
                        if r < 0:
                            mq.encode(0, _CTX_RL)
                            continue
                        mq.encode(1, _CTX_RL)
                        mq.encode((r >> 1) & 1, _CTX_UNI)
                        mq.encode(r & 1, _CTX_UNI)
                        i = k0 + r
                        y = i + 1
                        self.sig[y, x] = 1
                        self._encode_sign(y, x, i, j)
                        start = i + 1
                for i in range(start, min(k0 + 4, self.h)):
                    y = i + 1
                    if self.sig[y, x] or self.visited[y, x]:
                        continue
                    hh, vv, dd = self._sums(y, x)
                    bit = int((self.vals[i, j] >> p) & 1)
                    mq.encode(bit, _zc_context(self.band, hh, vv, dd))
                    if bit:
                        self.sig[y, x] = 1
                        self._encode_sign(y, x, i, j)
        self.visited[:, :] = 0

    def encode(self) -> Tuple[bytes, int, int]:
        """Encode all bit-planes; returns (data, npasses, nplanes) where
        nplanes counts coded magnitude planes (0 -> empty block)."""
        vmax = int(self.vals.max()) if self.vals.size else 0
        if vmax == 0:
            return b"", 0, 0
        nplanes = vmax.bit_length()
        npasses = 3 * nplanes - 2
        for idx, p in enumerate(range(nplanes - 1, -1, -1)):
            if idx == 0:
                self.cleanup_pass(p)
            else:
                self.sig_pass(p)
                self.ref_pass(p)
                self.cleanup_pass(p)
        return self.mq.flush(), npasses, nplanes

# ---------------------------------------------------------------------------
# reversible 5/3 wavelet (T.800 annex F), integer lifting, whole-sample
# symmetric extension. Forward applies the vertical split then the
# horizontal one; inverse mirrors (horizontal, then vertical).
# ---------------------------------------------------------------------------


def _fwd53_1d(x: np.ndarray, axis: int) -> Tuple[np.ndarray, np.ndarray]:
    x = np.moveaxis(x, axis, 0).astype(np.int64)
    n = x.shape[0]
    if n == 1:
        return np.moveaxis(x, 0, axis), np.moveaxis(x[:0], 0, axis)
    ev = x[0::2]
    od = x[1::2]
    nh = od.shape[0]
    # H[k] = x[2k+1] - floor((x[2k] + x[2k+2]) / 2); x[n] extends to x[n-2]
    nxt = np.concatenate([ev[1:nh], ev[nh - 1 : nh]]) if n % 2 == 0 else ev[1 : nh + 1]
    hi = od - ((ev[:nh] + nxt) >> 1)
    # L[k] = x[2k] + floor((H[k-1] + H[k] + 2) / 4)
    nl = ev.shape[0]
    hprev = np.concatenate([hi[0:1], hi[: nl - 1]])
    hnext = hi[:nl] if nl <= nh else np.concatenate([hi, hi[-1:]])
    lo = ev + ((hprev + hnext + 2) >> 2)
    return np.moveaxis(lo, 0, axis), np.moveaxis(hi, 0, axis)


def _inv53_1d(lo: np.ndarray, hi: np.ndarray, axis: int) -> np.ndarray:
    lo = np.moveaxis(lo, axis, 0).astype(np.int64)
    hi = np.moveaxis(hi, axis, 0).astype(np.int64)
    nl, nh = lo.shape[0], hi.shape[0]
    n = nl + nh
    if nh == 0:
        return np.moveaxis(lo, 0, axis)
    # x[2k] = L[k] - floor((H[k-1] + H[k] + 2) / 4)
    hprev = np.concatenate([hi[0:1], hi[: nl - 1]])
    hnext = hi[:nl] if nl <= nh else np.concatenate([hi, hi[-1:]])
    ev = lo - ((hprev + hnext + 2) >> 2)
    # x[2k+1] = H[k] + floor((x[2k] + x[2k+2]) / 2)
    enext = ev[1 : nh + 1] if nh < nl else np.concatenate([ev[1:], ev[-1:]])
    od = hi + ((ev[:nh] + enext) >> 1)
    out = np.empty((n,) + lo.shape[1:], dtype=np.int64)
    out[0::2] = ev
    out[1::2] = od
    return np.moveaxis(out, 0, axis)


def _fwd53_2d(a: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    lo_v, hi_v = _fwd53_1d(a, 0)
    ll, hl = _fwd53_1d(lo_v, 1)
    lh, hh = _fwd53_1d(hi_v, 1)
    return ll, hl, lh, hh


def _inv53_2d(
    ll: np.ndarray, hl: np.ndarray, lh: np.ndarray, hh: np.ndarray
) -> np.ndarray:
    lo_v = _inv53_1d(ll, hl, 1)
    hi_v = _inv53_1d(lh, hh, 1)
    return _inv53_1d(lo_v, hi_v, 0)


# 9/7 irreversible (CDF) lifting constants, ITU-T T.800 Annex F; the
# scaling convention (lowpass x 1/K, highpass x K) is pinned against the
# normative Table F.4 analysis taps in tests/test_jp2kio.py.
_A97 = -1.586134342059924
_B97 = -0.052980118572961
_G97 = 0.882911075530934
_D97 = 0.443506852043971
_K97 = 1.230174104914001


def _lift97(y: np.ndarray, coef: float, parity: int) -> None:
    """One lifting step in place: y[i] += coef*(y[i-1]+y[i+1]) for all i
    of the given parity, with whole-sample symmetric extension."""
    n = y.shape[0]
    idx = np.arange(parity, n, 2)
    left = np.abs(idx - 1)
    right = idx + 1
    right = np.where(right >= n, 2 * (n - 1) - right, right)
    y[idx] += coef * (y[left] + y[right])


def _fwd97_1d(x: np.ndarray, axis: int) -> Tuple[np.ndarray, np.ndarray]:
    x = np.moveaxis(x, axis, 0).astype(np.float64)
    n = x.shape[0]
    if n == 1:
        return np.moveaxis(x, 0, axis), np.moveaxis(x[:0], 0, axis)
    y = x.copy()
    _lift97(y, _A97, 1)
    _lift97(y, _B97, 0)
    _lift97(y, _G97, 1)
    _lift97(y, _D97, 0)
    lo = y[0::2] / _K97
    hi = y[1::2] * _K97
    return np.moveaxis(lo, 0, axis), np.moveaxis(hi, 0, axis)


def _inv97_1d(lo: np.ndarray, hi: np.ndarray, axis: int) -> np.ndarray:
    lo = np.moveaxis(lo, axis, 0).astype(np.float64)
    hi = np.moveaxis(hi, axis, 0).astype(np.float64)
    nl, nh = lo.shape[0], hi.shape[0]
    n = nl + nh
    if nh == 0:
        return np.moveaxis(lo, 0, axis)
    y = np.empty((n,) + lo.shape[1:], dtype=np.float64)
    y[0::2] = lo * _K97
    y[1::2] = hi / _K97
    _lift97(y, -_D97, 0)
    _lift97(y, -_G97, 1)
    _lift97(y, -_B97, 0)
    _lift97(y, -_A97, 1)
    return np.moveaxis(y, 0, axis)


def _fwd97_2d(a: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    lo_v, hi_v = _fwd97_1d(a, 0)
    ll, hl = _fwd97_1d(lo_v, 1)
    lh, hh = _fwd97_1d(hi_v, 1)
    return ll, hl, lh, hh


def _inv97_2d(
    ll: np.ndarray, hl: np.ndarray, lh: np.ndarray, hh: np.ndarray
) -> np.ndarray:
    lo_v = _inv97_1d(ll, hl, 1)
    hi_v = _inv97_1d(lh, hh, 1)
    return _inv97_1d(lo_v, hi_v, 0)


def _quant_step(depth: int, band: str, eps: int, mant: int) -> float:
    """T.800 Eq E-3: Δ_b = 2^(R_b − ε_b) · (1 + μ_b / 2^11), with
    R_b = component depth + band gain."""
    rb = depth + _BAND_GAIN[band]
    return float(2.0 ** (rb - eps) * (1.0 + mant / 2048.0))


def _step_to_eps_mant(step: float, depth: int, band: str) -> Tuple[int, int]:
    """Quantization step -> (ε_b, μ_b), the closest representable Δ."""
    import math as _math

    rb = depth + _BAND_GAIN[band]
    e2 = _math.floor(_math.log2(step))
    mant = int(round((step / 2.0**e2 - 1.0) * 2048.0))
    if mant >= 2048:
        mant = 0
        e2 += 1
    eps = rb - e2
    if not (0 <= eps <= 31):
        raise ValueError(f"quantization step {step} out of range for {band}")
    return eps, mant


# ---------------------------------------------------------------------------
# structure helpers
# ---------------------------------------------------------------------------

_BAND_GAIN = {"LL": 0, "HL": 1, "LH": 1, "HH": 2}


def _resolution_bands(h: int, w: int, nl: int) -> List[List[Tuple[str, int, int]]]:
    """Per resolution r (0..nl): list of (band_name, bh, bw)."""
    dims = [(h, w)]
    for _ in range(nl):
        ph, pw = dims[-1]
        dims.append(((ph + 1) // 2, (pw + 1) // 2))
    out: List[List[Tuple[str, int, int]]] = []
    llh, llw = dims[nl]
    out.append([("LL", llh, llw)])
    for r in range(1, nl + 1):
        lvl = nl - r + 1
        ph, pw = dims[lvl - 1]
        lo_h, hi_h = (ph + 1) // 2, ph // 2
        lo_w, hi_w = (pw + 1) // 2, pw // 2
        out.append([("HL", lo_h, hi_w), ("LH", hi_h, lo_w), ("HH", hi_h, hi_w)])
    return out


def _codeblocks(bh: int, bw: int, cb: int) -> List[Tuple[int, int, int, int]]:
    """(y0, x0, h, w) tiles of a bh x bw subband on the cb grid."""
    out = []
    for y0 in range(0, bh, cb):
        for x0 in range(0, bw, cb):
            out.append((y0, x0, min(cb, bh - y0), min(cb, bw - x0)))
    return out


def _write_npasses(bw: _HdrWriter, n: int) -> None:
    if n == 1:
        bw.bit(0)
    elif n == 2:
        bw.bits(0b10, 2)
    elif n <= 5:
        bw.bits(0b11, 2)
        bw.bits(n - 3, 2)
    elif n <= 36:
        bw.bits(0b1111, 4)
        bw.bits(n - 6, 5)
    elif n <= 164:
        bw.bits(0b111111111, 9)
        bw.bits(n - 37, 7)
    else:
        raise ValueError(f"cannot signal {n} coding passes")


def _read_npasses(br: _HdrReader) -> int:
    if not br.bit():
        return 1
    if not br.bit():
        return 2
    v = br.bits(2)
    if v < 3:
        return 3 + v
    v = br.bits(5)
    if v < 31:
        return 6 + v
    return 37 + br.bits(7)

# ---------------------------------------------------------------------------
# top level: codestream encode / decode
# ---------------------------------------------------------------------------

_SOC, _SIZ, _COD, _QCD, _COM = 0xFF4F, 0xFF51, 0xFF52, 0xFF5C, 0xFF64
_SOT, _SOD, _EOC = 0xFF90, 0xFF93, 0xFFD9
# informational markers safe to skip: COM, TLM, PLM, PLT, CRG. (PPM/PPT
# are NOT skippable — they relocate packet headers — and raise below.)
_SKIPPABLE = {0xFF64, 0xFF55, 0xFF57, 0xFF58, 0xFF63}


def _encode_tile_packets(
    coeffs: List[List[np.ndarray]],
    bands_per_res: List[List[Tuple[str, int, int]]],
    levels: int,
    cb: int,
    guard: int,
    depth: int,
    irreversible: bool,
    band_eps_mant: List[List[Tuple[int, int]]],
) -> bytes:
    """Tier-1 each codeblock and assemble the tile's Tier-2 packets
    (one LRCP packet per resolution)."""
    body = bytearray()
    for r in range(levels + 1):
        blocks = []  # per band: [(data, npasses, zb)]
        trees = []
        for b_idx, (bname, bh, bw) in enumerate(bands_per_res[r]):
            if irreversible:
                eps = band_eps_mant[r][b_idx][0]
            else:
                eps = depth + _BAND_GAIN[bname]
            mb = eps + guard - 1
            cbs = _codeblocks(bh, bw, cb) if bh and bw else []
            ncx = (bw + cb - 1) // cb if bw else 0
            ncy = (bh + cb - 1) // cb if bh else 0
            incl = _TagTree(max(ncx, 1), max(ncy, 1)) if cbs else None
            zbt = _TagTree(max(ncx, 1), max(ncy, 1)) if cbs else None
            arr = coeffs[r][b_idx]
            infos = []
            for y0, x0, ch, cw in cbs:
                enc = T1Encoder(arr[y0 : y0 + ch, x0 : x0 + cw], bname)
                data, npasses, nplanes = enc.encode()
                if nplanes > mb:
                    raise ValueError(
                        f"coefficient needs {nplanes} planes > Mb={mb}"
                    )
                infos.append((data, npasses, mb - nplanes))
            trees.append((incl, zbt, ncx, ncy))
            blocks.append(infos)
        hw = _HdrWriter()
        any_included = any(
            info[1] > 0 for infos in blocks for info in infos
        )
        hw.bit(1 if any_included else 0)
        bodies = bytearray()
        if any_included:
            for b_idx, infos in enumerate(blocks):
                incl, zbt, ncx, ncy = trees[b_idx]
                if not infos:
                    continue
                incl_vals = np.array(
                    [[0 if infos[cy * ncx + cx][1] > 0 else 1 for cx in range(ncx)]
                     for cy in range(ncy)], dtype=np.int64)
                zb_vals = np.array(
                    [[infos[cy * ncx + cx][2] for cx in range(ncx)]
                     for cy in range(ncy)], dtype=np.int64)
                incl.set_values(incl_vals)
                zbt.set_values(zb_vals)
                for cy in range(ncy):
                    for cx in range(ncx):
                        data, npasses, zb = infos[cy * ncx + cx]
                        incl.encode(hw, cy, cx, 1)
                        if npasses == 0:
                            continue
                        zbt.encode(hw, cy, cx, zb + 1)
                        _write_npasses(hw, npasses)
                        # length: Lblock (init 3) + floor(log2(npasses))
                        lblock = 3
                        nb = lblock + int(np.floor(np.log2(npasses)))
                        need = max(len(data).bit_length(), 1)
                        k = max(0, need - nb)
                        for _ in range(k):
                            hw.bit(1)
                        hw.bit(0)
                        lblock += k
                        nb += k
                        hw.bits(len(data), nb)
                        bodies += data
        body += hw.flush() + bodies
    return bytes(body)


def encode_j2k(
    img: np.ndarray,
    depth: int,
    levels: int = 5,
    signed: bool = False,
    cblk_exp: int = 6,
    irreversible: bool = False,
    qstep: float = 1.0 / 512,
    tile_size: Optional[Tuple[int, int]] = None,
) -> bytes:
    """Encode a 2-D integer array as a J2K codestream: one component,
    one layer, LRCP. Reversible 5/3 by default; with
    ``irreversible=True`` the 9/7 wavelet + scalar quantization at
    ``qstep`` (expounded style, same Δ target for every band) is used —
    the lossy path of GRIB template 5.40 ECMWF products.
    ``tile_size=(th, tw)`` splits the image into independently coded
    tiles (one tile-part per tile, raster order)."""
    img = np.asarray(img)
    if img.ndim != 2:
        raise ValueError("encode_j2k needs a 2-D array")
    h, w = img.shape
    if h == 0 or w == 0:
        raise ValueError("cannot encode an empty image")
    levels = max(0, min(levels, max(int(np.ceil(np.log2(max(h, w)))), 0)))
    cb = 1 << cblk_exp
    guard = 2
    x = img.astype(np.int64)
    if not signed:
        x = x - (1 << (depth - 1))
    t_h, t_w = tile_size if tile_size is not None else (h, w)
    if t_h <= 0 or t_w <= 0:
        raise ValueError(f"invalid tile_size {tile_size}")

    # QCD entries depend only on band name/gain, not tile dims
    band_eps_mant: List[List[Tuple[int, int]]] = [[] for _ in range(levels + 1)]
    if irreversible:
        band_eps_mant[0].append(_step_to_eps_mant(qstep, depth, "LL"))
        for r in range(1, levels + 1):
            for bname in ("HL", "LH", "HH"):
                band_eps_mant[r].append(
                    _step_to_eps_mant(qstep, depth, bname)
                )

    def tile_body(xt: np.ndarray) -> bytes:
        th_, tw_ = xt.shape
        bands_per_res = _resolution_bands(th_, tw_, levels)
        coeffs: List[List[np.ndarray]] = [[] for _ in range(levels + 1)]
        if irreversible:
            ll_f = xt.astype(np.float64)
            fcoeffs: List[List[np.ndarray]] = [[] for _ in range(levels + 1)]
            for r in range(levels, 0, -1):
                ll_f, hl, lh, hh = _fwd97_2d(ll_f)
                fcoeffs[r] = [hl, lh, hh]
            fcoeffs[0] = [ll_f]
            for r in range(levels + 1):
                for b_idx, (bname, _, _) in enumerate(bands_per_res[r]):
                    eps_b, mant_b = band_eps_mant[r][b_idx]
                    delta = _quant_step(depth, bname, eps_b, mant_b)
                    v = fcoeffs[r][b_idx]
                    coeffs[r].append(
                        (np.sign(v) * np.floor(np.abs(v) / delta)).astype(np.int64)
                    )
        else:
            ll = xt
            for r in range(levels, 0, -1):
                ll, hl, lh, hh = _fwd53_2d(ll)
                coeffs[r] = [hl, lh, hh]
            coeffs[0] = [ll]
        return _encode_tile_packets(
            coeffs, bands_per_res, levels, cb, guard, depth,
            irreversible, band_eps_mant,
        )

    # markers
    out = bytearray()
    out += struct.pack(">H", _SOC)
    siz = struct.pack(
        ">HIIIIIIIIH", 0, w, h, 0, 0, t_w, t_h, 0, 0, 1
    ) + bytes([(0x80 if signed else 0) | (depth - 1), 1, 1])
    out += struct.pack(">HH", _SIZ, len(siz) + 2) + siz
    spcod = bytes(
        [levels, cblk_exp - 2, cblk_exp - 2, 0, 0 if irreversible else 1]
    )
    cod = bytes([0]) + bytes([0, 0, 1, 0]) + spcod  # Scod, SGcod(prog,layers,mct)
    out += struct.pack(">HH", _COD, len(cod) + 2) + cod
    nsub = 3 * levels + 1
    if irreversible:
        # scalar expounded (style 2): one 16-bit (ε, μ) entry per subband
        qcd = bytearray([(guard << 5) | 0x02])
        for r in range(levels + 1):
            for eps_b, mant_b in band_eps_mant[r]:
                qcd += struct.pack(">H", (eps_b << 11) | mant_b)
        assert len(qcd) == 1 + 2 * nsub
        out += struct.pack(">HH", _QCD, len(qcd) + 2) + bytes(qcd)
    else:
        exps = bytearray([(guard << 5) | 0x00])
        # subband order for QCD: LL, then per level (coarse..fine) HL, LH, HH
        exps.append((depth + 0) << 3)
        for r in range(1, levels + 1):
            for g in (1, 1, 2):
                exps.append((depth + g) << 3)
        assert len(exps) == nsub + 1
        out += struct.pack(">HH", _QCD, len(exps) + 2) + bytes(exps)
    isot = 0
    for ty0 in range(0, h, t_h):
        for tx0 in range(0, w, t_w):
            body = tile_body(
                x[ty0 : ty0 + min(t_h, h - ty0), tx0 : tx0 + min(t_w, w - tx0)]
            )
            psot = 12 + 2 + len(body)
            out += struct.pack(">HHHIBB", _SOT, 10, isot, psot, 0, 1)
            out += struct.pack(">H", _SOD)
            out += body
            isot += 1
    out += struct.pack(">H", _EOC)
    return bytes(out)


_JP2_SIG = b"\x00\x00\x00\x0cjP  \r\n\x87\n"


def _unwrap_jp2(data: bytes) -> bytes:
    """Extract the raw codestream from a JP2 box container (ISO 15444-1
    annex I): walk the box sequence to the ``jp2c`` box."""
    pos = 0
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        header = 8
        if length == 1:  # 64-bit extended length
            (length,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            header = 16
        elif length == 0:  # box runs to end of file
            length = n - pos
        if btype == b"jp2c":
            return data[pos + header : pos + length]
        if length < header:
            break
        pos += length
    raise ValueError("JP2 container holds no jp2c codestream box")


def decode_j2k(data: bytes) -> Tuple[np.ndarray, int, bool]:
    """Decode a J2K codestream of the supported subset; returns
    (2-D int64 array, bit depth, signed). Accepts both raw codestreams
    (SOC-first — what GRIB carries) and JP2 box containers."""
    data = bytes(data)
    if data.startswith(_JP2_SIG):
        data = bytes(_unwrap_jp2(data))
    if len(data) < 4 or struct.unpack(">H", data[:2])[0] != _SOC:
        raise ValueError("not a J2K codestream (missing SOC)")
    pos = 2
    w = h = depth = None
    tile_w = tile_h = None
    signed = False
    irreversible = False
    levels = cblk_exp = None
    guard = qentries = qstyle = None
    tile_bodies: Dict[int, Tuple[int, int]] = {}
    while pos < len(data):
        (marker,) = struct.unpack(">H", data[pos : pos + 2])
        pos += 2
        if marker == _EOC:
            break
        if marker == _SOD:
            raise ValueError("SOD before SOT")
        (ln,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + ln]
        if marker == _SIZ:
            rsiz, xs, ys, xo, yo, xt, yt, xto, yto, ncomp = struct.unpack(
                ">HIIIIIIIIH", seg[:36]
            )
            if ncomp != 1:
                raise NotImplementedError(
                    f"J2K with {ncomp} components unsupported (1 only)"
                )
            if (xo, yo, xto, yto) != (0, 0, 0, 0):
                raise NotImplementedError("J2K image/tile offsets unsupported")
            ssiz, xr, yr = seg[36], seg[37], seg[38]
            if (xr, yr) != (1, 1):
                raise NotImplementedError("J2K subsampling unsupported")
            w, h = xs, ys
            tile_w, tile_h = xt, yt
            depth = (ssiz & 0x7F) + 1
            signed = bool(ssiz & 0x80)
        elif marker == _COD:
            scod = seg[0]
            if scod & 0x01:
                raise NotImplementedError("J2K user precincts unsupported")
            if scod & 0x06:
                raise NotImplementedError("J2K SOP/EPH markers unsupported")
            prog, nlayers, mct = seg[1], struct.unpack(">H", seg[2:4])[0], seg[4]
            if prog != 0:
                raise NotImplementedError(
                    f"J2K progression order {prog} unsupported (LRCP only)"
                )
            if nlayers != 1:
                raise NotImplementedError(
                    f"J2K {nlayers} quality layers unsupported (1 only)"
                )
            levels = seg[5]
            cblk_exp = (seg[6] & 0x0F) + 2
            if (seg[7] & 0x0F) + 2 != cblk_exp:
                raise NotImplementedError("non-square code-blocks unsupported")
            if seg[8] != 0:
                raise NotImplementedError(
                    f"J2K code-block style {seg[8]:#x} unsupported"
                )
            if seg[9] == 1:
                irreversible = False
            elif seg[9] == 0:
                irreversible = True
            else:
                raise NotImplementedError(
                    f"J2K transform {seg[9]} unsupported (5/3 or 9/7)"
                )
        elif marker == _QCD:
            sqcd = seg[0]
            qstyle = sqcd & 0x1F
            guard = sqcd >> 5
            if qstyle == 0:  # no quantization: 8-bit exponents
                qentries = [(b >> 3, 0) for b in seg[1:]]
            elif qstyle in (1, 2):  # scalar derived / expounded: 16-bit
                vals = struct.unpack(f">{(len(seg) - 1) // 2}H", seg[1:])
                qentries = [(v >> 11, v & 0x7FF) for v in vals]
            else:
                raise NotImplementedError(
                    f"J2K quantization style {qstyle} unsupported"
                )
        elif marker == _SOT:
            lsot, isot, psot, tpsot, tnsot = struct.unpack(">HHIBB", data[pos : pos + 10])
            if tpsot != 0 or tnsot not in (0, 1):
                raise NotImplementedError(
                    "multiple J2K tile-parts per tile unsupported"
                )
            # find SOD
            p2 = pos + lsot
            (m2,) = struct.unpack(">H", data[p2 : p2 + 2])
            if m2 != _SOD:
                raise NotImplementedError("markers between SOT and SOD unsupported")
            if isot in tile_bodies:
                raise NotImplementedError(
                    "multiple J2K tile-parts per tile unsupported"
                )
            tile_bodies[isot] = (
                p2 + 2,
                pos - 2 + psot if psot else len(data) - 2,
            )
            pos = tile_bodies[isot][1]
            continue
        elif marker in _SKIPPABLE:
            pass
        else:
            raise NotImplementedError(f"J2K marker {marker:#x} unsupported")
        pos += ln
    if None in (w, h, levels, guard) or qentries is None or not tile_bodies:
        raise ValueError("incomplete J2K codestream")

    cb = 1 << cblk_exp

    def band_quant(flat_idx: int, rlevel: int, bname: str) -> Tuple[int, int]:
        """(ε_b, μ_b) for the subband: sequential entries for the
        no-quant / expounded styles, T.800 Eq E-5 derivation from the
        single LL entry for the derived style."""
        if qstyle == 1:
            eps0, mant0 = qentries[0]
            nb = levels if rlevel == 0 else levels - rlevel + 1
            return eps0 - levels + nb, mant0
        return qentries[flat_idx]

    def decode_tile(body_start: int, th: int, tw: int) -> np.ndarray:
        """Packet-decode one tile body and inverse-DWT it; returns the
        (th, tw) plane BEFORE the DC level shift."""
        bands_per_res = _resolution_bands(th, tw, levels)
        coeffs: List[List[np.ndarray]] = [[] for _ in range(levels + 1)]
        band_q: List[List[Tuple[int, int]]] = [[] for _ in range(levels + 1)]
        pos = body_start
        eps_idx = 0
        for r in range(levels + 1):
            br = _HdrReader(data, pos)
            nonempty = br.bit()
            pending = []  # (band_idx, y0, x0, ch, cw, npasses, max_plane, length)
            for b_idx, (bname, bh, bw) in enumerate(bands_per_res[r]):
                b_eps, b_mant = band_quant(eps_idx, r, bname)
                band_q[r].append((b_eps, b_mant))
                mb = b_eps + guard - 1
                eps_idx += 1
                coeffs[r].append(np.zeros((bh, bw), dtype=np.int64))
                cbs = _codeblocks(bh, bw, cb) if bh and bw else []
                if not cbs:
                    continue
                ncx = (bw + cb - 1) // cb
                ncy = (bh + cb - 1) // cb
                if not nonempty:
                    continue
                incl = _TagTree(ncx, ncy)
                zbt = _TagTree(ncx, ncy)
                for cy in range(ncy):
                    for cx in range(ncx):
                        y0, x0, ch, cw = cbs[cy * ncx + cx]
                        if incl.decode(br, cy, cx, 1) is None:
                            continue
                        t = 1
                        while True:
                            zb = zbt.decode(br, cy, cx, t)
                            if zb is not None:
                                break
                            t += 1
                        npasses = _read_npasses(br)
                        lblock = 3
                        k = 0
                        while br.bit():
                            k += 1
                        lblock += k
                        nb = lblock + int(np.floor(np.log2(npasses)))
                        length = br.bits(nb)
                        pending.append(
                            (b_idx, y0, x0, ch, cw, npasses, mb - 1 - zb, length)
                        )
            pos = br.align()
            for b_idx, y0, x0, ch, cw, npasses, max_plane, length in pending:
                if max_plane < 0:
                    raise ValueError("J2K zero-bitplanes exceed Mb")
                seg = data[pos : pos + length]
                pos += length
                bname = bands_per_res[r][b_idx][0]
                dec = T1Decoder(cw, ch, bname, MQDecoder(seg))
                coeffs[r][b_idx][y0 : y0 + ch, x0 : x0 + cw] = dec.decode(
                    npasses, max_plane
                )

        if irreversible:
            # dequantize: x = sign(q) * (|q| + 0.5) * Δ_b for q != 0
            # (midpoint reconstruction, T.800 Annex E)
            for r in range(levels + 1):
                for b_idx, (bname, _, _) in enumerate(bands_per_res[r]):
                    b_eps, b_mant = band_q[r][b_idx]
                    delta = _quant_step(depth, bname, b_eps, b_mant)
                    q = coeffs[r][b_idx]
                    coeffs[r][b_idx] = np.where(
                        q != 0, np.sign(q) * (np.abs(q) + 0.5) * delta, 0.0
                    )
            ll = coeffs[0][0]
            for r in range(1, levels + 1):
                hl, lh, hh = coeffs[r]
                ll = _inv97_2d(ll, hl, lh, hh)
            return ll
        ll = coeffs[0][0]
        for r in range(1, levels + 1):
            hl, lh, hh = coeffs[r]
            ll = _inv53_2d(ll, hl, lh, hh)
        return ll

    ntx = -(-w // tile_w)
    nty = -(-h // tile_h)
    out = np.zeros(
        (h, w), dtype=np.float64 if irreversible else np.int64
    )
    for isot, (body_start, _) in sorted(tile_bodies.items()):
        tj, ti = divmod(isot, ntx)
        if tj >= nty:
            raise ValueError(f"J2K tile index {isot} outside the tile grid")
        y0, x0 = tj * tile_h, ti * tile_w
        th = min(tile_h, h - y0)
        tw = min(tile_w, w - x0)
        out[y0 : y0 + th, x0 : x0 + tw] = decode_tile(body_start, th, tw)
    if len(tile_bodies) != ntx * nty:
        raise ValueError(
            f"J2K codestream has {len(tile_bodies)} tiles, grid needs {ntx * nty}"
        )
    if not signed:
        out = out + (float(1 << (depth - 1)) if irreversible else (1 << (depth - 1)))
    if irreversible:
        # quantization error can push reconstructed values past the
        # declared sample range; conformant decoders clamp (T.800 G.1)
        lo, hi = (
            (-(1 << (depth - 1)), (1 << (depth - 1)) - 1)
            if signed
            else (0, (1 << depth) - 1)
        )
        return np.clip(np.rint(out), lo, hi).astype(np.int64), depth, signed
    return out, depth, signed
