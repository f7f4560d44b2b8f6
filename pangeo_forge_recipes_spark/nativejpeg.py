"""Optional libjpeg-backed ENTROPY decode for the JPEG reader.

The pure-Python decoder's remaining ceiling is the sequential per-symbol
entropy loop (everything after it — dequantize + IDCT + upsample + color
transform — is already whole-array numpy). This module lifts exactly
that stage onto the system's public libjpeg via ``jpeg_read_coefficients``:
the DCT COEFFICIENTS of a scan are a lossless product of entropy decoding
(no IDCT rounding is involved), so feeding them into the engine's own
vectorized dequant+IDCT produces BIT-IDENTICAL pixels to the pure path —
the equality the tests assert whenever the native path is available.

Strictly optional infrastructure: at import we probe for a C compiler and
``jpeglib.h`` and build a ~100-line shim (plain C functions — no fragile
struct-ABI ctypes against jpeglib's internals; the shim owns the libjpeg
structs and is compiled against the header present on the machine) into a
cache directory. Any failure — no gcc, no header, no libjpeg — leaves
``available() == False`` and the pure-Python decoder untouched. The shim
overrides libjpeg's default error handler (which would ``exit()`` the
worker) with setjmp/longjmp, returning error codes instead.

Scope: sequential and progressive Huffman streams (SOF0/1/2) without the
engine-specific extensions — hierarchical, lossless, and arithmetic
frames always take the pure path (libjpeg62 has no arithmetic decode).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import List, Optional, Tuple

import numpy as np

_C_SRC = r"""
#include <stddef.h>
#include <setjmp.h>
#include <stdio.h>
#include <string.h>
#include <jpeglib.h>

struct pfrs_err {
  struct jpeg_error_mgr pub;
  jmp_buf jb;
};

static void pfrs_error_exit(j_common_ptr cinfo) {
  struct pfrs_err *e = (struct pfrs_err *)cinfo->err;
  longjmp(e->jb, 1);
}
static void pfrs_emit_message(j_common_ptr cinfo, int msg_level) {
  /* silence output but KEEP the warning count (the default handler's
     accounting) — num_warnings != 0 is how corrupt-but-recoverable
     streams get rejected to the strict pure path */
  if (msg_level < 0) cinfo->err->num_warnings++;
}

static long jdiv_ceil(long a, long b) { return (a + b - 1) / b; }

/* Pass 1: component geometry from the HEADER ONLY (no entropy decode —
   block counts follow libjpeg's own jdiv_round_up(image_dim * samp,
   max_samp * DCTSIZE) from jdinput.c). comp_info is caller-allocated
   room for ncomp*6 ints: (h_samp, v_samp, w_blocks, h_blocks,
   quant_tbl_no, id). Returns ncomp (>0), or -1 on decode error, or -2
   if arithmetic. */
int pfrs_jpeg_layout(const unsigned char *buf, long len,
                     int *image, int *comp_info, int max_comp) {
  struct jpeg_decompress_struct cinfo;
  struct pfrs_err jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = pfrs_error_exit;
  jerr.pub.emit_message = pfrs_emit_message;
  if (setjmp(jerr.jb)) { jpeg_destroy_decompress(&cinfo); return -1; }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, (unsigned char *)buf, (unsigned long)len);
  jpeg_read_header(&cinfo, TRUE);
  if (cinfo.arith_code) { jpeg_destroy_decompress(&cinfo); return -2; }
  int n = cinfo.num_components;
  if (n > max_comp) { jpeg_destroy_decompress(&cinfo); return -1; }
  image[0] = (int)cinfo.image_width;
  image[1] = (int)cinfo.image_height;
  image[2] = (int)cinfo.data_precision;
  image[3] = cinfo.progressive_mode ? 1 : 0;
  int hmax = 1, vmax = 1;
  for (int c = 0; c < n; c++) {
    if (cinfo.comp_info[c].h_samp_factor > hmax) hmax = cinfo.comp_info[c].h_samp_factor;
    if (cinfo.comp_info[c].v_samp_factor > vmax) vmax = cinfo.comp_info[c].v_samp_factor;
  }
  for (int c = 0; c < n; c++) {
    jpeg_component_info *ci = &cinfo.comp_info[c];
    comp_info[c * 6 + 0] = ci->h_samp_factor;
    comp_info[c * 6 + 1] = ci->v_samp_factor;
    comp_info[c * 6 + 2] = (int)jdiv_ceil(
        (long)cinfo.image_width * ci->h_samp_factor, (long)hmax * DCTSIZE);
    comp_info[c * 6 + 3] = (int)jdiv_ceil(
        (long)cinfo.image_height * ci->v_samp_factor, (long)vmax * DCTSIZE);
    comp_info[c * 6 + 4] = ci->quant_tbl_no;
    comp_info[c * 6 + 5] = ci->component_id;
  }
  jpeg_abort_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return n;
}

/* Pass 2: coefficients + quant tables. out_coef: per component, a
   caller-allocated int16 buffer of w_blocks*h_blocks*64 (concatenated in
   component order, sizes from pfrs_jpeg_layout). out_quant: ncomp*64
   uint16 (each component's table, deQUANTIZATION values). Returns 0,
   or -1 on error — INCLUDING recoverable corruption: libjpeg patches
   over truncated/corrupt entropy data with warnings and garbage
   coefficients, but the engine's contract (matching the pure decoder)
   is to REJECT such streams, so num_warnings != 0 fails the call and
   the caller falls back to the strict pure path. */
int pfrs_jpeg_coefficients(const unsigned char *buf, long len,
                           const int *expect_blocks, int n_expect,
                           short *out_coef, unsigned short *out_quant) {
  struct jpeg_decompress_struct cinfo;
  struct pfrs_err jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = pfrs_error_exit;
  jerr.pub.emit_message = pfrs_emit_message;
  if (setjmp(jerr.jb)) { jpeg_destroy_decompress(&cinfo); return -1; }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, (unsigned char *)buf, (unsigned long)len);
  jpeg_read_header(&cinfo, TRUE);
  jvirt_barray_ptr *arrays = jpeg_read_coefficients(&cinfo);
  if (!arrays) { jpeg_destroy_decompress(&cinfo); return -1; }
  if (cinfo.err->num_warnings != 0) {  /* corrupt-but-recoverable */
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  /* the caller sized out_coef from pass 1's computed geometry; refuse
     to copy if libjpeg's internal block counts disagree (overrun guard) */
  if (cinfo.num_components != n_expect) { jpeg_destroy_decompress(&cinfo); return -1; }
  for (int c = 0; c < cinfo.num_components; c++) {
    if ((int)cinfo.comp_info[c].width_in_blocks != expect_blocks[c * 2] ||
        (int)cinfo.comp_info[c].height_in_blocks != expect_blocks[c * 2 + 1]) {
      jpeg_destroy_decompress(&cinfo);
      return -1;
    }
  }
  long off = 0;
  for (int c = 0; c < cinfo.num_components; c++) {
    jpeg_component_info *ci = &cinfo.comp_info[c];
    for (JDIMENSION row = 0; row < ci->height_in_blocks; row++) {
      JBLOCKARRAY rows = (*cinfo.mem->access_virt_barray)(
          (j_common_ptr)&cinfo, arrays[c], row, 1, FALSE);
      memcpy(out_coef + off, rows[0],
             (size_t)ci->width_in_blocks * DCTSIZE2 * sizeof(short));
      off += (long)ci->width_in_blocks * DCTSIZE2;
    }
    JQUANT_TBL *qt = ci->quant_table;
    if (qt == NULL) qt = cinfo.quant_tbl_ptrs[ci->quant_tbl_no];
    if (qt == NULL) { jpeg_destroy_decompress(&cinfo); return -1; }
    for (int k = 0; k < DCTSIZE2; k++)
      out_quant[c * DCTSIZE2 + k] = qt->quantval[k];
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}
"""

_lib = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    if not os.path.exists("/usr/include/jpeglib.h") and not os.path.exists(
        "/usr/local/include/jpeglib.h"
    ):
        return None
    tag = hashlib.sha256(_C_SRC.encode()).hexdigest()[:16]
    # per-UID, mode-0700 cache: a predictable world-writable /tmp path
    # would let another local user pre-plant a malicious .so (classic
    # /tmp planting); the ownership + permission check below refuses
    # anything we do not exclusively own
    cache = os.path.join(
        tempfile.gettempdir(), f"pfrs_jpeg_{os.getuid()}_{tag}"
    )
    so = os.path.join(cache, "pfrs_jpeg.so")
    try:
        os.makedirs(cache, mode=0o700, exist_ok=True)
    except OSError:
        return None
    st = os.stat(cache)
    if st.st_uid != os.getuid() or (st.st_mode & 0o077):
        return None  # not exclusively ours — refuse to build or load here
    if not os.path.exists(so):
        # pid-suffixed source: two workers racing past the exists() check
        # must never share a .c path, or one's gcc can read the other's
        # half-written file — a failed compile here is memoized as a
        # permanent silent fallback to the pure path (ADVICE r7)
        src = os.path.join(cache, f"pfrs_jpeg.{os.getpid()}.c")
        with open(src, "w") as f:
            f.write(_C_SRC)
        tmp_so = so + f".{os.getpid()}"
        r = subprocess.run(
            ["gcc", "-O2", "-shared", "-fPIC", "-o", tmp_so, src, "-ljpeg"],
            capture_output=True,
            timeout=120,
        )
        try:
            if r.returncode != 0:
                return None
            os.replace(tmp_so, so)  # atomic for concurrent workers
        finally:
            for leftover in (src, tmp_so):
                try:
                    os.unlink(leftover)
                except OSError:
                    pass
    if os.stat(so).st_uid != os.getuid():
        return None
    lib = ctypes.CDLL(so)
    lib.pfrs_jpeg_layout.restype = ctypes.c_int
    lib.pfrs_jpeg_layout.argtypes = [
        ctypes.c_char_p,
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    lib.pfrs_jpeg_coefficients.restype = ctypes.c_int
    lib.pfrs_jpeg_coefficients.argtypes = [
        ctypes.c_char_p,
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_short),
        ctypes.POINTER(ctypes.c_ushort),
    ]
    return lib


def available() -> bool:
    """True when the shim compiled and loaded (memoized)."""
    global _lib, _tried
    if not _tried:
        _tried = True
        try:
            _lib = _build()
        except Exception:  # noqa: BLE001 — any toolchain failure = no native
            _lib = None
    return _lib is not None


def read_coefficients(
    buf: bytes,
) -> Optional[Tuple[dict, List[np.ndarray], List[np.ndarray]]]:
    """Entropy-decode ``buf`` with libjpeg: returns ``(frame_info, coef,
    quant)`` where ``coef[c]`` is an int16 ``(h_blocks, w_blocks, 64)``
    array whose 64 coefficients are in libjpeg's NATURAL (raster 8x8)
    order — the entropy decoders write ``block[jpeg_natural_order[k]]``
    — and ``quant[c]`` the component's 64 dequantization values, also
    natural order. The caller (``jpegio._try_native_decode``) converts
    both to the engine's zigzag-ordered stores via ``[..., ZIGZAG]``.
    Returns None when the native path cannot serve this stream
    (arithmetic coding, decode error OR recoverable corruption — the
    shim fails on any libjpeg warning so corrupt streams take the
    strict pure path — or unavailable toolchain)."""
    if not available():
        return None
    n = len(buf)
    image = (ctypes.c_int * 4)()
    max_comp = 10
    comp = (ctypes.c_int * (max_comp * 6))()
    ncomp = _lib.pfrs_jpeg_layout(buf, n, image, comp, max_comp)
    if ncomp <= 0:
        return None
    comps = []
    total = 0
    expect = (ctypes.c_int * (ncomp * 2))()
    for c in range(ncomp):
        h, v, wb, hb, tq, cid = comp[c * 6 : c * 6 + 6]
        comps.append(
            {"h": h, "v": v, "wb": wb, "hb": hb, "tq": tq, "id": cid}
        )
        expect[c * 2] = wb
        expect[c * 2 + 1] = hb
        total += wb * hb * 64
    coef_buf = np.empty(total, dtype=np.int16)
    quant_buf = np.empty(ncomp * 64, dtype=np.uint16)
    r = _lib.pfrs_jpeg_coefficients(
        buf,
        n,
        expect,
        ncomp,
        coef_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
        quant_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ushort)),
    )
    if r != 0:
        return None
    coef = []
    off = 0
    for c in comps:
        size = c["wb"] * c["hb"] * 64
        coef.append(
            coef_buf[off : off + size]
            .reshape(c["hb"], c["wb"], 64)
            .astype(np.int32)
        )
        off += size
    quant = [
        quant_buf[c * 64 : (c + 1) * 64].astype(np.int64) for c in range(ncomp)
    ]
    frame = {
        "w": int(image[0]),
        "h": int(image[1]),
        "precision": int(image[2]),
        "progressive": bool(image[3]),
        "comps": comps,
    }
    return frame, coef, quant


__all__ = ["available", "read_coefficients"]
