"""OPeNDAP (DAP2) client and test server — pure Python over stdlib HTTP.

Parity layer for the reference's ``opendap`` engine row
(``pangeo_forge_recipes/openers.py:44`` routes ``FileType.opendap`` to the
netCDF4-C DAP client; ``examples/feedstock/narr_opendap.py`` opens THREDDS
``dodsC`` URLs directly, with no download/cache step). Neither netCDF4 nor
pydap exists in this container, so this module speaks the DAP2 wire
protocol itself:

- ``GET <url>.dds``  → Dataset Descriptor Structure (types + shapes)
- ``GET <url>.das``  → Dataset Attribute Structure
- ``GET <url>.dods`` → constrained DDS + ``Data:`` + XDR-encoded arrays

The subset implemented is the one real gridded-data servers emit: atomic
arrays and ``Grid`` (array + coordinate maps) of Byte / Int16 / UInt16 /
Int32 / UInt32 / Float32 / Float64, with projection constraint
expressions (``?var1,var2``). XDR transport rules per RFC 4506 as
profiled by DAP2: array payloads are prefixed with the element count
twice (two big-endian uint32); 16-bit integers travel widened to 4
bytes; ``Byte`` arrays are padded to a 4-byte boundary.

The module also includes a tiny threaded DAP2 *server* over
``http.server`` that publishes :class:`~.ndset.NDDataset` objects. It
exists so the client can be tested against real HTTP round-trips
without any external service, and doubles as a way to expose engine
datasets to other DAP2 clients.

Schema reads (``dap2_schema``) touch only ``.dds``/``.das`` — the
metadata-only first pass of the pipeline never transfers array payloads.
"""

from __future__ import annotations

import re
import threading
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional, Tuple

import numpy as np

from .cfcalendar import is_standard_calendar
from .ndset import NDDataset, Variable, decode_cf_datetime, encode_cf_datetime

__all__ = [
    "read_dap2",
    "dap2_schema",
    "parse_dds",
    "parse_das",
    "serve_ndsets",
    "Dap2Server",
]

# DAP2 atomic type → (numpy memory dtype, XDR wire itemsize)
_DAP_TYPES: Dict[str, Tuple[str, int]] = {
    "Byte": ("u1", 1),
    "Int16": (">i4", 4),  # widened on the wire
    "UInt16": (">u4", 4),
    "Int32": (">i4", 4),
    "UInt32": (">u4", 4),
    "Float32": (">f4", 4),
    "Float64": (">f8", 8),
}
_NP_TO_DAP = {
    "uint8": "Byte",
    "int16": "Int16",
    "uint16": "UInt16",
    "int32": "Int32",
    "uint32": "UInt32",
    "float32": "Float32",
    "float64": "Float64",
    "int64": "Float64",  # DAP2 has no 64-bit int; servers downcast
    "bool": "Byte",
}


# ===========================================================================
# DDS / DAS parsing (client side)
# ===========================================================================

_ARRAY_RE = re.compile(
    r"^\s*(?P<type>[A-Za-z0-9]+)\s+(?P<name>[^\s\[;]+)\s*(?P<dims>(\[[^\]]+\])*)\s*;\s*$"
)
_DIM_RE = re.compile(r"\[\s*(?:(?P<name>[^=\]]+?)\s*=\s*)?(?P<size>\d+)\s*\]")


def _parse_decl(line: str) -> Optional[dict]:
    m = _ARRAY_RE.match(line)
    if not m or m.group("type") in ("Dataset", "Grid", "Structure", "Sequence"):
        return None
    dims = [
        ((d.group("name") or "").strip(), int(d.group("size")))
        for d in _DIM_RE.finditer(m.group("dims") or "")
    ]
    return {"type": m.group("type"), "name": m.group("name"), "dims": dims}


def parse_dds(text: str) -> dict:
    """Parse a DDS document → ``{"name": dataset_name, "vars": [...]}``.

    Each var entry: ``{"name", "type", "dims": [(dim, size), ...],
    "maps": [...]}`` where ``maps`` is non-empty for Grid variables (the
    coordinate vectors transported alongside the array in ``.dods``).
    """
    lines = [ln.strip() for ln in text.splitlines() if ln.strip()]
    if not lines or not lines[0].startswith("Dataset"):
        raise ValueError(f"not a DDS document: {text[:80]!r}")
    name_m = re.match(r"}\s*([^;]+);", lines[-1])
    ds_name = name_m.group(1).strip() if name_m else ""
    out: List[dict] = []
    i = 1
    while i < len(lines) - 1:
        ln = lines[i]
        if ln.startswith("Grid"):
            # Grid { ARRAY: <decl> MAPS: <decl>* } name;
            i += 1
            assert lines[i].rstrip(":") == "ARRAY", lines[i]
            arr = _parse_decl(lines[i + 1])
            i += 2
            assert lines[i].rstrip(":") == "MAPS", lines[i]
            i += 1
            maps = []
            while not lines[i].startswith("}"):
                maps.append(_parse_decl(lines[i]))
                i += 1
            arr["maps"] = maps
            out.append(arr)
            i += 1
        else:
            decl = _parse_decl(ln)
            if decl is None:
                raise ValueError(f"unsupported DDS construct: {ln!r}")
            decl["maps"] = []
            out.append(decl)
            i += 1
    return {"name": ds_name, "vars": out}


_DAS_ATTR_RE = re.compile(
    r"^\s*(?P<type>[A-Za-z0-9]+)\s+(?P<name>\S+)\s+(?P<value>.*?);\s*$"
)


def _das_value(typ: str, raw: str):
    raw = raw.strip()
    if typ == "String":
        vals = re.findall(r'"((?:[^"\\]|\\.)*)"', raw)
        out = [v.replace('\\"', '"').replace("\\\\", "\\") for v in vals]
    elif typ in ("Float32", "Float64"):
        out = [float(v) for v in raw.split(",")]
    else:
        out = [int(v) for v in raw.split(",")]
    return out[0] if len(out) == 1 else out


def parse_das(text: str) -> Dict[str, dict]:
    """Parse a DAS document → ``{var_name: {attr: value}}``; dataset-level
    attributes live under ``"NC_GLOBAL"``."""
    lines = [ln.rstrip() for ln in text.splitlines()]
    out: Dict[str, dict] = {}
    current: Optional[str] = None
    for ln in lines:
        s = ln.strip()
        if not s or s.startswith("Attributes"):
            continue
        if s == "}":
            current = None
            continue
        if s.endswith("{"):
            current = s[:-1].strip()
            out.setdefault(current, {})
            continue
        m = _DAS_ATTR_RE.match(s)
        if m and current is not None:
            out[current][m.group("name")] = _das_value(
                m.group("type"), m.group("value")
            )
    return out


# ===========================================================================
# XDR decode (client side)
# ===========================================================================


def _xdr_read_array(buf: memoryview, off: int, dap_type: str, n: int):
    """Decode one XDR array payload → (ndarray, new offset)."""
    mem_dtype, wire_size = _DAP_TYPES[dap_type]
    count = int.from_bytes(buf[off : off + 4], "big")
    if count != n:
        raise ValueError(f"XDR length {count} != DDS length {n}")
    off += 8  # length is transmitted twice for arrays
    nbytes = n * wire_size
    arr = np.frombuffer(buf[off : off + nbytes], dtype=mem_dtype)
    off += nbytes + (-nbytes % 4)  # Byte arrays pad to 4-byte boundary
    # narrow wire-widened 16-bit integers back
    if dap_type == "Int16":
        arr = arr.astype("i2")
    elif dap_type == "UInt16":
        arr = arr.astype("u2")
    else:
        arr = arr.astype(arr.dtype.newbyteorder("="))
    return arr, off


def _fetch(url: str, timeout: float = 60.0) -> bytes:
    with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
        if resp.status != 200:
            raise IOError(f"DAP2 GET {url} → HTTP {resp.status}")
        return resp.read()


def _split_dods(payload: bytes) -> Tuple[str, memoryview]:
    marker = b"\nData:\n"
    pos = payload.find(marker)
    if pos < 0:
        raise ValueError("malformed .dods response: no Data: marker")
    return payload[:pos].decode(), memoryview(payload)[pos + len(marker) :]


# ===========================================================================
# Client API
# ===========================================================================


def _decode_time_var(var: Variable) -> Variable:
    attrs = dict(var.attrs)
    units = attrs.get("units")
    calendar = attrs.get("calendar", "standard")
    if (
        isinstance(units, str)
        and " since " in units
        and var.data.dtype.kind in "iuf"
        and is_standard_calendar(calendar)
    ):
        attrs.pop("units")
        attrs.pop("calendar", None)
        return Variable(
            var.dims,
            decode_cf_datetime(np.asarray(var.data, dtype="f8"), units, calendar),
            attrs,
            {"units": units, "calendar": calendar},
        )
    return var


def read_dap2(
    url: str,
    projection: Optional[List[str]] = None,
    timeout: float = 60.0,
    isel: Optional[Dict[str, slice]] = None,
) -> NDDataset:
    """Open a DAP2 endpoint as an :class:`NDDataset` (one ``.dds`` + one
    ``.das`` + one ``.dods`` request). ``projection`` restricts the
    ``.dods`` transfer to the named variables server-side (DAP column
    pruning) and may carry hyperslabs (``"t[0:1:3][2:5]"``, stop
    inclusive per the DAP2 spec); ``isel`` builds those hyperslabs from
    dim slices (``{"time": slice(0, 4)}``) for every projected variable
    — server-side row pruning, so only the subset crosses the wire."""
    dds = parse_dds(_fetch(url + ".dds", timeout).decode())
    das = parse_das(_fetch(url + ".das", timeout).decode())
    dods_url = url + ".dods"
    if isel:
        parsed = (
            [parse_constraint(p) for p in projection]
            if projection
            else [(v["name"], None) for v in dds["vars"]]
        )
        projection = []
        by_name = {v["name"]: v for v in dds["vars"]}
        for n, explicit in parsed:
            decl = by_name.get(n)
            if decl is None:
                projection.append(n)
                continue
            if explicit is not None:
                # the caller already constrained this variable; isel must
                # not silently override or be dropped — keep the explicit
                # hyperslab verbatim, but refuse a genuinely ambiguous
                # double constraint on the same dimension
                overlap = [
                    dname or n
                    for dname, _ in decl["dims"]
                    if (dname or n) in isel
                ]
                if overlap:
                    raise ValueError(
                        f"projection {n!r} carries explicit hyperslabs and "
                        f"isel also constrains {overlap}: drop one of the "
                        "two constraints"
                    )
                projection.append(
                    n
                    + "".join(
                        f"[{s}:{st}:{e}]" for (s, st, e) in explicit
                    )
                )
                continue
            slabs = []
            for dname, size in decl["dims"]:
                sl = isel.get(dname or n)
                if sl is None:
                    slabs.append(f"[0:1:{size - 1}]")
                else:
                    start, stop, step = sl.indices(size)
                    if stop <= start:
                        raise ValueError(f"empty isel slice for dim {dname!r}")
                    slabs.append(f"[{start}:{step}:{stop - 1}]")
            projection.append(n + "".join(slabs))
    if projection:
        keep = {parse_constraint(p)[0] for p in projection}
        dds["vars"] = [v for v in dds["vars"] if v["name"] in keep]
        dods_url += "?" + ",".join(urllib.parse.quote(p) for p in projection)
    ddx, data = _split_dods(_fetch(dods_url, timeout))
    wire = parse_dds(ddx)  # the constrained DDS echoed in the response

    arrays: Dict[str, Variable] = {}
    dims: Dict[str, int] = {}
    off = 0
    for v in wire["vars"]:
        shape = tuple(s for _, s in v["dims"])
        dnames = tuple(d or v["name"] for d, _ in v["dims"])
        arr, off = _xdr_read_array(data, off, v["type"], int(np.prod(shape or (1,))))
        attrs = dict(das.get(v["name"], {}))
        arrays[v["name"]] = Variable(dnames, arr.reshape(shape), attrs)
        dims.update(zip(dnames, shape))
        for mp in v["maps"]:
            mshape = tuple(s for _, s in mp["dims"])
            mdims = tuple(d or mp["name"] for d, _ in mp["dims"])
            marr, off = _xdr_read_array(
                data, off, mp["type"], int(np.prod(mshape or (1,)))
            )
            arrays.setdefault(
                mp["name"],
                Variable(mdims, marr.reshape(mshape), dict(das.get(mp["name"], {}))),
            )
            dims.update(zip(mdims, mshape))

    coords, data_vars = {}, {}
    for name, var in arrays.items():
        if list(var.dims) == [name]:
            coords[name] = _decode_time_var(var)
        else:
            data_vars[name] = var
    global_attrs = dict(das.get("NC_GLOBAL", {}))
    return NDDataset(data_vars, coords, global_attrs, dims)


def dap2_schema(url: str, timeout: float = 60.0) -> dict:
    """Metadata-only schema from ``.dds`` + ``.das`` — no array payload is
    transferred (the DAP analog of the lazy ``load=False`` open the
    reference uses for its schema pass, ``transforms.py:230``)."""
    dds = parse_dds(_fetch(url + ".dds", timeout).decode())
    das = parse_das(_fetch(url + ".das", timeout).decode())
    schema = {
        "dims": {},
        "coords": {},
        "data_vars": {},
        "attrs": dict(das.get("NC_GLOBAL", {})),
        "chunks": {},
    }
    seen = {}
    for v in dds["vars"]:
        decls = [v] + list(v["maps"])
        for d in decls:
            if d["name"] in seen:
                continue
            seen[d["name"]] = True
            dnames = [dn or d["name"] for dn, _ in d["dims"]]
            shape = [s for _, s in d["dims"]]
            attrs = dict(das.get(d["name"], {}))
            dtype = str(np.dtype(_DAP_TYPES[d["type"]][0]).newbyteorder("="))
            encoding: dict = {}
            units = attrs.get("units")
            if isinstance(units, str) and " since " in units:
                encoding = {
                    "units": attrs.pop("units"),
                    "calendar": attrs.pop("calendar", "standard"),
                }
                if is_standard_calendar(encoding["calendar"]):
                    dtype = "datetime64[ns]"
            entry = {
                "dims": dnames,
                "attrs": attrs,
                "dtype": dtype,
                "shape": shape,
                "encoding": encoding,
            }
            for dn, s in zip(dnames, shape):
                schema["dims"][dn] = s
            role = "coords" if dnames == [d["name"]] else "data_vars"
            schema[role][d["name"]] = entry
    return schema


# ===========================================================================
# Server (test fixture + NDDataset publisher)
# ===========================================================================


def _dap_type_for(var: Variable) -> Tuple[str, np.ndarray]:
    """(DAP2 type, wire-ready array) for one variable; datetimes are
    CF-encoded to Float64 offsets with units/calendar attrs."""
    data = np.asarray(var.data)
    if data.dtype.kind == "M":
        units = var.encoding.get("units", "seconds since 1970-01-01")
        data = encode_cf_datetime(data, units).astype("f8")
        return "Float64", data
    name = _NP_TO_DAP.get(str(data.dtype))
    if name is None:
        raise NotImplementedError(f"dtype {data.dtype} not representable in DAP2")
    if str(data.dtype) in ("int64", "bool"):
        data = data.astype("f8" if data.dtype.kind == "i" else "u1")
    return name, data


def _server_attrs(var: Variable) -> dict:
    attrs = dict(var.attrs)
    if np.asarray(var.data).dtype.kind == "M":
        attrs["units"] = var.encoding.get("units", "seconds since 1970-01-01")
        attrs["calendar"] = var.encoding.get("calendar", "proleptic_gregorian")
    return attrs


def _dds_decl(name: str, dap_type: str, dims, sizes) -> str:
    spec = "".join(f"[{d} = {s}]" for d, s in zip(dims, sizes))
    return f"{dap_type} {name}{spec};"


def _dds_text(ds: NDDataset, ds_name: str, names: Optional[List[str]] = None) -> str:
    lines = ["Dataset {"]
    for name, var in ds.coords.items():
        if names is not None and name not in names:
            continue
        t, data = _dap_type_for(var)
        lines.append("    " + _dds_decl(name, t, var.dims, data.shape))
    for name, var in ds.data_vars.items():
        if names is not None and name not in names:
            continue
        t, data = _dap_type_for(var)
        mapped = all(d in ds.coords for d in var.dims)
        if mapped and var.dims:
            lines.append("    Grid {")
            lines.append("     ARRAY:")
            lines.append("        " + _dds_decl(name, t, var.dims, data.shape))
            lines.append("     MAPS:")
            for d in var.dims:
                mt, mdata = _dap_type_for(ds.coords[d])
                lines.append("        " + _dds_decl(d, mt, (d,), mdata.shape))
            lines.append(f"    }} {name};")
        else:
            lines.append("    " + _dds_decl(name, t, var.dims, data.shape))
    lines.append(f"}} {ds_name};")
    return "\n".join(lines) + "\n"


def _das_attr_line(key: str, val) -> Optional[str]:
    if isinstance(val, str):
        esc = val.replace("\\", "\\\\").replace('"', '\\"')
        return f'        String {key} "{esc}";'
    if isinstance(val, (bool, np.bool_)):
        return f"        Byte {key} {int(val)};"
    if isinstance(val, (int, np.integer)):
        return f"        Int32 {key} {int(val)};"
    if isinstance(val, (float, np.floating)):
        return f"        Float64 {key} {float(val)!r};"
    return None  # arrays/None: skipped (out of DAS subset)


def _das_text(ds: NDDataset) -> str:
    lines = ["Attributes {"]
    for name, var in list(ds.coords.items()) + list(ds.data_vars.items()):
        lines.append(f"    {name} {{")
        for k, v in _server_attrs(var).items():
            ln = _das_attr_line(k, v)
            if ln:
                lines.append(ln)
        lines.append("    }")
    lines.append("    NC_GLOBAL {")
    for k, v in ds.attrs.items():
        ln = _das_attr_line(k, v)
        if ln:
            lines.append(ln)
    lines.append("    }")
    lines.append("}")
    return "\n".join(lines) + "\n"


def _xdr_bytes(dap_type: str, data: np.ndarray) -> bytes:
    wire_dtype, _ = _DAP_TYPES[dap_type]
    flat = np.ascontiguousarray(data).ravel()
    if dap_type in ("Int16", "UInt16"):  # widen for transport
        flat = flat.astype(wire_dtype)
    else:
        flat = flat.astype(np.dtype(wire_dtype))
    body = flat.tobytes()
    n = len(flat)
    return n.to_bytes(4, "big") * 2 + body + b"\x00" * (-len(body) % 4)


def _dods_bytes(ds: NDDataset, ds_name: str, names: Optional[List[str]]) -> bytes:
    chunks = [_dds_text(ds, ds_name, names).encode(), b"\nData:\n"]
    for name, var in ds.coords.items():
        if names is not None and name not in names:
            continue
        t, data = _dap_type_for(var)
        chunks.append(_xdr_bytes(t, data))
    for name, var in ds.data_vars.items():
        if names is not None and name not in names:
            continue
        t, data = _dap_type_for(var)
        chunks.append(_xdr_bytes(t, data))
        if all(d in ds.coords for d in var.dims) and var.dims:
            for d in var.dims:  # Grid maps travel with the array
                mt, mdata = _dap_type_for(ds.coords[d])
                chunks.append(_xdr_bytes(mt, mdata))
    return b"".join(chunks)


class Dap2Server:
    """Threaded DAP2 server publishing named NDDatasets at
    ``http://127.0.0.1:<port>/<name>``. Context manager; ``url_for(name)``
    gives the extension-less endpoint the client consumes."""

    def __init__(self, datasets: Dict[str, NDDataset]):
        self._datasets = dict(datasets)
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):  # noqa: N802
                parsed = urllib.parse.urlparse(self.path)
                path = parsed.path.lstrip("/")
                name, dot, ext = path.rpartition(".")
                if dot != "." or ext not in ("dds", "das", "dods"):
                    self.send_error(404, "expected .dds/.das/.dods")
                    return
                ds = server._datasets.get(name)
                if ds is None:
                    self.send_error(404, f"no dataset {name!r}")
                    return
                proj = None
                if parsed.query:
                    exprs = [
                        urllib.parse.unquote(p)
                        for p in parsed.query.split(",")
                        if p
                    ]
                    known = set(ds.coords) | set(ds.data_vars)
                    try:
                        bad = [
                            e for e in exprs
                            if parse_constraint(e)[0] not in known
                        ]
                    except ValueError as e:
                        self.send_error(400, str(e))
                        return
                    if bad:
                        self.send_error(400, f"unknown variables {bad}")
                        return
                    try:
                        ds, proj = _apply_constraints(ds, exprs)
                    except (ValueError, KeyError) as e:
                        self.send_error(400, str(e))
                        return
                if ext == "dds":
                    body = _dds_text(ds, name, proj).encode()
                    ctype = "text/plain"
                elif ext == "das":
                    body = _das_text(ds).encode()
                    ctype = "text/plain"
                else:
                    body = _dods_bytes(ds, name, proj)
                    ctype = "application/octet-stream"
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )

    @property
    def base_url(self) -> str:
        host, port = self._httpd.server_address
        return f"http://{host}:{port}"

    def url_for(self, name: str) -> str:
        return f"{self.base_url}/{name}"

    def __enter__(self) -> "Dap2Server":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


def serve_ndsets(datasets: Dict[str, NDDataset]) -> Dap2Server:
    """Publish ``{name: dataset}`` over DAP2 (start with ``with`` or
    ``__enter__``)."""
    return Dap2Server(datasets)


# ---------------------------------------------------------------------------
# hyperslab constraints (DAP2 "projection with array subsetting":
# var[start:stride:stop] per dim, stop INCLUSIVE per the DAP2 spec)
# ---------------------------------------------------------------------------

_SLAB_RE = re.compile(r"^(?P<name>[A-Za-z_][\w.-]*)(?P<slabs>(\[[^\]]*\])*)$")
_SLAB_PART = re.compile(r"\[([^\]]*)\]")


def parse_constraint(expr: str) -> Tuple[str, Optional[List[Tuple[int, int, int]]]]:
    """``"t[0:1:3][2:5]"`` → ("t", [(0,1,3), (2,1,5)]); bare names give
    (name, None). Each slab is (start, stride, stop-inclusive)."""
    m = _SLAB_RE.match(expr.strip())
    if not m:
        raise ValueError(f"malformed DAP2 projection {expr!r}")
    slabs_txt = m.group("slabs")
    if not slabs_txt:
        return m.group("name"), None
    out = []
    for part in _SLAB_PART.findall(slabs_txt):
        bits = part.split(":")
        if len(bits) == 1:
            s = int(bits[0])
            out.append((s, 1, s))
        elif len(bits) == 2:
            out.append((int(bits[0]), 1, int(bits[1])))
        elif len(bits) == 3:
            out.append((int(bits[0]), int(bits[1]), int(bits[2])))
        else:
            raise ValueError(f"malformed hyperslab {part!r} in {expr!r}")
    return m.group("name"), out


def _apply_constraints(
    ds: NDDataset, exprs: List[str]
) -> Tuple[NDDataset, List[str]]:
    """Server side: slice the dataset per hyperslab projections; returns
    (subset dataset, bare projected names). Dim coords follow their
    dim's slab so Grid maps stay aligned."""
    names: List[str] = []
    dim_slices: Dict[str, slice] = {}
    wanted: Dict[str, Optional[List[Tuple[int, int, int]]]] = {}
    for e in exprs:
        name, slabs = parse_constraint(e)
        names.append(name)
        wanted[name] = slabs
        var = ds.data_vars.get(name) or ds.coords.get(name)
        if var is None:
            raise KeyError(name)
        if slabs is not None:
            if len(slabs) != len(var.dims):
                raise ValueError(
                    f"{name}: {len(slabs)} hyperslabs for "
                    f"{len(var.dims)} dims"
                )
            for d, (a, st, b) in zip(var.dims, slabs):
                sl = slice(a, b + 1, st)
                prev = dim_slices.get(d)
                if prev is not None and prev != sl:
                    raise ValueError(
                        f"conflicting hyperslabs for dim {d!r}"
                    )
                dim_slices[d] = sl
    if not dim_slices:
        return ds, names
    data_vars = {}
    for n, v in ds.data_vars.items():
        if n not in wanted:
            continue
        key = tuple(dim_slices.get(d, slice(None)) for d in v.dims)
        data_vars[n] = Variable(v.dims, v.data[key], dict(v.attrs))
    coords = {}
    for n, v in ds.coords.items():
        key = tuple(dim_slices.get(d, slice(None)) for d in v.dims)
        coords[n] = Variable(v.dims, v.data[key], dict(v.attrs))
    dims = {}
    for v in list(data_vars.values()) + list(coords.values()):
        dims.update(zip(v.dims, v.data.shape))
    return NDDataset(data_vars, coords, dict(ds.attrs), dims), names
