"""WARC (Web ARChive, ISO 28500) source: Common-Crawl-style ingestion
into the ``documents`` model.

The dominant raw input of web-scale training corpora is the Common
Crawl WARC archive: ~1 GB ``.warc.gz`` files, each a concatenation of
per-record gzip members, each record a ``WARC/1.x`` header block plus a
``Content-Length``-delimited body (for ``response`` records the body is
the full HTTP response). This module reads them with no external
parser:

* :func:`read_warc` — Spark ``binaryFile`` scan (one task per archive,
  the industry-standard WARC access pattern: the format is not
  splittable mid-stream, parallelism comes from the many files) →
  ``mapInPandas`` record parse → one row per record with the payload as
  a binary column.
* :func:`html_payload_text` — tag-stripping text extraction heuristic
  (script/style removal, entity unescape, whitespace collapse) as a
  vectorized Arrow stage.
* :func:`write_warc` — conforming writer used for fixtures and tests.

At 100 TB: archives >> executors, so ``binaryFile``'s one-file-one-row
layout parallelizes across the fleet. Decompression and parsing are
fully incremental: gzip members are inflated one bounded feed at a
time, complete records are yielded as soon as the rolling buffer holds
them, and ``read_warc`` emits pandas batches every
``records_per_batch`` records — so a task's peak memory is the
compressed file plus a bounded parse window (one record / member and
the current output batch), never the decompressed archive. No shuffle
anywhere — parse and extract are map-only.
"""

from __future__ import annotations

import gzip
import html as _html
import io
import re
import uuid
import zlib
from typing import Dict, Iterator, List, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_WARC_SCHEMA = (
    "warc_id string, warc_type string, target_uri string, warc_date string, "
    "content_type string, http_status int, http_content_type string, "
    "payload binary, source_file string"
)


_GZIP_FEED = 1 << 20  # compressed bytes per inflate call


def _iter_gzip_chunks(data: bytes, feed: int = _GZIP_FEED) -> Iterator[bytes]:
    """Incrementally inflate a (possibly multi-member) gzip stream,
    yielding decompressed chunks member by member. Peak memory per step
    is one ``feed`` window's inflation (≈ the gzip ratio × ``feed``, or
    one member if smaller) — never the whole decompressed archive."""
    view = memoryview(data)
    n = len(data)
    if n == 0:
        return  # an empty archive has no members — not a truncation
    pos = 0
    obj = zlib.decompressobj(16 + zlib.MAX_WBITS)
    while pos < n:
        fed = view[pos : pos + feed]
        pos += len(fed)
        out = obj.decompress(fed)
        if out:
            yield out
        while obj.eof:
            tail = obj.unused_data
            pos -= len(tail)
            if pos >= n:
                return
            if bytes(view[pos : pos + 2]) != b"\x1f\x8b":
                # trailing non-gzip bytes after the last member: some
                # record-aligned WARC writers pad archives; ignore the
                # tail (matching common gunzip tooling) instead of
                # failing the whole file
                return
            obj = zlib.decompressobj(16 + zlib.MAX_WBITS)
            out = obj.decompress(view[pos : pos + feed])
            pos += min(feed, n - pos)
            if out:
                yield out
    if not obj.eof:
        # the archive ended mid-member: without this the partial plaintext
        # can happen to end at a record boundary and silently drop the
        # trailing records
        raise ValueError("truncated gzip member at end of archive")


def _records_from_stream(chunks: Iterator[bytes]) -> Iterator[Dict]:
    """Incremental WARC record parser over a stream of decompressed
    chunks: a rolling buffer holds at most one incomplete record; each
    complete record is yielded and dropped from the buffer."""
    buf = bytearray()
    for chunk in chunks:
        buf += chunk
        while True:
            # skip inter-record blank lines
            start = 0
            while buf[start : start + 2] in (b"\r\n", b"\n\n"):
                start += 2
            if start:
                del buf[:start]
            if len(buf) < 5:
                break
            if not buf.startswith(b"WARC/"):
                raise ValueError(
                    "malformed WARC: expected version line"
                )
            hdr_end = buf.find(b"\r\n\r\n")
            if hdr_end < 0:
                break  # header incomplete: wait for more data
            header_block = bytes(buf[:hdr_end]).decode("utf-8", "replace")
            lines = header_block.split("\r\n")
            headers: Dict[str, str] = {}
            for line in lines[1:]:
                if ":" in line:
                    k, _, v = line.partition(":")
                    headers[k.strip().lower()] = v.strip()
            length = int(headers.get("content-length", "0"))
            body_start = hdr_end + 4
            if len(buf) < body_start + length:
                break  # body incomplete: wait for more data
            body = bytes(buf[body_start : body_start + length])
            del buf[: body_start + length]
            yield {**headers, "warc_version": lines[0], "body": body}
    if bytes(buf).strip(b"\r\n"):
        if buf.startswith(b"WARC/"):
            raise ValueError("truncated WARC record at end of stream")
        raise ValueError("malformed WARC: expected version line")


def parse_warc_records(data: bytes) -> Iterator[Dict]:
    """Yield records from raw WARC bytes (gzipped or not): dicts with
    the WARC headers (lower-cased keys) plus ``body``. Lazy end to end:
    gzip members are inflated incrementally and each record is parsed
    and yielded as soon as its bytes are available, so peak memory is
    one record plus a bounded inflate window — a later corrupt member
    is only ever reached (and raises) after the records before it have
    been consumed."""
    if data[:2] == b"\x1f\x8b":
        chunks: Iterator[bytes] = _iter_gzip_chunks(data)
    else:
        chunks = iter((data,))
    return _records_from_stream(chunks)


def _split_http_response(body: bytes) -> Tuple[Optional[int], Optional[str], bytes]:
    """(status, content-type, payload) of an HTTP response block; a body
    that is not an HTTP response passes through unsplit."""
    if not body.startswith(b"HTTP/"):
        return None, None, body
    sep = body.find(b"\r\n\r\n")
    if sep < 0:
        return None, None, body
    head = body[:sep].decode("latin-1", "replace")
    lines = head.split("\r\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        status = None
    ctype = None
    for line in lines[1:]:
        if line.lower().startswith("content-type:"):
            ctype = line.partition(":")[2].strip()
            break
    return status, ctype, body[sep + 4 :]


_COLUMNS = [
    "warc_id", "warc_type", "target_uri", "warc_date",
    "content_type", "http_status", "http_content_type",
    "payload", "source_file",
]


def read_warc(
    spark: SparkSession,
    paths,
    record_types: Tuple[str, ...] = ("response",),
    parse_http: bool = True,
    records_per_batch: int = 256,
) -> DataFrame:
    """Scan WARC archives into a DataFrame of records.

    Columns: warc_id, warc_type, target_uri, warc_date, content_type,
    http_status, http_content_type, payload (binary), source_file.
    ``record_types=None`` keeps every record type.

    A pandas batch is emitted every ``records_per_batch`` records, so a
    task's live set is the compressed file plus one output batch — a
    1 GB ``.warc.gz`` (several GB decompressed) never materializes its
    decompressed records all at once."""
    files = spark.read.format("binaryFile").load(paths).select("path", "content")
    wanted = tuple(record_types) if record_types else None

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: List[tuple] = []
        for pdf in batches:
            for path, blob in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_records(bytes(blob)):
                    wtype = rec.get("warc-type", "")
                    if wanted is not None and wtype not in wanted:
                        continue
                    body = rec["body"]
                    status = ctype_http = None
                    if parse_http and wtype in ("response", "revisit"):
                        status, ctype_http, body = _split_http_response(body)
                    rows.append(
                        (
                            rec.get("warc-record-id", ""),
                            wtype,
                            rec.get("warc-target-uri"),
                            rec.get("warc-date"),
                            rec.get("content-type"),
                            status,
                            ctype_http,
                            bytearray(body),
                            path,
                        )
                    )
                    if len(rows) >= records_per_batch:
                        yield pd.DataFrame(rows, columns=_COLUMNS)
                        rows = []
        yield pd.DataFrame(rows, columns=_COLUMNS)

    return files.mapInPandas(parse, _WARC_SCHEMA)


_TAG_DROP = re.compile(
    r"<(script|style|noscript)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_TAGS = re.compile(r"<[^>]+>")
_WS = re.compile(r"[ \t\r\f\v]*\n[ \t\r\f\v]*\n[\s]*|[ \t\r\f\v]+")


def extract_text(html_bytes: bytes, encoding: str = "utf-8") -> str:
    """Tag-stripping text heuristic: drop script/style subtrees, strip
    tags, unescape entities, collapse runs of whitespace (paragraph
    breaks survive as single newlines)."""
    text = html_bytes.decode(encoding, "replace")
    text = _TAG_DROP.sub(" ", text)
    text = _TAGS.sub(" ", text)
    text = _html.unescape(text)
    parts = [seg.strip() for seg in text.splitlines()]
    out: List[str] = []
    for seg in parts:
        seg = re.sub(r"\s+", " ", seg)
        if seg:
            out.append(seg)
    return "\n".join(out)


def html_payload_text(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """payload binary → ``text`` string column via :func:`extract_text`
    (map-only Arrow stage; all other columns pass through)."""
    out_fields = [f for f in df.schema.fieldNames() if f != payload_col]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != payload_col
    ) + ", text string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = [
                extract_text(bytes(b)) if b is not None else None
                for b in pdf[payload_col]
            ]
            res = pdf[out_fields].copy()
            res["text"] = texts
            yield res

    return df.mapInPandas(run, schema)


def write_warc(
    path: str,
    records: List[Dict],
    compress: bool = True,
) -> None:
    """Write a conforming WARC file (one gzip member per record when
    ``compress``, Common Crawl's layout). Each record dict: ``warc_type``
    plus optional ``target_uri``, ``date``, ``content_type``, ``body``
    (bytes), ``http`` (dict with status/content_type/payload to wrap the
    body as an HTTP response)."""
    out = io.BytesIO()
    for rec in records:
        body = rec.get("body", b"")
        if "http" in rec:
            h = rec["http"]
            status = h.get("status", 200)
            ctype = h.get("content_type", "text/html")
            payload = h.get("payload", b"")
            body = (
                f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n"
            ).encode() + payload
        headers = [
            ("WARC-Type", rec.get("warc_type", "response")),
            ("WARC-Record-ID", rec.get("warc_id", f"<urn:uuid:{uuid.uuid4()}>")),
            ("WARC-Date", rec.get("date", "2024-01-01T00:00:00Z")),
            ("Content-Length", str(len(body))),
        ]
        if rec.get("target_uri"):
            headers.append(("WARC-Target-URI", rec["target_uri"]))
        if "http" in rec:
            headers.append(
                ("Content-Type", "application/http;msgtype=response")
            )
        elif rec.get("content_type"):
            headers.append(("Content-Type", rec["content_type"]))
        block = (
            b"WARC/1.0\r\n"
            + "".join(f"{k}: {v}\r\n" for k, v in headers).encode()
            + b"\r\n"
            + body
            + b"\r\n\r\n"
        )
        if compress:
            out.write(gzip.compress(block))
        else:
            out.write(block)
    from ..storage import open_output_stream

    with open_output_stream(path) as f:
        f.write(out.getvalue())


__all__ = [
    "read_warc",
    "parse_warc_records",
    "html_payload_text",
    "extract_text",
    "write_warc",
]
