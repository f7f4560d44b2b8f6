"""WARC source (sources/warc): parse, read, HTTP split, text extract."""

from __future__ import annotations

import gzip

import pytest

from pangeo_forge_recipes_spark.sources.warc import (
    extract_text,
    html_payload_text,
    parse_warc_records,
    read_warc,
    write_warc,
)

_HTML = (
    b"<html><head><title>T</title><style>p{color:red}</style>"
    b"<script>var x=1;</script></head>"
    b"<body><h1>Heading &amp; more</h1><p>First  para.</p>\n"
    b"<p>Second para.</p></body></html>"
)


def _records():
    return [
        {
            "warc_type": "warcinfo",
            "content_type": "application/warc-fields",
            "body": b"software: test\r\n",
        },
        {
            "warc_type": "response",
            "target_uri": "http://example.com/a",
            "http": {"status": 200, "content_type": "text/html", "payload": _HTML},
        },
        {
            "warc_type": "response",
            "target_uri": "http://example.com/b",
            "http": {"status": 404, "content_type": "text/plain", "payload": b"gone"},
        },
        {
            "warc_type": "request",
            "target_uri": "http://example.com/a",
            "content_type": "application/http;msgtype=request",
            "body": b"GET /a HTTP/1.1\r\n\r\n",
        },
    ]


@pytest.mark.parametrize("compress", [True, False])
def test_parse_warc_records_roundtrip(tmp_path, compress):
    path = str(tmp_path / ("t.warc.gz" if compress else "t.warc"))
    write_warc(path, _records(), compress=compress)
    with open(path, "rb") as f:
        raw = f.read()
    if compress:
        # per-record gzip members: more than one member magic
        assert raw.count(b"\x1f\x8b\x08") >= 4
    recs = list(parse_warc_records(raw))
    assert [r["warc-type"] for r in recs] == [
        "warcinfo", "response", "response", "request",
    ]
    assert recs[1]["warc-target-uri"] == "http://example.com/a"
    assert recs[1]["body"].startswith(b"HTTP/1.1 200")
    assert int(recs[1]["content-length"]) == len(recs[1]["body"])


def test_read_warc_dataframe(spark, tmp_path):
    p1 = str(tmp_path / "a.warc.gz")
    p2 = str(tmp_path / "b.warc.gz")
    write_warc(p1, _records())
    write_warc(p2, [_records()[1]])
    df = read_warc(spark, str(tmp_path) + "/*.warc.gz")
    rows = df.collect()
    # default record_types: responses only (3 across the two files)
    assert len(rows) == 3
    by_uri = {}
    for r in rows:
        by_uri.setdefault(r["target_uri"], []).append(r)
    assert set(by_uri) == {"http://example.com/a", "http://example.com/b"}
    a = by_uri["http://example.com/a"][0]
    assert a["http_status"] == 200
    assert a["http_content_type"] == "text/html"
    assert bytes(a["payload"]) == _HTML
    assert by_uri["http://example.com/b"][0]["http_status"] == 404
    # all record types when asked
    every = read_warc(spark, p1, record_types=None)
    assert every.count() == 4


def test_parse_is_lazy_iterator(tmp_path):
    """Bounded-memory contract: the parser yields records incrementally
    and never inflates the whole archive up front. Proof: an archive
    whose LAST gzip member is corrupt still yields every earlier record;
    the corruption only raises when the stream reaches it."""
    import io

    path = str(tmp_path / "lazy.warc.gz")
    write_warc(path, _records())
    with open(path, "rb") as f:
        good = f.read()
    # append a member that starts with the gzip magic but is garbage
    corrupt = good + b"\x1f\x8b\x08" + b"\x00" * 40
    it = parse_warc_records(corrupt)
    assert iter(it) is it  # a generator, not a materialized list
    got = [next(it)["warc-type"] for _ in range(4)]
    assert got == ["warcinfo", "response", "response", "request"]
    import zlib

    with pytest.raises((zlib.error, ValueError, EOFError)):
        next(it)


def test_parse_many_members_small_feed(tmp_path):
    """Multi-member archives parse identically when the inflate feed is
    tiny (every member/record boundary lands mid-feed)."""
    from pangeo_forge_recipes_spark.sources import warc as W

    path = str(tmp_path / "many.warc.gz")
    recs = [
        {
            "warc_type": "response",
            "target_uri": f"http://example.com/{i}",
            "http": {
                "status": 200,
                "content_type": "text/plain",
                "payload": bytes([65 + i % 26]) * (50 + 17 * i),
            },
        }
        for i in range(40)
    ]
    write_warc(path, recs)
    with open(path, "rb") as f:
        raw = f.read()
    expect = [r["warc-target-uri"] for r in parse_warc_records(raw)]
    tiny = W._records_from_stream(W._iter_gzip_chunks(raw, feed=7))
    assert [r["warc-target-uri"] for r in tiny] == expect
    assert len(expect) == 40


def test_read_warc_chunked_batches(spark, tmp_path):
    """records_per_batch only changes batch boundaries, not results."""
    path = str(tmp_path / "chunked.warc.gz")
    recs = [
        {
            "warc_type": "response",
            "target_uri": f"http://example.com/{i}",
            "http": {"status": 200, "content_type": "text/plain",
                     "payload": b"x" * (10 + i)},
        }
        for i in range(17)
    ]
    write_warc(path, recs)
    big = read_warc(spark, path).collect()
    small = read_warc(spark, path, records_per_batch=3).collect()
    key = lambda r: r["target_uri"]
    assert sorted(map(tuple, big)) == sorted(map(tuple, small))
    assert len(big) == 17


def test_truncated_archive_raises(tmp_path):
    path = str(tmp_path / "trunc.warc")
    write_warc(path, _records()[:2], compress=False)
    with open(path, "rb") as f:
        raw = f.read()
    with pytest.raises(ValueError, match="truncated"):
        list(parse_warc_records(raw[:-30]))


def test_empty_input_yields_no_records(tmp_path):
    """Zero-byte input (an empty shard / zero-length ranged read) parses
    as an archive with no records, both raw and via the gzip path."""
    from pangeo_forge_recipes_spark.sources.warc import _iter_gzip_chunks

    assert list(parse_warc_records(b"")) == []
    assert list(_iter_gzip_chunks(b"")) == []


def test_truncated_gzip_member_raises(tmp_path):
    """An archive that ends mid-gzip-member must raise even when the
    partial plaintext happens to end exactly at a record boundary —
    silently losing trailing records is the failure mode."""
    path = str(tmp_path / "trunc.warc.gz")
    write_warc(path, _records(), compress=True)
    with open(path, "rb") as f:
        raw = f.read()
    # cut inside the LAST member: earlier members inflate cleanly, so any
    # complete records they carry parse fine — then the truncation raises
    for cut in (1, 5, 30):
        with pytest.raises(ValueError, match="truncated gzip"):
            list(parse_warc_records(raw[:-cut]))


def test_read_warc_plan_is_map_only(spark, tmp_path):
    path = str(tmp_path / "c.warc.gz")
    write_warc(path, _records())
    df = read_warc(spark, path)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # parse is map-side, no shuffle


def test_extract_text_heuristic():
    text = extract_text(_HTML)
    assert "Heading & more" in text
    assert "First para." in text and "Second para." in text
    assert "var x=1" not in text and "color:red" not in text
    assert "<p>" not in text


def test_html_payload_text_stage(spark, tmp_path):
    path = str(tmp_path / "d.warc.gz")
    write_warc(path, _records())
    df = read_warc(spark, path)
    out = html_payload_text(df)
    assert "payload" not in out.columns and "text" in out.columns
    texts = {r["target_uri"]: r["text"] for r in out.collect()}
    assert "Heading & more" in texts["http://example.com/a"]
    assert texts["http://example.com/b"] == "gone"


def test_trailing_padding_after_last_member_tolerated(tmp_path):
    """Record-aligned WARC writers pad archives; trailing non-gzip bytes
    after the last member must not fail the file."""
    path = str(tmp_path / "pad.warc.gz")
    write_warc(path, _records()[:2])
    with open(path, "rb") as f:
        raw = f.read()
    recs = list(parse_warc_records(raw + b"\x00" * 512))
    assert [r["warc-type"] for r in recs] == ["warcinfo", "response"]
