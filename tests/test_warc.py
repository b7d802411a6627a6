"""WARC source pins (sources/warc.py): record framing round-trip,
member-gzip splitting, record-type routing, HTTP envelope split, and
the tolerance contract (truncated tails dropped, inter-record noise
skipped) — plus the end-to-end fixture → reader path the
web_warc_extract driver gate rides."""

from __future__ import annotations

import gzip
import os

import pytest

from codegraph_spark.sources.warc import (
    parse_warc_stream,
    read_warc_records,
    read_warc_responses,
    warc_record_bytes,
    write_warc,
)


def _resp(url: str, body: bytes, rid: str) -> bytes:
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        + f"Content-Length: {len(body)}\r\n\r\n".encode()
        + body
    )
    return warc_record_bytes(
        "response", url, http, rid,
        content_type="application/http;msgtype=response",
    )


def test_record_roundtrip():
    rec = warc_record_bytes("response", "https://x/1", b"hello", "r1")
    parsed = parse_warc_stream(rec)
    assert parsed == [("response", "https://x/1", b"hello")]


def test_multi_record_stream_and_binary_payload():
    payload = bytes(range(256)) + b"\r\n\r\nWARC/1.0\r\n"  # embedded decoys
    stream = (
        warc_record_bytes("warcinfo", None, b"software: t\r\n", "i")
        + warc_record_bytes("request", "https://x/2", b"GET / HTTP/1.1\r\n\r\n", "q")
        + warc_record_bytes("response", "https://x/2", payload, "r")
    )
    parsed = parse_warc_stream(stream)
    assert [p[0] for p in parsed] == ["warcinfo", "request", "response"]
    # Content-Length framing, not delimiter scanning: the payload's
    # embedded CRLFCRLF + "WARC/1.0" decoys must not split the record
    assert parsed[2][2] == payload


def test_truncated_tail_dropped_not_raised():
    good = warc_record_bytes("response", "https://x/3", b"abc", "r3")
    bad = warc_record_bytes("response", "https://x/4", b"0123456789", "r4")
    parsed = parse_warc_stream(good + bad[: len(bad) - 8])  # cut mid-payload
    assert [(t, u) for t, u, _ in parsed] == [("response", "https://x/3")]


def test_garbage_resync_stops_cleanly():
    good = warc_record_bytes("response", "https://x/5", b"abc", "r5")
    assert parse_warc_stream(b"NOISE" + good) == []
    assert len(parse_warc_stream(good + b"NOISE")) == 1


def test_member_gzip_framing(tmp_path):
    path = os.path.join(tmp_path, "t.warc.gz")
    recs = [
        warc_record_bytes("warcinfo", None, b"x\r\n", "i"),
        _resp("https://h/a", b"<p>one</p>", "a"),
        _resp("https://h/b", b"<p>two</p>", "b"),
    ]
    write_warc(path, recs)
    raw = open(path, "rb").read()
    # one gzip member per record — count member magic headers
    assert raw.count(b"\x1f\x8b\x08") == 3
    parsed = parse_warc_stream(gzip.decompress(raw))
    assert len(parsed) == 3 and parsed[1][2].endswith(b"<p>one</p>")


@pytest.fixture()
def warc_dir(tmp_path):
    d = str(tmp_path)
    write_warc(
        os.path.join(d, "p0.warc.gz"),
        [
            warc_record_bytes("warcinfo", None, b"s\r\n", "i0"),
            warc_record_bytes(
                "request", "https://h/a", b"GET /a HTTP/1.1\r\n\r\n", "q0"
            ),
            _resp("https://h/a", "<p>alpha page body</p>".encode(), "r0"),
        ],
    )
    write_warc(
        os.path.join(d, "p1.warc.gz"),
        [_resp("https://h/b", "<p>beta page body</p>".encode(), "r1")],
    )
    return d


def test_read_warc_records_distributed(spark, warc_dir):
    rows = read_warc_records(spark, warc_dir).collect()
    assert sorted(r["rec_type"] for r in rows) == [
        "request", "response", "response", "warcinfo",
    ]


def test_read_warc_responses_envelope_split(spark, warc_dir):
    rows = {
        r["url"]: r for r in read_warc_responses(spark, warc_dir).collect()
    }
    assert set(rows) == {"https://h/a", "https://h/b"}
    assert rows["https://h/a"]["http_status"] == 200
    # HTTP headers stripped, body exact
    assert rows["https://h/a"]["page"] == "<p>alpha page body</p>"


def test_warc_fixture_end_to_end(spark, sf_dir):
    """fixture build → scan → envelope split recovers exactly the
    html_wrap page of every subset document."""
    from pyspark.sql import functions as F

    from codegraph_spark.queries.web import (
        _WARC_SUBSET_MOD,
        _warc_fixture_dir,
        html_wrap,
    )
    from codegraph_spark.sources.tables import load_table

    root = _warc_fixture_dir(spark, sf_dir)
    got = {
        r["url"]: r["page"]
        for r in read_warc_responses(spark, root).collect()
    }
    want_rows = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % _WARC_SUBSET_MOD == 0)
        .select(
            F.concat(
                F.lit("https://"), F.col("source"),
                F.lit(".example.org/doc/"), F.col("doc_id").cast("string"),
            ).alias("url"),
            html_wrap(
                F.col("text"), F.col("doc_id"), F.col("source")
            ).alias("page"),
        )
        .collect()
    )
    assert want_rows and len(got) == len(want_rows)
    for r in want_rows:
        assert got[r["url"]] == r["page"]


def test_member_extents_and_ranged_fetch(tmp_path):
    """iter_gzip_members returns exact compressed extents: a ranged
    seek+read of any (offset, length) re-decompresses to that member
    alone — the cdx-index contract web_warc_point_lookup rides."""
    from codegraph_spark.sources.warc import (
        fetch_record_range,
        iter_gzip_members,
    )

    path = os.path.join(tmp_path, "x.warc.gz")
    recs = [
        _resp("https://h/a", b"<p>first record body</p>", "a"),
        _resp("https://h/b", b"<p>second record body</p>", "b"),
        _resp("https://h/c", b"<p>third record body</p>", "c"),
    ]
    write_warc(path, recs)
    data = open(path, "rb").read()
    members = iter_gzip_members(data)
    assert len(members) == 3
    # extents tile the file exactly
    assert members[0][0] == 0
    for (o1, l1, _), (o2, _, _) in zip(members, members[1:]):
        assert o1 + l1 == o2
    assert members[-1][0] + members[-1][1] == len(data)
    # ranged fetch of the MIDDLE member only
    off, length, plain = members[1]
    fetched = fetch_record_range(path, off, length)
    assert fetched == plain == recs[1]
    # truncated tail member dropped, earlier extents unaffected
    assert len(iter_gzip_members(data[: len(data) - 5])) == 2


def test_wet_sink_roundtrip(spark, sf_dir):
    """WET writer → reader round trip: conversion files are 1:1 with
    their WARC sources, every conversion record's bytes equal the
    direct (in-memory) extraction of its page, and file sharding is
    preserved (the CommonCrawl WET contract)."""
    import glob as _glob

    from pyspark.sql import functions as F

    from codegraph_spark.queries.web import (
        _keep,
        _warc_fixture_dir,
        _wet_fixture_dir,
        html_block_stats,
    )
    from codegraph_spark.sources.warc import read_warc_responses

    warc_root = _warc_fixture_dir(spark, sf_dir)
    wet_root = _wet_fixture_dir(spark, sf_dir)
    warc_files = sorted(
        os.path.basename(p)[: -len(".warc.gz")]
        for p in _glob.glob(os.path.join(warc_root, "*.warc.gz"))
    )
    wet_files = sorted(
        os.path.basename(p)[: -len(".warc.wet.gz")]
        for p in _glob.glob(os.path.join(wet_root, "*.warc.wet.gz"))
    )
    assert wet_files == warc_files  # 1:1 sharding

    direct = {
        r["url"]: r["x"]
        for r in read_warc_responses(spark, warc_root)
        .filter(F.col("http_status") == 200)
        .select(
            "url",
            F.array_join(
                F.transform(
                    F.filter(html_block_stats(F.col("page")), _keep),
                    lambda s: s["txt"],
                ),
                "\n",
            ).alias("x"),
        )
        .collect()
    }
    got = {
        r["url"]: bytes(r["payload"]).decode("utf-8")
        for r in read_warc_records(spark, wet_root, glob="*.warc.wet.gz")
        .filter(F.col("rec_type") == "conversion")
        .collect()
    }
    assert set(got) == set(direct) and direct
    for url, x in direct.items():
        assert got[url] == x


def test_read_warc_http_preserves_binary_bytes(spark, tmp_path):
    """The binary door must hand back body bytes EXACTLY (a string
    round trip would corrupt anything non-UTF-8) and parse the
    Content-Type parameterless and lowercased."""
    body = bytes(range(256)) * 2
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: Image/PNG; charset=binary\r\n"
        + f"Content-Length: {len(body)}\r\n\r\n".encode()
        + body
    )
    rec = warc_record_bytes(
        "response", "https://h/img", http, "rb",
        content_type="application/http;msgtype=response",
    )
    d = tmp_path / "w"
    d.mkdir()
    write_warc(str(d / "a.warc.gz"), [rec])

    from codegraph_spark.sources.warc import read_warc_http

    rows = read_warc_http(spark, str(d)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["http_status"] == 200
    assert r["content_type"] == "image/png"
    assert bytes(r["body"]) == body
