"""WARC/WET source tests over hand-built ISO 28500 fixtures.

The fixtures are written byte-by-byte here (record framing, gzip
member layout, HTTP captures, charset declarations, deliberate
corruption), so every assertion is a golden check against the spec —
there is no reference implementation in the loop.
"""

from __future__ import annotations

import gzip

import pytest

from haplorec_spark.sources import warc_source, wet_source


def _record(
    rtype: str,
    payload: bytes,
    *,
    uri: str | None = "http://example.com/a",
    rid: str = "<urn:uuid:0001>",
    date: str = "2024-03-01T12:30:00Z",
    ctype: str = "text/plain",
    declared_length: int | None = None,
) -> bytes:
    headers = [b"WARC/1.0"]
    headers.append(b"WARC-Type: " + rtype.encode())
    headers.append(b"WARC-Record-ID: " + rid.encode())
    headers.append(b"WARC-Date: " + date.encode())
    if uri is not None:
        headers.append(b"WARC-Target-URI: " + uri.encode())
    headers.append(b"Content-Type: " + ctype.encode())
    n = len(payload) if declared_length is None else declared_length
    headers.append(b"Content-Length: " + str(n).encode())
    return b"\r\n".join(headers) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _http_response(body: bytes, charset: str | None) -> bytes:
    ct = b"Content-Type: text/html" + (
        b"; charset=" + charset.encode() if charset else b""
    )
    return (
        b"HTTP/1.1 200 OK\r\n" + ct + b"\r\nServer: x\r\n\r\n" + body
    )


WET_BYTES = (
    _record(
        "warcinfo", b"software: test\r\n", uri=None, rid="<urn:uuid:info>",
        ctype="application/warc-fields",
    )
    + _record(
        "conversion",
        "the house is big\nand the water is cold in the winter".encode(),
        uri="http://example.com/en", rid="<urn:uuid:en1>",
    )
    + _record(
        "conversion", "我们的房子很大冬天的水很冷孩子们在学校读书".encode(),
        uri="http://example.org/zh", rid="<urn:uuid:zh1>",
        date="2024-03-02T01:02:03Z",
    )
)


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    (d / "a.warc").write_bytes(WET_BYTES)
    # the member-gzip layout: each record its own gzip member
    members = b"".join(
        gzip.compress(m)
        for m in (
            _record(
                "response",
                _http_response("héllo latin-1 café".encode("latin-1"),
                               "latin-1"),
                uri="http://example.com/latin", rid="<urn:uuid:l1>",
                ctype='application/http;msgtype=response',
            ),
            _record(
                "response",
                _http_response(b"\xff\xfe\x00bad", "utf-8"),
                uri="http://example.com/bad", rid="<urn:uuid:b1>",
                ctype='application/http;msgtype=response',
            ),
            _record(
                "response",
                _http_response("plain utf-8 body".encode(), None),
                uri="http://example.com/plain", rid="<urn:uuid:p1>",
                ctype='application/http;msgtype=response',
            ),
        )
    )
    (d / "b.warc.gz").write_bytes(members)
    # truncated payload: declared length overruns the stream
    (d / "c.warc").write_bytes(
        _record("conversion", b"short", declared_length=500,
                rid="<urn:uuid:t1>")
    )
    return str(d)


def test_wet_records_parse_with_headers(spark, warc_dir):
    rows = {
        r["record_id"]: r
        for r in warc_source(spark, warc_dir + "/a.warc").collect()
    }
    assert set(rows) == {"<urn:uuid:en1>", "<urn:uuid:zh1>"}  # warcinfo filtered
    en = rows["<urn:uuid:en1>"]
    en_text = "the house is big\nand the water is cold in the winter"
    assert en["text"] == en_text
    assert en["target_uri"] == "http://example.com/en"
    assert en["warc_date"] == "2024-03-01T12:30:00Z"
    assert en["record_type"] == "conversion"
    assert en["content_length"] == len(en_text)
    assert en["_corrupt_record"] is None
    assert rows["<urn:uuid:zh1>"]["text"] == "我们的房子很大冬天的水很冷孩子们在学校读书"


def test_warcinfo_kept_when_types_none(spark, warc_dir):
    types = {
        r["record_type"]
        for r in warc_source(
            spark, warc_dir + "/a.warc", record_types=None
        ).collect()
    }
    assert types == {"warcinfo", "conversion"}


def test_gzip_members_http_strip_and_charsets(spark, warc_dir):
    rows = {
        r["record_id"]: r
        for r in warc_source(spark, warc_dir + "/b.warc.gz").collect()
    }
    assert rows["<urn:uuid:l1>"]["text"] == "héllo latin-1 café"
    assert rows["<urn:uuid:p1>"]["text"] == "plain utf-8 body"
    bad = rows["<urn:uuid:b1>"]
    assert bad["text"] is None
    assert "decode failed" in bad["_corrupt_record"]
    # HTTP header block stripped, not part of the text
    assert "HTTP/1.1" not in (rows["<urn:uuid:l1>"]["text"] or "")


def test_truncated_record_quarantined_not_dropped(spark, warc_dir):
    rows = warc_source(spark, warc_dir + "/c.warc").collect()
    assert len(rows) == 1
    assert "truncated payload" in rows[0]["_corrupt_record"]
    assert rows[0]["text"] is None
    assert rows[0]["record_id"] == "<urn:uuid:t1>"


def test_record_offsets_are_stream_positions(spark, warc_dir):
    rows = sorted(
        warc_source(spark, warc_dir + "/a.warc", record_types=None)
        .collect(),
        key=lambda r: r["record_offset"],
    )
    assert rows[0]["record_offset"] == 0
    # each next record starts exactly at the previous frame's end
    for prev, cur in zip(rows, rows[1:]):
        assert cur["record_offset"] > prev["record_offset"]
        assert cur["record_ix"] == prev["record_ix"] + 1


def test_wet_source_shape_and_curation_composition(spark, warc_dir):
    from haplorec_spark.curation import CurationConfig, map_side_curation
    from haplorec_spark.operators.web import canonicalize_urls

    docs = wet_source(spark, warc_dir + "/a.warc")
    assert docs.columns == [
        "doc_id", "url", "fetch_time", "text", "_corrupt_record"
    ]
    got = {r["doc_id"]: r for r in docs.collect()}
    assert got["<urn:uuid:en1>"]["url"] == "http://example.com/en"
    assert got["<urn:uuid:zh1>"]["fetch_time"] is not None

    # URL column feeds the web-domain operators unchanged
    canon = canonicalize_urls(docs, url_col="url").collect()
    assert len(canon) == 2

    # and the frame curates: script segmentation + ngram language
    # detection keep BOTH the English and the zh conversion record
    out = map_side_curation(
        docs.select("doc_id", "text"),
        CurationConfig(
            detect_language="ngram",
            languages=["en", "zh"],
            segmentation="script",
            min_quality=0.7,
            redact=False,
        ),
    )
    kept = {r["doc_id"] for r in out.collect()}
    assert kept == {"<urn:uuid:en1>", "<urn:uuid:zh1>"}
