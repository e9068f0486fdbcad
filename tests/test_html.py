"""HTML → text extraction goldens + cross-engine (DuckDB twin) parity.

The golden fixtures are hand-written messy HTML; expected outputs are
derived from the module contract (script/style/title/comment removal,
block tags → newlines, inline tags → spaces, fixed entity table with
``&amp;`` last, whitespace collapse), not from any implementation.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql.functions import col as F_col

from haplorec_spark.operators.html import (
    duck_html_text_sql,
    duck_html_title_sql,
    extract_html_text,
)

MESSY = (
    "<HTML><head><TITLE lang=en>A &amp; B &#39;s</TITLE>"
    "<style media='all'>body { color: red }</style></head>"
    "<BODY class=x><!-- comment with <p>tags</p> inside -->"
    "<SCRIPT type='text/javascript'>var s = '</div>';</SCRIPT>"
    "<h1 id='t'>Head&nbsp;line</h1>"
    "<p>first <b>bold</b>paragraph &amp;lt;raw&gt;</p>"
    "<ul><li>one</li><li>two</li></ul>"
    "<div>last   line\twith&quot;quotes&quot;</div></BODY></HTML>"
)
#: Derived by hand from the contract: title removed from body; h1/p/
#: li/ul/div boundaries become newlines (runs collapse to at most a
#: paragraph break); ``</b>`` becomes a space so "bold paragraph"
#: stays two words; ``&amp;lt;`` decodes ONE level to a literal
#: ``&lt;``; ``&nbsp;``/``&quot;`` decode; tabs and space runs fold.
MESSY_TEXT = (
    "Head line\nfirst bold paragraph &lt;raw>\none\ntwo\n"
    'last line with"quotes"'
)
MESSY_TITLE = "A & B 's"

NO_TITLE = "<p>plain</p>"
EMPTY_TITLE = "<title></title><p>x y</p>"
UNCLOSED_SCRIPT = "<p>keep</p><script>var leak = 1;"
MULTILINE = (
    "<div>para one</div>\n\n\n\n<div>para two</div>"
    "<br><br><br><p>para three</p>"
)


def _extract(spark, rows):
    df = spark.createDataFrame(rows, "doc_id INT, html STRING")
    return {
        r["doc_id"]: (r["title"], r["text"])
        for r in extract_html_text(df).collect()
    }


def test_messy_golden(spark):
    out = _extract(spark, [(1, MESSY)])
    assert out[1] == (MESSY_TITLE, MESSY_TEXT)


def test_no_title_and_empty_title_are_null(spark):
    out = _extract(spark, [(1, NO_TITLE), (2, EMPTY_TITLE)])
    assert out[1] == (None, "plain")
    assert out[2] == (None, "x y")


def test_null_html_is_null_text(spark):
    out = _extract(spark, [(1, None)])
    assert out[1] == (None, None)


def test_unclosed_script_degrades_to_tag_strip(spark):
    # documented contract: the non-greedy span never matches, the open
    # tag is stripped by the any-tag rule, the body LEAKS — quality
    # filters own quarantining such documents
    out = _extract(spark, [(1, UNCLOSED_SCRIPT)])
    assert out[1] == (None, "keep\nvar leak = 1;")


def test_block_runs_collapse_to_single_lines(spark):
    out = _extract(spark, [(1, MULTILINE)])
    # raw blank lines + stacked <br> + block boundaries all collapse
    # to ONE newline: one output line per block element, never blank
    assert out[1] == (None, "para one\npara two\npara three")


def test_entity_decode_order(spark):
    # &amp; decodes LAST: double-escaped text yields the literal entity
    out = _extract(spark, [(1, "<p>&amp;nbsp; &amp; &lt;tag&gt;</p>")])
    assert out[1] == (None, "&nbsp; & <tag>")


@pytest.mark.parametrize(
    "html",
    [MESSY, NO_TITLE, EMPTY_TITLE, UNCLOSED_SCRIPT, MULTILINE,
     "<p>&amp;nbsp; &amp; &lt;tag&gt;</p>", None],
)
def test_duckdb_twin_parity(spark, html):
    """The DuckDB oracle builders must reproduce the Spark extraction
    byte-for-byte on every golden fixture — the same pin the driver's
    correctness harness applies at corpus scale."""
    got = _extract(spark, [(1, html)])[1]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (html VARCHAR)")
    con.execute("INSERT INTO t VALUES (?)", [html])
    want = con.execute(
        f"SELECT {duck_html_title_sql('html')},"
        f" {duck_html_text_sql('html')} FROM t"
    ).fetchone()
    assert got == tuple(want)


def test_warc_composition(spark, tmp_path):
    """response-record HTML from warc_source flows through
    extract_html_text into curation-ready line-structured text."""
    from haplorec_spark.sources import warc_source

    body = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8"
        b"\r\n\r\n<html><head><title>T</title></head>"
        b"<body><p>hello crawl</p><p>second line</p></body></html>"
    )
    headers = [
        b"WARC/1.0",
        b"WARC-Type: response",
        b"WARC-Record-ID: <urn:uuid:1>",
        b"WARC-Date: 2024-03-01T12:30:00Z",
        b"WARC-Target-URI: http://example.com/x",
        b"Content-Type: application/http;msgtype=response",
        b"Content-Length: " + str(len(body)).encode(),
    ]
    (tmp_path / "one.warc").write_bytes(
        b"\r\n".join(headers) + b"\r\n\r\n" + body + b"\r\n\r\n"
    )
    recs = warc_source(spark, str(tmp_path / "one.warc"))
    out = extract_html_text(
        recs.select(F_col("record_id").alias("doc_id"), "text"),
        html_col="text",
    ).collect()
    assert len(out) == 1
    assert out[0]["title"] == "T"
    assert out[0]["text"] == "hello crawl\nsecond line"


def test_keep_passes_provenance_columns(spark):
    df = spark.createDataFrame(
        [(1, "<p>x</p>", "http://e.com/a", "2024-01-01")],
        "doc_id INT, html STRING, target_uri STRING, warc_date STRING",
    )
    out = extract_html_text(df, keep=("target_uri", "warc_date"))
    assert out.columns == [
        "doc_id", "title", "text", "target_uri", "warc_date"
    ]
    row = out.collect()[0]
    assert row["target_uri"] == "http://e.com/a" and row["text"] == "x"
