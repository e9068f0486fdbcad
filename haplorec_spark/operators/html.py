"""HTML → text extraction: the step between :func:`~haplorec_spark.
sources.warc_source` (whose ``response`` records carry raw HTML) and
the curation/quality/dedup operators (which consume line-structured
plain text).

Scale shape: the whole extractor is ONE map-side column program — a
fixed chain of ``regexp_replace`` / ``replace`` expressions over the
HTML column, no UDF, no shuffle, whole-stage-codegen friendly. At
100 TB the extractor adds zero exchanges to the WARC scan; throughput
is regex cost per byte, the same cost model as the quality metrics.

Fidelity contract (documented, test-pinned): this is the
deterministic-rule tier of extraction, not a DOM renderer —
*   ``<script>`` / ``<style>`` / ``<title>`` elements and
    ``<!-- comments -->`` are removed with non-greedy spans (the title
    is extracted into its own column first; an UNCLOSED script tag
    degrades to tag-stripping, leaking its body as text — quarantining
    such documents is the job of the quality filters downstream).
*   Block-level tags (the ``BLOCK_TAGS`` list, open or close, plus
    ``<br>``/``<hr>``) become newlines, then newline runs collapse to
    ONE — the output is one line per block element (never blank
    lines), the input contract of ``strip_boilerplate_lines``,
    ``chunk_documents`` and the Gopher line metrics.
*   Every other tag becomes a single space (inline tags must not glue
    ``end</b>Start`` into one word).
*   Entities decode from the fixed ``HTML_ENTITIES`` table (the six
    ubiquitous named forms + ``&#39;``); ``&amp;`` decodes LAST so
    double-escaped text (``&amp;lt;``) correctly yields the literal
    ``&lt;``. Numeric/code-point entities beyond that table pass
    through verbatim — an explicit bound, not an oversight: decoding
    arbitrary ``&#NNN;`` needs a per-row codepoint-construction loop that would
    drop the operator out of the column-program tier, and the fixed
    table covers the overwhelming share of real-crawl entity mass.

Every rule is a module-level literal shared by the Spark expression
chain and the DuckDB oracle builder (:func:`duck_html_text_sql`), so
the two engines agree on the extraction by construction.

No reference counterpart: haplorec ingests DSV/HTTP-API rows, not web
archives (closest is the scrapy spider at
``reference/src/python/pharmgkb/spiders/Gene.py``, declared out of
engine scope by SURVEY §2.1); this face exists for the crawl-scale
training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "BLOCK_TAGS",
    "HTML_ENTITIES",
    "extract_html_text",
    "duck_html_text_sql",
    "duck_html_title_sql",
]

#: Tags whose boundaries (open or close) separate lines/paragraphs.
BLOCK_TAGS = (
    "p", "div", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
    "tr", "table", "blockquote", "pre", "section", "article", "header",
    "footer", "nav", "aside", "br", "hr",
)

#: Fixed entity table, decode order significant: ``&amp;`` LAST so
#: double-escaped entities decode one level, never two.
HTML_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

#: Non-greedy removal spans. RE2 (the DuckDB oracle engine) has no
#: lookahead, so these stick to flags + lazy quantifiers, which both
#: Java regex (Spark) and RE2 support identically.
_REMOVE_PATTERNS = (
    r"(?is)<script\b[^>]*>.*?</script>",
    r"(?is)<style\b[^>]*>.*?</style>",
    r"(?is)<title\b[^>]*>.*?</title>",
    r"(?s)<!--.*?-->",
)

_TITLE_PATTERN = r"(?is)<title[^>]*>(.*?)</title>"


def _block_pattern() -> str:
    alts = "|".join(BLOCK_TAGS)
    return rf"(?is)</?(?:{alts})\b[^>]*>"


#: Any leftover tag (inline, unknown, malformed-but-closed) → space.
_ANY_TAG_PATTERN = r"(?s)<[^>]*>"


def _decode_entities(col: Column) -> Column:
    for ent, rep in HTML_ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(rep))
    return col


def _collapse_inline_ws(col: Column) -> Column:
    """Horizontal whitespace → single space; spaces hugging newlines
    dropped; newline runs → ONE newline (one line per block element —
    the line-keyed downstream operators' input contract; adjacent
    ``</li><li>`` boundaries and raw blank lines never produce blank
    output lines); outer whitespace trimmed."""
    col = F.regexp_replace(col, r"[ \t\x0B\f\r]+", " ")
    col = F.regexp_replace(col, r" *\n *", "\n")
    col = F.regexp_replace(col, r"\n{2,}", "\n")
    col = F.regexp_replace(col, r"^\s+", "")
    col = F.regexp_replace(col, r"\s+$", "")
    return col


def extract_html_text(
    docs: DataFrame,
    *,
    html_col: str = "html",
    id_col: str = "doc_id",
    title_col: str = "title",
    text_col: str = "text",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(id, title, text): deterministic-rule HTML extraction.

    ``title`` is the entity-decoded, whitespace-collapsed
    ``<title>`` payload (NULL when the document has none — or no
    parseable one); ``text`` is the line-structured body text per the
    module contract above. NULL html → NULL title and NULL text (the
    engine-wide NULL-text convention, same as the language-ID rungs).

    ``keep`` passes provenance columns through (the select is
    otherwise id+title+text only — review-caught): compose
    ``extract_html_text(warc_source(spark, path,
    record_types=("response",)), html_col="text", id_col="record_id",
    text_col="body", keep=("target_uri", "warc_date"))`` then feed
    ``curate_documents`` — the kept URL column drives the web.py
    domain operators.
    """
    html = F.col(html_col)

    title = F.regexp_extract(html, _TITLE_PATTERN, 1)
    # regexp_extract returns '' both for "no title" and "<title></title>";
    # either way an empty title is no title.
    title = F.nullif(
        _collapse_inline_ws(_decode_entities(title)), F.lit("")
    )
    # NULL html must stay NULL (regexp_extract propagates NULL, but the
    # nullif('') fold above would otherwise be the only guard for '')
    title = F.when(html.isNull(), F.lit(None)).otherwise(title)

    body = html
    for pat in _REMOVE_PATTERNS:
        body = F.regexp_replace(body, pat, " ")
    body = F.regexp_replace(body, _block_pattern(), "\n")
    body = F.regexp_replace(body, _ANY_TAG_PATTERN, " ")
    body = _collapse_inline_ws(_decode_entities(body))

    return docs.select(
        F.col(id_col),
        title.alias(title_col),
        body.alias(text_col),
        *[F.col(c) for c in keep],
    )


# --------------------------------------------------------------- oracle twin

def _duck_replace_chain(expr: str) -> str:
    for ent, rep in HTML_ENTITIES:
        rep_sql = rep.replace("'", "''")
        expr = f"replace({expr}, '{ent}', '{rep_sql}')"
    return expr


def _duck_collapse_ws(expr: str) -> str:
    nl = "chr(10)"
    expr = (
        f"regexp_replace({expr}, '[ ' || chr(9) || chr(11) || chr(12)"
        f" || chr(13) || ']+', ' ', 'g')"
    )
    expr = f"regexp_replace({expr}, ' *' || {nl} || ' *', {nl}, 'g')"
    expr = f"regexp_replace({expr}, {nl} || '{{2,}}', {nl}, 'g')"
    expr = f"regexp_replace({expr}, '^\\s+', '')"
    expr = f"regexp_replace({expr}, '\\s+$', '')"
    return expr


def duck_html_text_sql(expr: str) -> str:
    """DuckDB twin of the body-text chain, built from the SAME module
    literals (``'g'`` flags added — DuckDB replaces first-match only by
    default where Spark replaces all)."""
    body = expr
    for pat in _REMOVE_PATTERNS:
        p = pat.replace("'", "''")
        body = f"regexp_replace({body}, '{p}', ' ', 'g')"
    blk = _block_pattern().replace("'", "''")
    body = f"regexp_replace({body}, '{blk}', chr(10), 'g')"
    anyt = _ANY_TAG_PATTERN.replace("'", "''")
    body = f"regexp_replace({body}, '{anyt}', ' ', 'g')"
    return _duck_collapse_ws(_duck_replace_chain(body))


def duck_html_title_sql(expr: str) -> str:
    """DuckDB twin of the title chain (NULL html propagates through
    regexp_extract; '' folds to NULL via nullif, matching Spark)."""
    pat = _TITLE_PATTERN.replace("'", "''")
    t = f"regexp_extract({expr}, '{pat}', 1)"
    return f"nullif({_duck_collapse_ws(_duck_replace_chain(t))}, '')"


# ------------------------------------------------------------- driver gate

from haplorec_spark.queries import register, table  # noqa: E402

#: The gate wraps each document's plain text in a fixed messy-HTML
#: shell (uppercase title tag, style, a comment containing tags, a
#: script containing tags, entities incl. a double-escaped one) so the
#: extractor must exercise every rule tier on real data. Both engines
#: build the wrapper from THESE constants.
_GATE_PRE1 = "<html><head><TITLE>Doc "
_GATE_PRE2 = (
    " &amp; friends</TITLE><style type=\"text/css\">p {color: red}"
    "</style></head><body><!-- hidden <p>secret</p> -->"
    "<script>var x = \"<p>no</p>\";</script><H1>Doc "
)
_GATE_PRE3 = "</H1><p>"
_GATE_SUF = (
    " rest&nbsp;here</p><br><div>tail &lt;EOF&gt; &amp;lt;keep&gt;"
    "</div></body></html>"
)


def _gate_wrap_duck() -> str:
    did = "doc_id::VARCHAR"
    return (
        f"'{_GATE_PRE1}' || {did} || '{_GATE_PRE2}' || {did} || "
        f"'{_GATE_PRE3}' || text || '{_GATE_SUF}'"
    )


@register(
    "q_html_extract",
    f"""
    SELECT doc_id,
           {duck_html_title_sql(_gate_wrap_duck())} AS title,
           {duck_html_text_sql(_gate_wrap_duck())} AS text
    FROM documents
    """,
    "deterministic-rule HTML -> text extraction (the WARC response "
    "path): script/style/comment removal, block tags -> newlines, "
    "inline tags -> spaces, fixed entity table with &amp; last, "
    "whitespace collapse; map-side only",
)
def q_html_extract(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit(_GATE_PRE1), did, F.lit(_GATE_PRE2), did,
        F.lit(_GATE_PRE3), F.col("text"), F.lit(_GATE_SUF),
    )
    return extract_html_text(
        docs.select("doc_id", html.alias("html")), html_col="html"
    )
