"""URL / domain curation operators — the web-corpus intake face.

The reference ingests web content through a scrapy spider
(``reference/src/python/pharmgkb/spiders/Gene.py:62-101``, out of
engine scope per SURVEY §2.1/S12); what the ENGINE needs at the 100 TB
training-data target is the curation layer every web-scale corpus
pipeline applies after the crawl (C4, RefinedWeb, Gopher):

* :func:`parse_urls` — scheme / host / registered-domain / path /
  query columns from a URL column.
* :func:`canonicalize_urls` — a small, explicitly documented rule set
  (lowercase scheme+authority, strip fragment, strip default port,
  strip tracking query params) so byte-different duplicate URLs dedup
  exactly.
* :func:`filter_blocked_domains` — registered-domain blocklist.
* :func:`cap_per_domain` — deterministic "at most k documents per
  domain" (RefinedWeb's anti-domination rule) as an exact two-phase
  hash-priority top-k.

Scale shape: parse / canonicalize / blocklist(list form) are pure
map-side column programs — zero shuffle, fully pushed into the scan
projection. A DataFrame blocklist joins as a broadcast anti-join
(blocklists are dimension-sized). ``cap_per_domain`` is the one
shuffling operator and is deliberately two-phase: a per-(domain, salt)
pre-cap bounds any single window partition to ~|domain|/salt_buckets
rows before the per-domain cap runs, so one mega-domain (the exact
thing the cap exists to tame) can never funnel into a single task —
the same two-phase discipline as ``operators/fk.assign_ids`` and
``operators/packing``.

Determinism contract: the cap keeps the k smallest
``md5(seed || key)`` priorities per domain — the
``operators/sampling`` hash-band contract — so reruns, retries, other
engines, and unrelated appends never flip which documents survive.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from haplorec_spark.operators.sampling import _key_str

#: Multi-label public suffixes where the registered domain is the LAST
#: THREE labels (bbc.co.uk), not two. A pragmatic subset of the public
#: suffix list — the full list is a data file a deployment should feed
#: in via ``extra_suffixes``; these cover the common ccTLD patterns.
MULTI_PART_SUFFIXES: tuple[str, ...] = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "net.nz", "org.nz",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "co.kr", "or.kr", "com.br", "org.br", "net.br",
    "com.mx", "com.ar", "com.cn", "net.cn", "org.cn",
    "com.sg", "com.hk", "com.tw", "com.tr", "co.in", "co.za",
)

#: Query parameters stripped by :func:`canonicalize_urls`: pure
#: click-tracking state that never changes the resource (the C4-style
#: canonicalization set). ``utm_*`` matches by prefix.
TRACKING_PARAM_RE = (
    "^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|mc_eid|igshid|ref_src)$"
)

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_REST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"


def _registered_domain_col(host) -> "F.Column":
    """Registered domain from a lowercased host: the last two labels,
    or three when the last two are a multi-part public suffix."""
    labels = F.split(host, r"\.")
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    return (
        F.when(F.size(labels) < 2, host)
        .when(
            (F.size(labels) >= 3) & last2.isin(*MULTI_PART_SUFFIXES), last3
        )
        .otherwise(last2)
    )


def parse_urls(
    df: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Add ``scheme``, ``host``, ``registered_domain``, ``path``,
    ``query`` columns parsed from ``url_col``.

    Pure map-side regexp projection (zero shuffle; prunes into the
    scan). ``host`` is lowercased with any ``:port`` and userinfo
    removed; a URL with no ``scheme://`` yields empty-string parts
    rather than nulls so downstream grouping keys stay total.
    """
    scheme = F.lower(F.regexp_extract(F.col(url_col), _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(F.col(url_col), _AUTH_RE, 1))
    host = F.regexp_replace(
        F.regexp_replace(auth, "^[^@]*@", ""), ":[0-9]*$", ""
    )
    # a scheme-less string has no authority to anchor on: every part is
    # the empty string, not a misparse of the raw text as a path
    rest = F.when(scheme == "", F.lit("")).otherwise(
        F.regexp_replace(F.col(url_col), _REST_RE, "")
    )
    return (
        df.withColumn("scheme", scheme)
        .withColumn("host", host)
        .withColumn("registered_domain", _registered_domain_col(host))
        .withColumn(
            "path", F.regexp_extract(rest, r"^([^?#]*)", 1)
        )
        .withColumn(
            "query", F.regexp_extract(rest, r"\?([^#]*)", 1)
        )
    )


def canonicalize_urls(
    df: DataFrame,
    url_col: str = "url",
    *,
    out_col: str | None = None,
    tracking_param_re: str = TRACKING_PARAM_RE,
) -> DataFrame:
    """Rewrite ``url_col`` to a canonical form (into ``out_col``, or in
    place) so byte-different duplicates of the same resource compare
    equal in exact dedup / per-URL grouping.

    The rule set — small and explicit, each rule independently safe:

    1. strip the ``#fragment`` (client-side only),
    2. lowercase the scheme and authority (RFC 3986 §6.2.2.1; path and
       query stay case-sensitive),
    3. strip an explicit default port (``:80`` for http, ``:443`` for
       https),
    4. drop tracking query parameters (name matches
       ``tracking_param_re``; remaining params KEEP their order —
       reordering is not semantics-preserving in general),
    5. drop the ``?`` if no params remain.

    One map-side projection — zero shuffle at any corpus size. URLs
    with no ``scheme://`` pass through with only the fragment rule
    applied (nothing to lowercase or split safely).
    """
    out = out_col or url_col
    base = F.regexp_replace(F.col(url_col), "#.*", "")
    scheme = F.lower(F.regexp_extract(base, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(base, _AUTH_RE, 1))
    auth = (
        F.when(
            scheme == "http", F.regexp_replace(auth, ":80$", "")
        )
        .when(scheme == "https", F.regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    )
    rest = F.regexp_replace(base, _REST_RE, "")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_extract(rest, r"\?(.*)", 1)
    kept = F.expr(
        f"filter(split({'_q_'}, '&'),"
        f" p -> p != '' AND NOT regexp_extract(p, '^([^=]*)', 1)"
        f" rlike '{tracking_param_re}')"
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(
            F.size(F.col("_kept_")) > 0,
            F.concat(F.lit("?"), F.array_join(F.col("_kept_"), "&")),
        ).otherwise(F.lit("")),
    )
    return (
        df.withColumn("_q_", query)
        .withColumn("_kept_", kept)
        .withColumn(
            out,
            F.when(scheme == "", base).otherwise(canon),
        )
        .drop("_q_", "_kept_")
    )


def filter_blocked_domains(
    df: DataFrame,
    blocked: Sequence[str] | DataFrame,
    *,
    domain_col: str = "registered_domain",
) -> DataFrame:
    """Drop rows whose ``domain_col`` is on the blocklist.

    ``blocked`` as a Python sequence compiles to a literal ``isin``
    filter — map-side, pushes into the scan, the common case (curated
    blocklists are thousands of entries). ``blocked`` as a single-
    column DataFrame joins as a broadcast LEFT ANTI (blocklists are
    dimension-sized by definition; a corpus-proportional "blocklist"
    is a dedup problem, not a blocklist). Matching is exact on the
    registered domain — subdomains are already collapsed by
    :func:`parse_urls`, so blocking ``spam.com`` blocks
    ``a.b.spam.com`` through its registered domain.
    """
    if isinstance(blocked, DataFrame):
        bl = blocked.toDF("__blocked_domain")
        return df.join(
            F.broadcast(bl),
            on=df[domain_col] == bl["__blocked_domain"],
            how="left_anti",
        )
    if not blocked:
        return df
    return df.filter(~F.col(domain_col).isin(*[str(b) for b in blocked]))


def cap_per_domain(
    df: DataFrame,
    max_per_domain: int,
    key_cols: Sequence[str],
    *,
    domain_col: str = "registered_domain",
    seed: str = "domain_cap",
    salt_buckets: int = 32,
) -> DataFrame:
    """Keep at most ``max_per_domain`` rows per domain — the k rows
    with the SMALLEST ``md5(seed || key)`` priorities (ties broken by
    the key columns), so the survivor set is deterministic across
    reruns, engines, and partitionings, and stable under unrelated
    appends (a domain under its cap never churns).

    Exact two-phase top-k: phase 1 caps per (domain, salt) where the
    salt derives from the priority hash itself, bounding any single
    window partition to ~|domain| / ``salt_buckets`` rows; phase 2
    caps the ≤ ``salt_buckets × k`` survivors per domain. The global
    k smallest priorities of a domain are the union of each salt
    bucket's k smallest, so the result is identical to the
    single-window form — but the mega-domain a cap exists to tame
    (phase 2 input bounded, phase 1 spread across buckets) can never
    funnel the corpus into one task. ``salt_buckets`` trades phase-2
    input (buckets × k per domain) against phase-1 spread; the
    output is invariant to it.
    """
    if max_per_domain < 1:
        raise ValueError(
            f"max_per_domain must be >= 1, got {max_per_domain}"
        )
    pr = F.md5(_key_str(seed, key_cols))
    salt = F.pmod(
        F.conv(F.substring(pr, 1, 8), 16, 10).cast("bigint"),
        F.lit(int(salt_buckets)),
    )
    order = [F.col("_pr")] + [F.col(c) for c in key_cols]
    w1 = Window.partitionBy(domain_col, "_salt").orderBy(*order)
    w2 = Window.partitionBy(domain_col).orderBy(*order)
    return (
        df.withColumn("_pr", pr)
        .withColumn("_salt", salt)
        .withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= max_per_domain)
        .withColumn("_rn2", F.row_number().over(w2))
        .filter(F.col("_rn2") <= max_per_domain)
        .drop("_pr", "_salt", "_rn", "_rn2")
    )


# ------------------------------------------------------ query registration

from haplorec_spark.queries import register, table  # noqa: E402
from haplorec_spark.operators.sampling import DUCK_BAND  # noqa: E402,F401

#: DuckDB replica of the canonicalize+parse+block+cap chain over a
#: synthetic URL (the documents table has no URL column; the gate
#: derives one deterministically from (source, doc_id), the same
#: in-query seeding the dedup gates use).
_WEB_GATE_SQL = """
    WITH raw AS (
        SELECT doc_id,
               'HTTPS://WWW.' || upper(source) || '-Site.org:443/p/'
                   || doc_id::VARCHAR || '?utm_campaign=z&q='
                   || doc_id::VARCHAR || '#frag' AS url
        FROM documents),
    canon AS (
        SELECT doc_id,
               'https://www.' || lower(source) || '-site.org/p/'
                   || doc_id::VARCHAR || '?q=' || doc_id::VARCHAR AS url,
               lower(source) || '-site.org' AS registered_domain
        FROM documents),
    pri AS (
        SELECT doc_id, url, registered_domain,
               md5('domain_cap' || chr(31) || doc_id::VARCHAR) AS pr
        FROM canon
        WHERE registered_domain NOT IN
              ('src0-site.org', 'src1-site.org')),
    ranked AS (
        SELECT doc_id, url, registered_domain,
               row_number() OVER (PARTITION BY registered_domain
                                  ORDER BY pr, doc_id) AS rn
        FROM pri)
    SELECT doc_id, registered_domain, url
    FROM ranked WHERE rn <= 5
"""


@register(
    "q_web_domain_cap",
    _WEB_GATE_SQL,
    "URL curation chain: canonicalize (case, default port, tracking "
    "params, fragment) -> registered-domain extraction -> domain "
    "blocklist -> deterministic 5-per-domain cap (two-phase hash-"
    "priority top-k; the oracle's single window is the equivalence "
    "the two-phase form must reproduce)",
)
def q_web_domain_cap(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://WWW."),
            F.upper("source"),
            F.lit("-Site.org:443/p/"),
            F.col("doc_id").cast("string"),
            F.lit("?utm_campaign=z&q="),
            F.col("doc_id").cast("string"),
            F.lit("#frag"),
        ).alias("url"),
    )
    canon = canonicalize_urls(docs, "url")
    parsed = parse_urls(canon, "url").select(
        "doc_id", "registered_domain", "url"
    )
    unblocked = filter_blocked_domains(
        parsed, ["src0-site.org", "src1-site.org"]
    )
    return cap_per_domain(
        unblocked, 5, ["doc_id"], seed="domain_cap"
    ).select("doc_id", "registered_domain", "url")
