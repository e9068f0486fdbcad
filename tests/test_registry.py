"""Registry hygiene — no Spark session needed.

The driver's correctness gate depends on invariants that are easy to
break silently when adding a query: every entry documented, every
oracle referencing only the pre-registered tables, and rows-only
entries kept to the genuinely non-SQL-expressible few.
"""

from __future__ import annotations

import re

from haplorec_spark.queries import TABLES, registry

#: Every registered gate now carries a DuckDB oracle (the md5-derived
#: FAKE payloads made the multimodal kernels SQL-recomputable).
KNOWN_ROWS_ONLY: set[str] = set()


def test_every_query_documented():
    for name, q in registry().items():
        assert q.doc, f"{name} has no doc string"
        assert q.fn.__doc__ or q.doc  # at least the registry doc


def test_oracles_bind_in_duckdb():
    """Every oracle must parse AND bind (tables, columns, functions)
    against the driver's pre-registered views — DuckDB's binder is the
    authority, not a regex."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    for name, q in registry().items():
        if q.sql is None:
            continue
        try:
            con.execute(f"EXPLAIN {q.sql}")
        except Exception as e:  # pragma: no cover - assertion payload
            raise AssertionError(f"{name} oracle fails to bind: {e}") from e


def test_rows_only_set_is_closed():
    rows_only = {n for n, q in registry().items() if q.sql is None}
    assert rows_only == KNOWN_ROWS_ONLY, (
        "rows-only entries changed; every new query should carry a DuckDB "
        f"oracle unless genuinely non-SQL-expressible: {rows_only}"
    )


def test_registry_fits_driver_correctness_budget():
    """The driver's correctness harness checks at most 50 queries (in
    registration order); round 1 registered 52 and the last two got no
    CORRECTNESS row at all. The driver contract also forbids REMOVING
    a declared query, so additions beyond 50 are allowed exactly when
    they register AFTER every round-11 query (queries.ADDED_AFTER_BUDGET
    pins them to the tail): the checked-50 window then stays identical
    to round 11's declared set and the addition accepts a
    possibly-absent correctness row."""
    from haplorec_spark.queries import ADDED_AFTER_BUDGET

    names = list(registry())
    assert len(names) <= 50 + len(ADDED_AFTER_BUDGET), (
        "registry exceeds the driver's 50-query correctness budget plus "
        "the declared post-budget additions; fold the new gate into an "
        "existing one or retire a subsumed gate"
    )
    assert names[50:] == list(ADDED_AFTER_BUDGET)[: max(len(names) - 50, 0)], (
        "a post-round-11 addition sits inside the first-50 checked "
        "window, displacing a round-11 query's correctness row"
    )
    # the round-11 declared set is exactly the checked window
    assert "q_rollup_pricing" in names[:50]


def test_names_are_snake_case_and_unique():
    names = list(registry())
    assert len(names) == len(set(names))
    for n in names:
        assert re.fullmatch(r"q[0-9]*[a-z0-9_]*", n), n


#: DuckDB oracles for queries rotated OUT of the 50-entry driver budget
#: (round 5: their slots went to the round-4 operator families). They
#: stay correct via this test even though the driver no longer gates them.
ROTATED_OUT_ORACLES = {
    "q_union_distinct": """
        SELECT c_custkey FROM customer
        WHERE c_mktsegment = 'MACHINERY' AND c_acctbal > 3000
        UNION
        SELECT o_custkey AS c_custkey FROM orders
        WHERE o_totalprice > 150000
    """,
    "q_distinct_projection": "SELECT DISTINCT p_brand, p_type FROM part",
    "q_semi_join": """
        SELECT s_suppkey, s_name FROM supplier s
        WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s.s_suppkey)
    """,
    "q_large_orders": """
        SELECT o_orderkey, o_custkey, round(sum(l_quantity), 2) AS total_qty
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderkey, o_custkey
        HAVING sum(l_quantity) > 150
    """,
    "q_anti_join": """
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c.c_custkey
                            AND o_orderdate >= TIMESTAMP '1998-01-01')
    """,
    "q_first_order_per_customer": """
        SELECT o_custkey, o_orderkey, o_orderdate
        FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey)
                         AS rn
              FROM orders)
        WHERE rn = 1
    """,
    "q_phenotype_normalize":
        "SELECT p_partkey, lower(p_type) AS phenotype_name FROM part",
    "q_melt_part": """
        SELECT p_partkey, key, value FROM (
            SELECT p_partkey, 'retailprice' AS key,
                   p_retailprice::DOUBLE AS value FROM part
            UNION ALL
            SELECT p_partkey, 'size' AS key, p_size::DOUBLE AS value
            FROM part)
    """,
    "q_running_revenue": """
        SELECT CAST(month AS TIMESTAMP) AS month,
               round(CAST(sum(month_rev) OVER (ORDER BY month
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          AS DOUBLE), 2) AS running_rev
        FROM (SELECT date_trunc('month', o_orderdate) AS month,
                     sum(CAST(o_totalprice AS DECIMAL(18,2))) AS month_rev
              FROM orders GROUP BY 1)
    """,
    "q_top_supplier": """
        WITH revenue AS (
            SELECT l_suppkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS total_revenue
            FROM lineitem GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    # the max_doc_freq hot-shingle cut of ngram_jaccard_pairs (the
    # 100 TB join lever): shingles in > 1% of documents are dropped
    # BEFORE sizes/intersections, so Jaccard is over the cut sets.
    # test_jaccard_dfcut_changes_the_answer proves the cut is
    # non-vacuous at sf0.001.
    "q_dedup_ngram_jaccard_dfcut": """
        WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
                   FROM documents),
             sh0 AS (SELECT DISTINCT doc_id, shingle FROM (
                        SELECT doc_id,
                               unnest(CASE WHEN len(ws) >= 3
                                      THEN list_transform(
                                               generate_series(1, len(ws) - 2),
                                               i -> ws[i] || ' ' || ws[i+1]
                                                          || ' ' || ws[i+2])
                                      ELSE []::VARCHAR[] END) AS shingle
                        FROM w)),
             hot AS (SELECT shingle FROM sh0 GROUP BY shingle
                     HAVING count(*) >
                            0.01 * (SELECT count(DISTINCT doc_id)
                                    FROM documents)),
             sh AS (SELECT * FROM sh0
                    WHERE shingle NOT IN (SELECT shingle FROM hot)),
             sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh
                       GROUP BY doc_id),
             inter AS (SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                              count(*) AS n_common
                       FROM sh a JOIN sh b USING (shingle)
                       WHERE a.doc_id < b.doc_id
                       GROUP BY a.doc_id, b.doc_id)
        SELECT doc_id_a, doc_id_b, jaccard FROM (
            SELECT doc_id_a, doc_id_b,
                   round(n_common / (sa.n_sh + sb.n_sh - n_common), 6)
                       AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_id_a
            JOIN sizes sb ON sb.doc_id = doc_id_b)
        WHERE jaccard >= 0.2
    """,
}


def _text_normalize_oracle() -> str:
    """q_text_normalize's former driver-gate SQL (rotated out round 9,
    slot went to q_html_extract), built from the same literal rule
    constants as the operator."""
    from haplorec_spark.operators.text import _ACCENT_DST, _ACCENT_SRC

    return f"""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(regexp_replace(
               translate(lower(text), '{_ACCENT_SRC}', '{_ACCENT_DST}'),
               '[!-/:-@\\[-`{{-~]', ' ', 'g'),
               '[0-9]', '0', 'g'),
               '[ ' || chr(9) || chr(10) || chr(13) || ']+', ' ', 'g'))
               AS text_norm
    FROM documents
    """


ROTATED_OUT_ORACLES["q_text_normalize"] = _text_normalize_oracle()

#: q_min_cost_supplier's former driver-gate SQL (rotated out round 9,
#: slot went to q_bloom_member).
ROTATED_OUT_ORACLES["q_min_cost_supplier"] = """
    WITH mincost AS (
        SELECT l_partkey, min(l_extendedprice) AS min_price
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l.l_partkey, l.l_suppkey, round(l.l_extendedprice, 2) AS price
    FROM lineitem l JOIN mincost m
      ON l.l_partkey = m.l_partkey AND l.l_extendedprice = m.min_price
"""


#: round 7: q_collapse_by_key rotated OUT of the driver 50 (its slot
#: went to q_text_language_ngram, the newest operator family); its
#: group+collect shape is also driver-gated via q_report_collapse.
ROTATED_OUT_ORACLES["q_collapse_by_key"] = """
    SELECT n_nationkey AS c_nationkey,
           string_agg(DISTINCT c_mktsegment, '. ' ORDER BY c_mktsegment)
               AS c_mktsegment
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_nationkey
"""


def _language_model_oracle(min_score: float | None = None) -> str:
    """DuckDB replica of text.language_id_model's literal path, built
    from the SAME pinned weights so implementation and oracle agree on
    the model by construction: per language
    prob = round(sigmoid(round(bias + sum(weight[t3])/len(t3), 6)), 6),
    argmax with declaration-order tiebreak. ``min_score`` adds the
    round-8 unknown-language floor arm (below it → 'und'). Round 9:
    the gram stream runs over the script-segmented canonical form
    (the shared _duck_segmented_sql twin of text.segmented_text_sql —
    a no-op on spaced scripts)."""
    from haplorec_spark.operators.text import (
        PINNED_LANGID_MODEL,
        _duck_segmented_sql,
    )

    score_exprs = []
    for lang, (bias, ws) in PINNED_LANGID_MODEL.items():
        items = sorted(ws.items())
        keys = ", ".join("'" + t.replace("'", "''") + "'" for t, _ in items)
        vals = ", ".join(repr(float(x)) for _, x in items)
        lookup = (
            f"coalesce(list_extract([{vals}]::DOUBLE[],"
            f" list_position([{keys}], t)), 0.0)"
        )
        total = f"list_sum(list_transform(t3, t -> {lookup}))"
        score = (
            f"round({float(bias)!r} + coalesce({total}, 0.0)"
            f" / len(t3)::DOUBLE, 6)"
        )
        score_exprs.append(
            f"round(1.0 / (1.0 + exp(-({score}))), 6) AS p_{lang}"
        )
    langs = list(PINNED_LANGID_MODEL)
    best = "greatest(" + ", ".join(f"p_{la}" for la in langs) + ")"
    pred = "CASE " + " ".join(
        f"WHEN p_{la} = {best} THEN '{la}'" for la in langs
    ) + " END"
    if min_score is not None:
        pred = (
            f"CASE WHEN {best} >= {min_score!r} THEN ({pred}) "
            f"ELSE 'und' END"
        )
    seg = _duck_segmented_sql("lower(text)")
    return f"""
        WITH t AS (SELECT doc_id,
                          list_transform(
                              generate_series(1, greatest(length(s) - 2, 1)),
                              i -> replace(substr(s, i, 3), ' ', '▁')) AS t3
                   FROM (SELECT doc_id, ' ' || {seg} || ' ' AS s
                         FROM documents)),
             scored AS (SELECT doc_id, {', '.join(score_exprs)} FROM t)
        SELECT doc_id, {pred} AS predicted_lang, {best} AS lang_score
        FROM scored
    """


ROTATED_OUT_ORACLES["q_text_language_model"] = _language_model_oracle()


def _lexicon_floor_oracle(min_score: float) -> str:
    """The lexicon rung's driver-gate SQL (text.py registration) plus
    the round-8 unknown-language floor arm, built from the same
    _duck_lang_scores literals."""
    from haplorec_spark.operators.text import _duck_lang_scores

    scores = _duck_lang_scores()
    best = "greatest(" + ", ".join(s for _, s in scores) + ")"
    pred = "CASE " + " ".join(
        f"WHEN {s} = {best} THEN '{lang}'" for lang, s in scores
    ) + " END"
    return f"""
        SELECT doc_id,
               CASE WHEN {best} >= {min_score!r} THEN ({pred})
                    ELSE 'und' END AS predicted_lang,
               {best} AS lang_score
        FROM documents
    """


def _floor_oracles() -> dict[str, str]:
    from haplorec_spark.queries import (
        LANGID_FLOORS,
        _language_ngram_oracle_sql,
    )

    return {
        "q_text_language_id_floor": _lexicon_floor_oracle(
            LANGID_FLOORS["lexicon"]
        ),
        "q_text_language_ngram_floor": _language_ngram_oracle_sql(
            LANGID_FLOORS["ngram"]
        ),
        "q_text_language_model_floor": _language_model_oracle(
            LANGID_FLOORS["model"]
        ),
    }


ROTATED_OUT_ORACLES.update(_floor_oracles())


def _ann_recall_oracle() -> str:
    """Recall of the LSH gate vs the brute-force gate, composed from
    those two driver gates' OWN oracle SQL (DuckDB allows CTE-bearing
    subqueries as derived tables), so all three stay consistent by
    construction."""
    from haplorec_spark.queries import registry

    reg = registry()
    exact = reg["q_ann_brute_force"].sql
    approx = reg["q_ann_lsh_bucketed"].sql
    return f"""
        SELECT probe_id, n_exact, n_hit,
               round(n_hit / n_exact::DOUBLE, 6) AS recall
        FROM (
            SELECT e.probe_id, count(*)::BIGINT AS n_exact,
                   count(a.neighbor_id)::BIGINT AS n_hit
            FROM ({exact}) e
            LEFT JOIN ({approx}) a
              ON e.probe_id = a.probe_id
             AND e.neighbor_id = a.neighbor_id
            GROUP BY e.probe_id)
    """


ROTATED_OUT_ORACLES["q_ann_recall"] = _ann_recall_oracle()


def _dedup_survivors_oracle() -> str:
    """Quality-aware survivor selection composed over the
    q_dedup_clusters gate's OWN SQL: per cluster keep the argmax of
    length(text) (tie → min doc_id, NULLS LAST pinned); documents in no
    cluster always survive."""
    from haplorec_spark.queries import registry

    clusters = registry()["q_dedup_clusters"].sql
    return f"""
        WITH clusters AS ({clusters}),
             member AS (SELECT c.doc_id, c.canonical_id,
                               length(d.text) AS score
                        FROM clusters c JOIN documents d USING (doc_id)),
             winners AS (SELECT doc_id FROM (
                 SELECT doc_id,
                        row_number() OVER (PARTITION BY canonical_id
                            ORDER BY score DESC NULLS LAST, doc_id) AS rn
                 FROM member) WHERE rn = 1)
        SELECT doc_id, source FROM documents
        WHERE doc_id IN (SELECT doc_id FROM winners)
           OR doc_id NOT IN (SELECT doc_id FROM clusters)
    """


ROTATED_OUT_ORACLES["q_dedup_survivors"] = _dedup_survivors_oracle()

#: q_order_gaps' former driver-gate SQL (rotated out round 9, slot
#: went to q_ann_sq_adc; the lag-window shape stays gated via
#: q_sessionize).
ROTATED_OUT_ORACLES["q_order_gaps"] = """
    SELECT o_custkey,
           round(avg(gap_days), 6) AS avg_gap_days,
           count(*)                AS n_gaps
    FROM (SELECT o_custkey,
                 date_diff('day',
                           lag(o_orderdate) OVER (PARTITION BY o_custkey
                                                  ORDER BY o_orderdate,
                                                           o_orderkey),
                           o_orderdate) AS gap_days
          FROM orders)
    WHERE gap_days IS NOT NULL
    GROUP BY o_custkey
"""
# unigram tokenizer seeding: every substring of length 1..4 of every
# distinct word, weighted by word frequency — the candidate vocabulary
# the (iterative, replica-pinned) EM trainer prunes.
ROTATED_OUT_ORACLES["q_unigram_seed_counts"] = """
    WITH wc AS (
        SELECT word, count(*) AS c FROM (
            SELECT unnest(string_split(lower(text), ' ')) AS word
            FROM documents)
        WHERE word <> '' GROUP BY word
    ), subs AS (
        SELECT piece, c FROM (
            SELECT unnest(flatten(list_transform(
                       range(1, length(word) + 1),
                       i -> list_transform(
                           range(1, least(4, length(word) - i + 1) + 1),
                           n -> substr(word, i, n))
                   ))) AS piece,
                   c
            FROM wc)
        WHERE piece <> '')
    SELECT piece, sum(c)::BIGINT AS count FROM subs GROUP BY piece
"""


def _script_quality_oracle() -> str:
    """DuckDB replica of quality_score(segmentation='script') built
    from the shared constants (word stream via text._duck_words_sql,
    merged stop lexicon, dense-script word-length waiver, spacefree
    fraction) — the round-9 space-free-script face on real data."""
    from haplorec_spark.operators.text import (
        LANG_LEXICON,
        SPACEFREE_CLASS,
        SPACEFREE_WLEN_WAIVER,
        _WLEN_WAIVER_CLASS,
        _duck_words_sql,
    )

    ws = _duck_words_sql("text")
    n = f"len({ws})"
    stop_lex = (
        LANG_LEXICON["en"] + LANG_LEXICON["zh"] + LANG_LEXICON["ja"]
        + LANG_LEXICON["ko"] + LANG_LEXICON["th"]
    )
    arr = ", ".join(f"'{w}'" for w in stop_lex)
    hits = f"len(list_filter({ws}, w -> list_contains([{arr}], w)))"
    nonspace = "length(replace(text, ' ', ''))"
    mean = f"{nonspace} / {n}::DOUBLE"
    sf_frac = (
        f"CASE WHEN {nonspace} > 0 THEN"
        f" len(regexp_extract_all(text, '{SPACEFREE_CLASS}'))"
        f" / {nonspace}::DOUBLE ELSE 0.0 END"
    )
    waiver = (
        f"CASE WHEN {nonspace} > 0 THEN"
        f" len(regexp_extract_all(text, '{_WLEN_WAIVER_CLASS}'))"
        f" / {nonspace}::DOUBLE ELSE 0.0 END"
    )
    len_ok = f"CASE WHEN {n} BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END"
    wlen_ok = (
        f"CASE WHEN {waiver} >= {SPACEFREE_WLEN_WAIVER} THEN 1.0"
        f" WHEN {mean} BETWEEN 2 AND 12 THEN 1.0 ELSE 0.0 END"
    )
    stop_ok = (
        f"CASE WHEN {hits} / {n}::DOUBLE >= 0.01 THEN 1.0 ELSE 0.0 END"
    )
    return f"""
        SELECT doc_id, {n}::INT AS n_words,
               round({mean}, 6) AS mean_word_len,
               round({hits} / {n}::DOUBLE, 6) AS stopword_ratio,
               round((0.4 * {len_ok} + 0.3 * {wlen_ok}
                      + 0.3 * {stop_ok})::DOUBLE, 6) AS quality,
               round({sf_frac}, 6) AS spacefree_fraction
        FROM documents
    """


ROTATED_OUT_ORACLES["q_text_quality_script"] = _script_quality_oracle()


def _script_fractions_oracle() -> str:
    """DuckDB replica of text.script_fractions from the shared
    SCRIPT_CLASSES literals."""
    from haplorec_spark.operators.text import (
        SCRIPT_CLASSES,
        SPACEFREE_CLASS,
    )

    nonspace = "length(replace(text, ' ', ''))"
    counts = {
        name: f"len(regexp_extract_all(text, '{cls}'))"
        for name, cls in SCRIPT_CLASSES.items()
    }

    def frac(num: str) -> str:
        return (
            f"round(CASE WHEN {nonspace} > 0"
            f" THEN {num} / {nonspace}::DOUBLE ELSE 0.0 END, 6)"
        )

    other = f"({nonspace} - {' - '.join(counts.values())})"
    sf = f"len(regexp_extract_all(text, '{SPACEFREE_CLASS}'))"
    cols = ", ".join(
        f"{frac(c)} AS {name}_fraction" for name, c in counts.items()
    )
    return f"""
        SELECT doc_id, {nonspace}::INT AS n_chars, {cols},
               {frac(other)} AS other_fraction,
               {frac(sf)} AS spacefree_fraction
        FROM documents
    """


ROTATED_OUT_ORACLES["q_script_fractions"] = _script_fractions_oracle()


#: weekly cohort retention: cohort = ISO-Monday week of the user's
#: first event; period_ix = exact day-difference / 7 between week
#: starts; retention = distinct-active / cohort size.
ROTATED_OUT_ORACLES["q_retention_weekly"] = """
    WITH ev AS (SELECT user_id, date_trunc('week', ts)::TIMESTAMP AS p FROM events),
         act AS (SELECT DISTINCT user_id, p FROM ev),
         coh AS (SELECT user_id, min(p) AS cohort FROM ev
                 GROUP BY user_id),
         j AS (SELECT a.user_id, cohort,
                      (date_diff('day', cohort::DATE, p::DATE) // 7)::INT
                          AS period_ix
               FROM act a JOIN coh USING (user_id)),
         sizes AS (SELECT cohort, count(*)::BIGINT AS n_cohort FROM coh
                   GROUP BY cohort)
    SELECT cohort, period_ix, count(*)::BIGINT AS n_active, n_cohort,
           round(count(*) / n_cohort::DOUBLE, 6) AS retention
    FROM j JOIN sizes USING (cohort)
    GROUP BY cohort, period_ix, n_cohort
"""


#: two-phase salted aggregate over the skew-prone event_type key —
#: rotated out of the 50 in round 10 (slot went to q_funnel_events);
#: must equal the plain groupBy.
ROTATED_OUT_ORACLES["q_salted_event_type_stats"] = """
    SELECT event_type, count(*) AS n_events,
           round(sum("value"), 2) AS sum_value
    FROM events GROUP BY event_type
"""


#: the CAPPED LSH candidate path: per (band, band_key) bucket, all
#: pairs at size <= 3, star edges (bucket-min -> member) above — the
#: hot-bucket skew guard's exact semantics, branch split expressed via
#: window counts. A seeded 10-copy family of doc 0 exercises the star
#: branch; natural buckets cover all-pairs.
ROTATED_OUT_ORACLES["q_dedup_minhash_lsh_capped"] = """
    WITH d AS (SELECT doc_id, text FROM documents
               UNION ALL
               SELECT 200000 + k AS doc_id, text
               FROM documents, range(10) t(k) WHERE doc_id = 0),
         w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
               FROM d),
         sh AS (SELECT DISTINCT doc_id, shingle FROM (
                    SELECT doc_id,
                           unnest(CASE WHEN len(ws) >= 3
                                  THEN list_transform(
                                           generate_series(1, len(ws) - 2),
                                           i -> ws[i] || ' ' || ws[i+1]
                                                      || ' ' || ws[i+2])
                                  ELSE []::VARCHAR[] END) AS shingle
                    FROM w)),
         sig AS (SELECT doc_id, seed,
                        min(md5(seed::VARCHAR || '|' || shingle)) AS mh
                 FROM sh CROSS JOIN range(12) t(seed)
                 GROUP BY doc_id, seed),
         banded AS (SELECT doc_id, seed // 3 AS band,
                           string_agg(mh, ',' ORDER BY seed) AS band_key
                    FROM sig GROUP BY doc_id, seed // 3),
         sized AS (SELECT doc_id, band, band_key,
                          count(*) OVER (PARTITION BY band, band_key)
                              AS m,
                          min(doc_id) OVER (PARTITION BY band, band_key)
                              AS hub
                   FROM banded),
         ap AS (SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
                FROM sized a JOIN sized b USING (band, band_key)
                WHERE a.m <= 3 AND a.doc_id < b.doc_id),
         st AS (SELECT hub AS doc_id_a, doc_id AS doc_id_b
                FROM sized WHERE m > 3 AND doc_id <> hub)
    SELECT DISTINCT doc_id_a, doc_id_b
    FROM (SELECT * FROM ap UNION ALL SELECT * FROM st)
"""


#: rotated out of the 50 in round 11 (slot went to
#: q_funnel_events_retry, which took its windowFunnel oracle along to
#: queries.py); the plain per-user profile aggregate.
ROTATED_OUT_ORACLES["q_events_user_stats"] = """
    SELECT user_id,
           count(*) AS n_events,
           count(DISTINCT event_type) AS n_types,
           round(max("value"), 2) AS max_value,
           round(min("value"), 2) AS min_value
    FROM events
    GROUP BY user_id
"""


def _encoding_quality_oracle() -> str:
    from haplorec_spark.operators.text import duck_encoding_quality_sql

    cols = duck_encoding_quality_sql("text")
    return f"""
    WITH d AS (SELECT doc_id,
                      text
                      || CASE WHEN doc_id % 5 = 0
                              THEN ' Ã© â€™ broken' ELSE '' END
                      || CASE WHEN doc_id % 7 = 0
                              THEN ' � lost' ELSE '' END
                      || CASE WHEN doc_id % 11 = 0
                              THEN ' ' || chr(1) || 'ctl' ELSE '' END
                          AS text
               FROM documents)
    SELECT doc_id, {cols} FROM d
    """


ROTATED_OUT_ORACLES["q_encoding_quality"] = _encoding_quality_oracle()


def _fix_encoding_oracle() -> str:
    from haplorec_spark.operators.text import duck_fix_encoding_sql

    fixed = duck_fix_encoding_sql("text")
    return f"""
    WITH d AS (SELECT doc_id,
                      text
                      || CASE WHEN doc_id % 5 = 0
                              THEN ' CafÃ© â€™ donâ€™t â‚¬9' ELSE '' END
                      || CASE WHEN doc_id % 7 = 0
                              THEN ' � lost' ELSE '' END
                      || CASE WHEN doc_id % 3 = 0
                              THEN ' São café naïve' ELSE '' END
                          AS text
               FROM documents)
    SELECT doc_id, {fixed} AS text_fixed,
           ({fixed}) <> text AS was_repaired
    FROM d
    """


ROTATED_OUT_ORACLES["q_fix_encoding"] = _fix_encoding_oracle()


# q_rollup_pricing was briefly rotated out mid-round-12, then restored
# to the driver gates (the driver contract forbids removing a declared
# query) — its oracle lives with its @register in queries.py again, so
# it carries no rotated-out entry here.


def _verification_profile_oracle() -> str:
    """The bounded path's decision CLASSIFICATION replayed on the same
    seeded corpus as :func:`_verified_pairs_oracle`: per bucket-size
    band (size rounded up to a power of two), count exact small-bucket
    pairs (per-bucket m·(m−1)/2 — work, not distinct pairs), star
    members cleared by the hub edge, margin-band members split into
    covered (already dropped by any accepted edge) vs escalating, and
    the below-floor kept tail (star edges whose hub similarity never
    reached the margin floor)."""
    w17 = " ".join(f"w{i}" for i in range(1, 18))
    esc = " UNION ALL ".join(
        f"SELECT {i} AS doc_id, '{t}' AS text"
        for i, t in [
            (300000, f"{w17} h0a h0b h0c"),
            (300001, f"{w17} x0a q0z x0c"),
            (300002, f"{w17} x0a x0b x0c"),
            (300003, f"{w17} h0a h0b h0c"),
            (300004, f"{w17} h0a h0b h0c"),
            (300005, f"{w17} h0a h0b h0c"),
        ]
    )
    jac = (
        "round(len(list_intersect(wa.sh, wb.sh))::DOUBLE /"
        " (len(wa.sh) + len(wb.sh)"
        " - len(list_intersect(wa.sh, wb.sh))), 6)"
    )
    band_of = "cast(pow(2, ceil(log2(m::DOUBLE))) as BIGINT)"
    return f"""
    WITH d AS (SELECT doc_id, text FROM documents
               UNION ALL
               SELECT 200000 + k AS doc_id, text
               FROM documents, range(10) t(k) WHERE doc_id = 0
               UNION ALL {esc}),
         w AS (SELECT doc_id,
                      list_distinct(string_split(lower(text), ' ')) AS sh
               FROM d),
         tok AS (SELECT doc_id, unnest(sh) AS shingle FROM w),
         sig AS (SELECT doc_id, seed,
                        min(md5(seed::VARCHAR || '|' || shingle)) AS mh
                 FROM tok CROSS JOIN range(6) t(seed)
                 GROUP BY doc_id, seed),
         sized AS (SELECT doc_id, seed AS band, mh AS band_key,
                          count(*) OVER (PARTITION BY seed, mh) AS m,
                          min(doc_id) OVER (PARTITION BY seed, mh) AS hub
                   FROM sig),
         buckets AS (SELECT band, band_key, any_value(m) AS m
                     FROM sized GROUP BY band, band_key),
         small_pairs AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
                         FROM sized a JOIN sized b USING (band, band_key)
                         WHERE a.m <= 4 AND a.doc_id < b.doc_id),
         star AS (SELECT band, band_key, m, hub AS a, doc_id AS b
                  FROM sized WHERE m > 4 AND doc_id <> hub),
         cand AS (SELECT a, b FROM small_pairs
                  UNION SELECT a, b FROM star),
         jac AS (SELECT c.a, c.b, {jac} AS j
                 FROM cand c JOIN w wa ON wa.doc_id = c.a
                             JOIN w wb ON wb.doc_id = c.b),
         dropped AS (SELECT DISTINCT b FROM jac WHERE j >= 0.8),
         starj AS (SELECT s.band, s.band_key, s.m, s.b, jac.j
                   FROM star s
                   JOIN jac ON jac.a = s.a AND jac.b = s.b),
         exact AS (SELECT {band_of} AS bucket_size_band,
                          sum(m * (m - 1) // 2) AS n,
                          'exact_pair' AS decision
                   FROM buckets WHERE m BETWEEN 2 AND 4
                   GROUP BY 1),
         hubc AS (SELECT {band_of} AS bucket_size_band,
                         count(*) AS n, 'hub_cleared' AS decision
                  FROM starj WHERE j >= 0.8 GROUP BY 1),
         escl AS (SELECT {band_of} AS bucket_size_band,
                         count(*) AS n, 'margin_escalated' AS decision
                  FROM starj
                  WHERE j >= 0.65 AND j < 0.8
                    AND b NOT IN (SELECT b FROM dropped)
                  GROUP BY 1),
         covr AS (SELECT {band_of} AS bucket_size_band,
                         count(*) AS n, 'margin_covered' AS decision
                  FROM starj
                  WHERE j >= 0.65 AND j < 0.8
                    AND b IN (SELECT b FROM dropped)
                  GROUP BY 1),
         below AS (SELECT {band_of} AS bucket_size_band,
                          count(*) AS n, 'below_margin_kept' AS decision
                   FROM starj WHERE j < 0.65 GROUP BY 1)
    SELECT bucket_size_band, decision, n FROM (
        SELECT * FROM exact UNION ALL SELECT * FROM hubc
        UNION ALL SELECT * FROM escl UNION ALL SELECT * FROM covr
        UNION ALL SELECT * FROM below)
    """


ROTATED_OUT_ORACLES["q_verification_profile"] = _verification_profile_oracle()


#: per-adjacent-step funnel timings, single-attempt semantics: the
#: fold's witness chain is the GREEDY chain (first view by (ts, id),
#: first qualifying click after it, first qualifying purchase after
#: that, whole-funnel budget from the view), reconstructed here with
#: row_number windows; percentiles via quantile_cont (the same linear
#: interpolation as Spark's percentile()).
ROTATED_OUT_ORACLES["q_funnel_step_timings"] = """
    WITH e AS (SELECT user_id, ts, event_id, event_type FROM events
               WHERE event_type IN ('view', 'click', 'purchase')),
         v1 AS (SELECT user_id, ts, event_id FROM (
                    SELECT user_id, ts, event_id,
                           row_number() OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS rn
                    FROM e WHERE event_type = 'view')
                WHERE rn = 1),
         c1 AS (SELECT user_id, ts, event_id FROM (
                    SELECT c.user_id, c.ts, c.event_id,
                           row_number() OVER (PARTITION BY c.user_id
                               ORDER BY c.ts, c.event_id) AS rn
                    FROM e c JOIN v1 USING (user_id)
                    WHERE c.event_type = 'click'
                      AND (c.ts, c.event_id) > (v1.ts, v1.event_id)
                      AND epoch_us(c.ts) - epoch_us(v1.ts)
                          <= 259200000000::BIGINT)
                WHERE rn = 1),
         p1 AS (SELECT user_id, ts FROM (
                    SELECT p.user_id, p.ts,
                           row_number() OVER (PARTITION BY p.user_id
                               ORDER BY p.ts, p.event_id) AS rn
                    FROM e p
                    JOIN c1 USING (user_id)
                    JOIN v1 USING (user_id)
                    WHERE p.event_type = 'purchase'
                      AND (p.ts, p.event_id) > (c1.ts, c1.event_id)
                      AND epoch_us(p.ts) - epoch_us(v1.ts)
                          <= 259200000000::BIGINT)
                WHERE rn = 1),
         g2 AS (SELECT c1.user_id,
                       (epoch_us(c1.ts) - epoch_us(v1.ts)) / 1000000.0
                           AS gap_s
                FROM c1 JOIN v1 USING (user_id)),
         g3 AS (SELECT p1.user_id,
                       (epoch_us(p1.ts) - epoch_us(c1.ts)) / 1000000.0
                           AS gap_s
                FROM p1 JOIN c1 USING (user_id)),
         agg AS (SELECT 2 AS step_ix, count(*) AS n_users,
                        round(quantile_cont(gap_s, 0.5), 6) AS p50_seconds,
                        round(quantile_cont(gap_s, 0.9), 6) AS p90_seconds
                 FROM g2
                 UNION ALL
                 SELECT 3, count(*),
                        round(quantile_cont(gap_s, 0.5), 6),
                        round(quantile_cont(gap_s, 0.9), 6)
                 FROM g3),
         ladder(step_ix, step) AS (VALUES (2, 'click'), (3, 'purchase'))
    SELECT ladder.step_ix, ladder.step,
           coalesce(agg.n_users, 0) AS n_users,
           agg.p50_seconds, agg.p90_seconds
    FROM ladder LEFT JOIN agg USING (step_ix)
    ORDER BY ladder.step_ix
"""


def _blocked_terms_oracle() -> str:
    from haplorec_spark.operators.text import duck_blocked_term_sql

    cols = duck_blocked_term_sql("text", ["spark", "join", "window"])
    return f"SELECT doc_id, {cols} FROM documents"


ROTATED_OUT_ORACLES["q_blocked_terms"] = _blocked_terms_oracle()


#: stupid-backoff trigram LM (Brants et al. 2007): S = ct/cb when the
#: trigram was seen, else 0.4 * (cb23/cu2 when the bigram was seen,
#: else 0.4 * cu3/N) — counts and fold order replayed exactly.
ROTATED_OUT_ORACLES["q_text_trigram_lm"] = """
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
               FROM documents),
         toks AS (SELECT unnest(ws) AS w FROM w),
         uni AS (SELECT w, count(*)::DOUBLE AS cu FROM toks GROUP BY w),
         n AS (SELECT sum(cu) AS nt FROM uni),
         bg AS (SELECT ws[i] AS w1, ws[i + 1] AS w2 FROM (
                    SELECT ws, unnest(generate_series(1,
                               greatest(len(ws) - 1, 0))) AS i FROM w)),
         bi AS (SELECT w1, w2, count(*)::DOUBLE AS cb FROM bg
                GROUP BY 1, 2),
         tg AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2,
                       ws[i + 2] AS w3 FROM (
                    SELECT doc_id, ws, unnest(generate_series(1,
                               greatest(len(ws) - 2, 0))) AS i FROM w)),
         tri AS (SELECT w1, w2, w3, count(*)::DOUBLE AS ct FROM tg
                 GROUP BY 1, 2, 3),
         sc AS (SELECT doc_id,
                       log10(CASE WHEN ct IS NOT NULL THEN ct / cb
                             ELSE 0.4 * (CASE WHEN cb23 IS NOT NULL
                                         THEN cb23 / cu2
                                         ELSE 0.4 * cu3 / nt END) END)
                           AS lp
                FROM tg
                LEFT JOIN tri USING (w1, w2, w3)
                LEFT JOIN bi USING (w1, w2)
                LEFT JOIN (SELECT w1 AS w2, w2 AS w3, cb AS cb23
                           FROM bi) b2 USING (w2, w3)
                LEFT JOIN (SELECT w AS w2, cu AS cu2 FROM uni) u2
                      USING (w2)
                LEFT JOIN (SELECT w AS w3, cu AS cu3 FROM uni) u3
                      USING (w3)
                CROSS JOIN n),
         per AS (SELECT doc_id, count(*)::BIGINT AS n_trigrams,
                        round(avg(lp), 6) AS avg_logprob
                 FROM sc GROUP BY doc_id)
    SELECT d.doc_id, coalesce(per.n_trigrams, 0) AS n_trigrams,
           per.avg_logprob
    FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
"""


def test_langid_floors_are_non_vacuous(spark):
    """Each floor oracle must exercise BOTH outcomes at sf0.001: some
    documents flip to 'und', some keep an in-inventory argmax label —
    otherwise the threshold arm tests nothing."""
    import haplorec_spark.queries as q

    sf = "/root/testdata/sf0.001"
    for name in _floor_oracles():
        langs = {
            r["predicted_lang"]
            for r in getattr(q, name)(spark, sf).collect()
        }
        assert "und" in langs, f"{name}: floor never fired"
        assert langs - {"und"}, f"{name}: floor swallowed everything"

# GPT-2-regex pre-tokenized word counts. RE2 (DuckDB) lacks the
# published pattern's (?!\S) lookahead, whose only job is to glue the
# LAST whitespace of a run to the following word; inserting a marker
# (chr(1)) before that last whitespace and tokenizing each piece with
# the lookahead-free alternation reproduces the behavior exactly
# (piece boundaries are exactly where the lookahead would have split).
# Whitespace-only pretokens are dropped on both sides (the engine's
# word-frequency contract).
ROTATED_OUT_ORACLES["q_bpe_gpt2_word_counts"] = r"""
    WITH marked AS (
        SELECT regexp_replace(text, '(\s*)(\s)(\S)',
                              '\1' || chr(1) || '\2\3', 'g') AS t
        FROM documents
    ), pieces AS (
        SELECT unnest(string_split(t, chr(1))) AS piece FROM marked
    ), toks AS (
        SELECT unnest(regexp_extract_all(piece,
            '''s|''t|''re|''ve|''m|''ll|''d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'
        )) AS word
        FROM pieces
    )
    SELECT word, count(*) AS "count" FROM toks
    WHERE NOT regexp_matches(word, '^\s+$')
    GROUP BY word
"""

ROTATED_OUT_ORACLES["q_embedding_profile"] = """
    WITH p AS (
        SELECT CASE WHEN embedding IS NULL THEN 1.0 ELSE 0.0 END AS nul,
               CASE WHEN embedding IS NULL THEN NULL
                    ELSE len(embedding) END AS dim,
               CASE WHEN embedding IS NULL THEN NULL
                    ELSE (CASE WHEN len(list_filter(embedding,
                               x -> x IS NOT NULL
                                    AND isnan(x::DOUBLE))) > 0
                          THEN 1.0 ELSE 0.0 END) END AS nan,
               CASE WHEN embedding IS NULL THEN NULL
                    ELSE (CASE WHEN len(list_filter(embedding,
                               x -> x IS NOT NULL
                                    AND isinf(x::DOUBLE))) > 0
                          THEN 1.0 ELSE 0.0 END) END AS inf,
               CASE WHEN embedding IS NULL THEN NULL
                    ELSE (CASE WHEN len(list_filter(embedding,
                               x -> x IS NULL)) > 0
                          THEN 1.0 ELSE 0.0 END) END AS nule,
               CASE WHEN embedding IS NULL
                      OR len(list_filter(embedding,
                             x -> x IS NULL OR isnan(x::DOUBLE)
                                  OR isinf(x::DOUBLE))) > 0 THEN NULL
                    ELSE sqrt(list_reduce(list_transform(embedding,
                             x -> x::DOUBLE * x::DOUBLE),
                             (a, b) -> a + b)) END AS nrm
        FROM embeddings),
    a AS (SELECT count(*)::DOUBLE AS n_vectors,
                 sum(nul) AS n_null_vectors,
                 count(DISTINCT dim)::DOUBLE AS n_distinct_dims,
                 min(dim)::DOUBLE AS min_dim,
                 max(dim)::DOUBLE AS max_dim,
                 coalesce(sum(nan), 0.0) AS n_nan_vectors,
                 coalesce(sum(inf), 0.0) AS n_inf_vectors,
                 coalesce(sum(nule), 0.0) AS n_null_element_vectors,
                 sum(CASE WHEN nrm = 0 THEN 1.0 ELSE 0.0 END)
                     AS n_zero_norm,
                 round(avg(nrm), 6) AS avg_norm,
                 round(min(nrm), 6) AS min_norm,
                 round(max(nrm), 6) AS max_norm
          FROM p)
    SELECT 'n_vectors' AS metric, n_vectors AS value FROM a
    UNION ALL SELECT 'n_null_vectors', n_null_vectors FROM a
    UNION ALL SELECT 'n_distinct_dims', n_distinct_dims FROM a
    UNION ALL SELECT 'min_dim', min_dim FROM a
    UNION ALL SELECT 'max_dim', max_dim FROM a
    UNION ALL SELECT 'n_nan_vectors', n_nan_vectors FROM a
    UNION ALL SELECT 'n_inf_vectors', n_inf_vectors FROM a
    UNION ALL SELECT 'n_null_element_vectors', n_null_element_vectors
              FROM a
    UNION ALL SELECT 'n_zero_norm', n_zero_norm FROM a
    UNION ALL SELECT 'avg_norm', avg_norm FROM a
    UNION ALL SELECT 'min_norm', min_norm FROM a
    UNION ALL SELECT 'max_norm', max_norm FROM a
"""


def test_rotated_out_queries_still_match_duckdb(spark):
    import duckdb

    import haplorec_spark.queries as q

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("customer", "orders", "part", "supplier", "lineitem",
              "nation", "documents", "embeddings", "events", "region"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    def norm(t):
        # float aggregates can differ in the last bits between engines
        # (sum association order); compare at oracle precision
        return tuple(
            round(x, 4) if isinstance(x, float) else x for x in t
        )

    def key(t):
        # None-safe sort: ROLLUP grouping sets emit NULL group values
        # (q_rollup_pricing, rotated in round 12) and Python cannot
        # order None against str
        return tuple((x is None, x) for x in t)

    # The ~25 oracle checks are independent; run a few in flight so the
    # next query's jobs back-fill executor slots freed by the current
    # one's driver-sequential tail (guide §2.6 overlap — this test was
    # the suite's single slowest item at 285 s serial). Each worker gets
    # its own DuckDB cursor (connections are not thread-safe, cursors
    # share the parent's catalog/views). Assertions are unchanged.
    from concurrent.futures import ThreadPoolExecutor

    def check(item):
        name, sql = item
        got = sorted(
            (norm(tuple(r)) for r in getattr(q, name)(spark, sf).collect()),
            key=key,
        )
        want = sorted(
            (norm(tuple(t)) for t in con.cursor().execute(sql).fetchall()),
            key=key,
        )
        assert got == want, name
        return name

    with ThreadPoolExecutor(max_workers=3) as pool:
        for _ in pool.map(check, ROTATED_OUT_ORACLES.items()):
            pass


def test_jaccard_dfcut_changes_the_answer(spark):
    """The max_doc_freq oracle must exercise a NON-vacuous cut: at
    sf0.001 the cut frame differs from the uncut gate result (hot
    shingles exist and carried score mass)."""
    import haplorec_spark.queries as q
    from haplorec_spark.operators.dedup import ngram_jaccard_pairs
    from haplorec_spark.queries import table

    sf = "/root/testdata/sf0.001"
    cut = sorted(
        tuple(r)
        for r in q.q_dedup_ngram_jaccard_dfcut(spark, sf).collect()
    )
    uncut = sorted(
        tuple(r)
        for r in ngram_jaccard_pairs(
            table(spark, sf, "documents"), threshold=0.2
        ).collect()
    )
    assert cut != uncut


def test_capped_lsh_oracle_star_branch_is_non_vacuous(spark):
    """The q_dedup_minhash_lsh_capped fixture must actually exercise
    BOTH branches: the seeded family emits hub->member star edges and
    suppresses member-member pairs (the uncapped path would emit
    them), while natural small buckets still produce ordinary pairs."""
    import haplorec_spark.queries as q

    got = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in q.q_dedup_minhash_lsh_capped(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert (0, 200000) in got  # star edge from the hub
    assert (200000, 200001) not in got  # member-member pair suppressed
    assert any(a < 200000 and b < 200000 for a, b in got)  # natural pairs


def test_verification_profile_every_class_non_vacuous(spark):
    """The seeded corpus must light up ALL FIVE decision classes —
    especially below_margin_kept (the observable false-keep budget) —
    or the profile oracle silently stops guarding a branch."""
    import haplorec_spark.queries as q

    got = q.q_verification_profile(spark, "/root/testdata/sf0.001")
    classes = {r["decision"] for r in got.collect()}
    assert classes == {
        "exact_pair", "hub_cleared", "margin_escalated",
        "margin_covered", "below_margin_kept",
    }
