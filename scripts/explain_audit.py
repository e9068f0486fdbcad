"""Plan-quality audit: pushdown / broadcast / no-nested-loop checks on
the load-bearing queries' physical plans.

Run after changing any operator: a clean audit means filters reach the
parquet scans, small sides broadcast, and no BroadcastNestedLoopJoin /
CartesianProduct appears anywhere (the theta OR-join rewrite is load-
bearing for that last invariant). WholeStageCodegen markers only print
on executed AQE plans, so they are not asserted here.
"""

import re
import sys

sys.path.insert(0, "/root/repo")

from haplorec_spark.queries import registry
from haplorec_spark.session import get_spark

spark = get_spark(master="local[4]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

SF = "/root/testdata/sf0.01"
CHECKS = {
    "q01_pricing_summary": {
        "expect": ["PushedFilters: \\[IsNotNull\\(l_shipdate\\)"],
        "forbid": ["BroadcastNestedLoopJoin"],
    },
    "q03_shipping_priority": {
        "expect": ["BroadcastHashJoin", "PushedFilters: .*c_mktsegment"],
        "forbid": ["BroadcastNestedLoopJoin", "SortMergeJoin"],
    },
    "q05_local_supplier_volume": {
        "expect": ["BroadcastHashJoin"],
        "forbid": ["BroadcastNestedLoopJoin", "CartesianProduct"],
    },
    "q_division_subset": {
        "expect": ["BroadcastHashJoin", "HashAggregate"],
        "forbid": ["BroadcastNestedLoopJoin", "CartesianProduct"],
    },
    "q_dedup_minhash_lsh": {
        "expect": ["HashAggregate"],
        "forbid": ["CartesianProduct", "BroadcastNestedLoopJoin"],
    },
    "q_dedup_simhash_pairs": {
        "expect": ["HashAggregate"],
        "forbid": ["CartesianProduct"],
    },
    "q_theta_or_join": {
        "expect": [],
        "forbid": ["BroadcastNestedLoopJoin", "CartesianProduct"],
    },
    "q_report_no_duplicates": {
        "expect": ["Window"],
        "forbid": ["CartesianProduct"],
    },
    "q_events_hourly": {
        "expect": ["HashAggregate"],
        "forbid": ["Exchange hashpartitioning.*Exchange hashpartitioning.*"
                    "Exchange hashpartitioning"],  # no triple shuffle
    },
    "q_ann_lsh_bucketed": {
        # bucket keys are a map-side literal-matrix projection; the only
        # shuffle in the whole query is the final per-probe top-k window
        "expect": ["BroadcastHashJoin"],
        "forbid": ["Exchange hashpartitioning.*Exchange hashpartitioning",
                   "CartesianProduct", "BroadcastNestedLoopJoin"],
    },
    "q_topk_orders_per_segment": {
        # customer is the small side -> must broadcast; top-k is a
        # partitioned window, never a global sort
        "expect": ["BroadcastHashJoin", "Window"],
        "forbid": ["BroadcastNestedLoopJoin", "SortMergeJoin",
                   "CartesianProduct"],
    },
    "q_order_gaps": {
        # lag + aggregate share the o_custkey partitioning: exactly one
        # shuffle, the aggregate reuses the window's hashpartitioning
        "expect": ["Window"],
        "forbid": ["Exchange hashpartitioning.*Exchange hashpartitioning"],
    },
    "q_running_revenue": {
        # the single-partition global window is safe ONLY because the
        # input was first aggregated to bounded cardinality (months);
        # assert the aggregate happens below the window
        "expect": ["HashAggregate.*Window"],
        "forbid": ["CartesianProduct"],
    },
    "_semantic_dedup": {
        # within-cell pairs (round 12): ONE corpus projection (cell
        # assignment + norm fold into the scan) -> ONE cluster-keyed
        # Exchange -> the grouped Arrow pair kernel. Never a cross
        # product, never an id-keyed Exchange (that would mean the
        # corpus is shuffled to join its own assignment frame), never
        # a join at all — the former a/b self-join paid the projection
        # and its shuffle twice
        "expect": ["FlatMapGroupsInArrow"],
        "forbid": ["CartesianProduct", "Join",
                   r"Exchange hashpartitioning\(vec_id",
                   r"Exchange hashpartitioning.*Exchange hashpartitioning"],
    },
    "_ivf_pq_topk": {
        # codes+cells come from ONE encode scan (cluster is a
        # pass-through column); probes broadcast onto the cluster join;
        # the only id-keyed structure allowed is the top-k window —
        # never an id-keyed Exchange of the corpus
        "expect": ["BroadcastHashJoin", "Window"],
        "forbid": ["CartesianProduct", "BroadcastNestedLoopJoin",
                   r"Exchange hashpartitioning\(vec_id"],
    },
    "_strip_boilerplate": {
        # the hot-line set folds to ONE bucketed row broadcast onto the
        # doc scan (the BNLJ build side is that single row — intended);
        # document text must never enter an Exchange — the only
        # shuffles are the line-df aggregate and the HOT-SET-sized
        # bucket groupBy (both bounded, neither carries text)
        "expect": ["BroadcastNestedLoopJoin"],
        "forbid": ["CartesianProduct",
                   "Exchange hashpartitioning.*Exchange hashpartitioning"
                   ".*Exchange hashpartitioning"],
    },
    "_dup_spans": {
        # duplicated n-grams (MEASURED small) broadcast back onto
        # the word-granularity stream; the island merge is a map-side
        # boundary zip over each doc's sorted start array (round 12) —
        # one doc-keyed aggregate, NO per-doc window, no sort
        "expect": ["BroadcastHashJoin", "ObjectHashAggregate"],
        "forbid": ["CartesianProduct", "BroadcastNestedLoopJoin",
                   "Window"],
    },
    "_script_curation": {
        # script-segmented curation chain: map-side only (Project +
        # Filter over the scan) — no Exchange, no Python eval, and the
        # hash_split attach is a column program
        "expect": ["Project"],
        "forbid": ["Exchange", "BatchEvalPython", "ArrowEvalPython",
                   "CartesianProduct", "BroadcastNestedLoopJoin"],
    },
    "_wet_source": {
        # WARC/WET scan: binaryFile -> ONE ArrowEval (mapInPandas) per
        # file; record parsing must not induce a shuffle
        "expect": ["ArrowEvalPython|MapInPandas|PythonMapInArrow"],
        "forbid": ["Exchange", "CartesianProduct"],
    },
    "_dup_spans_large": {
        # hot set measured over the broadcast bound: the join back onto
        # the gram stream MUST degrade to a shuffle join — a forced
        # broadcast of a corpus-proportional set is an executor OOM.
        # Island merge is the map-side boundary zip (no Window).
        "expect": ["SortMergeJoin", "ObjectHashAggregate"],
        "forbid": ["BroadcastHashJoin", "CartesianProduct",
                   "BroadcastNestedLoopJoin", "Window"],
    },
    "_strip_boilerplate_large": {
        # hot-line set over the bound: explode-and-regroup fallback —
        # the single-row-array broadcast (BNLJ) must be gone, replaced
        # by a line-keyed shuffle anti join + per-doc regroup
        "expect": ["SortMergeJoin"],
        "forbid": ["BroadcastNestedLoopJoin", "CartesianProduct"],
    },
    "_unigram_lm_large": {
        # vocabulary measured over the bound: scoring join degrades to
        # a shuffle join instead of broadcasting an unbounded vocab
        "expect": ["SortMergeJoin"],
        "forbid": ["BroadcastHashJoin", "CartesianProduct",
                   "BroadcastNestedLoopJoin"],
    },
    "_web_canonicalize": {
        # canonicalize + parse + literal blocklist is a pure map-side
        # column program: no shuffle of any kind may appear
        "expect": [],
        "forbid": ["Exchange", "CartesianProduct", "Generate"],
    },
    "_cap_per_domain": {
        # exact two-phase per-domain top-k: the (domain, salt) pre-cap
        # window must sit below the per-domain cap window, so a
        # mega-domain never funnels into one task
        "expect": ["Window.*Window"],
        "forbid": ["CartesianProduct"],
    },
    "_chunk_documents": {
        # chunking is a pure map-side row expansion: no shuffle of any
        # kind may appear — document text must never enter an Exchange
        "expect": ["Generate"],
        "forbid": ["Exchange", "CartesianProduct"],
    },
    "_pq_encode": {
        # PQ encoding is one projection against the literal codebook
        # nest: map-only, no shuffle
        "expect": [],
        "forbid": ["Exchange", "CartesianProduct", "Generate"],
    },
    "_sq_encode": {
        # SQ8 encoding is one projection against the literal bounds
        # arrays: map-only, no shuffle (the _pq_encode contract)
        "expect": [],
        "forbid": ["Exchange", "CartesianProduct", "Generate"],
    },
    "_sq_adc": {
        # SQ8 ADC shares the _pq_adc contract: probes broadcast onto
        # the code scan (intended BNLJ), one per-probe top-k window
        "expect": ["BroadcastNestedLoopJoin", "Window"],
        "forbid": ["CartesianProduct", "SortMergeJoin",
                   "Exchange hashpartitioning.*Exchange hashpartitioning"],
    },
    "_pq_adc": {
        # ADC: probes broadcast onto the code scan (the intended BNLJ —
        # brute-force rung, same contract as brute_force_topk); the only
        # shuffle is the per-probe top-k window
        "expect": ["BroadcastNestedLoopJoin", "Window"],
        "forbid": ["CartesianProduct", "SortMergeJoin",
                   "Exchange hashpartitioning.*Exchange hashpartitioning"],
    },
    "_bigram_lm": {
        # bigram extraction must be Generate over the token array —
        # a positional self-join of the exploded token stream would
        # shuffle the corpus at word granularity. (The id-keyed SMJ
        # restoring no-bigram docs is fine; counts broadcast.)
        "expect": ["Generate", "BroadcastHashJoin"],
        "forbid": ["CartesianProduct", "BroadcastNestedLoopJoin"],
    },
    "_refine_topk": {
        # exact re-rank of a measured-small shortlist: both the
        # candidate pairs and the probe vectors broadcast onto the
        # corpus scan; the only exchange is the top-k window's
        "expect": ["BroadcastHashJoin", "Window"],
        "forbid": ["CartesianProduct", "SortMergeJoin"],
    },
    "_train_linear_grad": {
        # one classifier-training iteration: the cached feature table is
        # reused (InMemoryTableScan), joins resolve to broadcast at this
        # SF (weights always; feats by AQE estimate — at scale the doc
        # joins zipper on feats' cached hash partitioning instead), and
        # the word-keyed gradient aggregate supplies the partial+final
        # HashAggregate pair; the doc-keyed residual join zippers as a
        # co-partitioned SortMergeJoin (no fresh exchange on feats);
        # never a nested-loop/cartesian anywhere
        "expect": ["BroadcastHashJoin", "InMemoryTableScan",
                   "HashAggregate.*Exchange.*HashAggregate"],
        "forbid": ["CartesianProduct", "BroadcastNestedLoopJoin"],
    },
    "_mixture_upsample": {
        # replication is a pure map-side posexplode after the one
        # (separate) token-total collect: the output plan itself must
        # carry NO exchange and no Python
        "expect": ["Generate"],
        "forbid": ["Exchange", "CartesianProduct",
                   "ArrowEvalPython", "BatchEvalPython"],
    },
    "_dsir_weights": {
        # DSIR scoring: ONE combined-vocabulary join (broadcast under
        # the measured bound) feeding the per-doc sum — never two
        # separate LM joins, never a nested loop
        "expect": ["BroadcastHashJoin",
                   "HashAggregate.*Exchange.*HashAggregate"],
        "forbid": ["CartesianProduct", "BroadcastNestedLoopJoin"],
    },
    "_dsir_weights_large": {
        # above the measured vocab bound the scoring join must fall
        # back to a shuffle join, not a forced broadcast
        "expect": ["SortMergeJoin"],
        "forbid": ["CartesianProduct", "BroadcastNestedLoopJoin"],
    },
    "_bpe_pair_counts": {
        # one BPE training iteration's pair count: map-side zip_with
        # pair extraction (Generate over the vocabulary-sized symbol
        # table), then a partial+final aggregate on the pair key — the
        # corpus itself is not in this plan at all (scanned once up
        # front into the checkpointed word table)
        "expect": ["Generate", "HashAggregate.*Exchange.*HashAggregate"],
        "forbid": ["CartesianProduct", "BroadcastNestedLoopJoin",
                   "ArrowEvalPython", "BatchEvalPython"],
    },
    "_bpe_tokenize": {
        # corpus tokenization: the Python encoder (ArrowEvalPython)
        # must sit above the DISTINCT-word aggregate, never on the
        # exploded corpus stream, and the word-keyed join back must
        # not be a forced broadcast of the unbounded vocabulary.
        # ORDERED pattern: in formatted-explain tree order, the
        # distinct aggregate pair must print BELOW (after) the Arrow
        # node — losing the distinct() would leave only scans under
        # the UDF and fail this match
        "expect": ["ArrowEvalPython.*HashAggregate.*Exchange"
                   ".*HashAggregate"],
        "forbid": ["CartesianProduct", "BroadcastNestedLoopJoin"],
    },
    "q_text_language_ngram": {
        # round 12 (guide §4.2): trigram-profile scoring is a
        # vectorized mapInArrow numpy kernel over an explicit
        # (doc_id, text) pre-select — one column-pruned scan, zero
        # Exchange, zero join; the interpreted-HOF expression twin
        # stays the Column face (with_language) for curation chains
        "expect": ["MapInArrow",
                   "ReadSchema: struct<doc_id:bigint,text:string>"],
        "forbid": ["Exchange", "CartesianProduct", "SortMergeJoin",
                   "BroadcastHashJoin", "BroadcastNestedLoopJoin"],
    },
    "q_text_quality": {
        # round 12 (guide §4.2): the whitespace quality+repetition
        # features ride ONE vectorized mapInArrow kernel over a
        # column-pruned scan (the interpreted top-word filter scan was
        # the gate's dominant cost); the unigram-LM half keeps its
        # measured-adaptive broadcast joins. Never a row-at-a-time
        # Python eval, never a nested loop.
        "expect": ["MapInArrow", "BroadcastHashJoin"],
        "forbid": ["BatchEvalPython", "CartesianProduct",
                   "BroadcastNestedLoopJoin", "SortMergeJoin"],
    },
    "q_text_language_model": {
        # the TRAINED rung's literal path (pinned 252-feature model):
        # per-language literal-map aggregate + sigmoid + argmax is
        # still ONE map-side projection — zero Exchange, zero Python
        "expect": ["Project"],
        "forbid": ["Exchange", "BatchEvalPython", "ArrowEvalPython",
                   "CartesianProduct", "BroadcastNestedLoopJoin"],
    },
    "q_bloom_member": {
        # Bloom probe: the probed side is map-side feeding k broadcast
        # joins — never a shuffle join, never a nested loop. The static
        # plan repeats the build subtree under each broadcast (the k
        # exchanges canonicalize identically); AQE materializes it ONCE
        # at runtime — tests/test_bloom.py pins the ReusedExchange count
        "expect": ["BroadcastHashJoin", "HashAggregate"],
        "forbid": ["SortMergeJoin", "CartesianProduct",
                   "BroadcastNestedLoopJoin"],
    },
    "q_funnel_events": {
        # ordered funnel: events filter to step types below ONE
        # user-keyed aggregate (collect_list -> ObjectHashAggregate,
        # matched by the HashAggregate pattern); the fold is a map-side
        # expression — no join of any kind, no second corpus exchange
        "expect": ["HashAggregate"],
        "forbid": ["Join", "CartesianProduct",
                   "Exchange hashpartitioning.*Exchange hashpartitioning"],
    },
    "q_blocked_terms": {
        # the C4 bad-words gate is one InSet projection over the scan:
        # map-side only, no explode, no Python
        "expect": ["Project"],
        "forbid": ["Exchange", "BatchEvalPython", "ArrowEvalPython",
                   "CartesianProduct", "Generate"],
    },
    "q_html_extract": {
        # HTML -> text extraction is a fixed regexp/replace column
        # program over the scan: one map-side Project, zero Exchange,
        # zero Python, no join of any kind
        "expect": ["Project"],
        "forbid": ["Exchange", "BatchEvalPython", "ArrowEvalPython",
                   "CartesianProduct", "BroadcastNestedLoopJoin"],
    },
    "_bpe_token_length_histogram": {
        # tokenizer-drift fingerprint: distinct-word encode (bounded
        # Arrow UDF) + one length-keyed aggregate — the corpus never
        # crosses a Python path row-at-a-time, no cross join
        "expect": ["ArrowEvalPython", "HashAggregate"],
        "forbid": ["CartesianProduct", "BroadcastNestedLoopJoin",
                   "BatchEvalPython"],
    },
    "_pack_token_ids": {
        # id-space sequence packing: the corpus crosses ONE
        # seq_id-keyed aggregate (fragments partition each doc's ids);
        # reassembly is map-side array_sort+flatten — no window over
        # the corpus, no cross join. The only Arrow node is the
        # bounded distinct-word encoder.
        "expect": ["HashAggregate"],
        "forbid": ["CartesianProduct", "BroadcastNestedLoopJoin",
                   "Window.*Window.*Window"],
    },
    "q_dedup_ngram_jaccard_dfcut": {
        # the max_doc_freq cut prunes hot shingles with a BROADCAST
        # left-anti join (the hot set is df-bounded tiny) before the
        # shingle self-join; never a nested loop, never a cross join
        "expect": ["BroadcastHashJoin.*LeftAnti"],
        "forbid": ["CartesianProduct", "BroadcastNestedLoopJoin"],
    },
    "q_embedding_profile": {
        # one map-side projection + ONE aggregate (partial+final) —
        # a single corpus scan; norms/NaN flags are array folds, never
        # a second pass or a join
        "expect": ["HashAggregate.*Exchange.*HashAggregate"],
        "forbid": ["CartesianProduct", "BroadcastNestedLoopJoin",
                   "ArrowEvalPython", "BatchEvalPython",
                   "Exchange hashpartitioning.*Exchange hashpartitioning"],
    },
    "_map_side_curation": {
        # the streaming-safe curation chain must be ONE map-side stage
        # set: detection, filters, redaction, split — zero Exchange,
        # zero Python, zero join
        "expect": ["Project"],
        "forbid": ["Exchange", "BatchEvalPython", "ArrowEvalPython",
                   "CartesianProduct", "BroadcastNestedLoopJoin",
                   "HashAggregate"],
    },
    "_bpe_encode_ids": {
        # id encoding: the Python encoder must run over the DISTINCT
        # word aggregate (never the exploded corpus stream), and the
        # per-doc reassembly is one aggregate with map-side array_sort
        # (no Window, no second corpus shuffle)
        "expect": ["ArrowEvalPython.*HashAggregate.*Exchange"
                   ".*HashAggregate"],
        "forbid": ["CartesianProduct", "BroadcastNestedLoopJoin",
                   "Window"],
    },
    "_curation_bpe_pack": {
        # BPE token accounting inside curation: the Python encoder
        # (ArrowEvalPython) must sit above the DISTINCT-word aggregate
        # (the _bpe_tokenize invariant), and the accounting joins stay
        # equi-joins
        "expect": ["ArrowEvalPython.*HashAggregate.*Exchange"
                   ".*HashAggregate"],
        "forbid": ["CartesianProduct", "BroadcastNestedLoopJoin"],
    },
    "_unigram_encode_ids": {
        # the unigram rung shares BPE's id-encode invariant: the
        # Viterbi segmenter (ArrowEvalPython) runs over the DISTINCT
        # word aggregate, never the exploded corpus stream; per-doc
        # reassembly is map-side array_sort, no Window
        "expect": ["ArrowEvalPython.*HashAggregate.*Exchange"
                   ".*HashAggregate"],
        "forbid": ["CartesianProduct", "BroadcastNestedLoopJoin",
                   "Window"],
    },
    "q_fix_encoding": {
        # mojibake repair is ONE map-side projection (fold of replace
        # over the literal rules + regexp damage guard): zero
        # Exchange, zero Python, no join of any kind
        "expect": ["Project"],
        "forbid": ["Exchange", "BatchEvalPython", "ArrowEvalPython",
                   "CartesianProduct", "BroadcastNestedLoopJoin"],
    },
    "q_funnel_step_timings": {
        # step timings ride funnel_depth's single user-keyed shuffle;
        # the only join is the broadcast of the steps-sized ladder —
        # never a sort-merge or nested loop. Round 12: percentiles
        # come from the distinct-value histogram + cumulative window,
        # NEVER the value-buffering percentile aggregate (the
        # ObjectHashAggregate here is the user-keyed collect_list fold
        # — bounded by the per-user funnel-step events — so the pin is
        # on percentile() itself)
        "expect": ["HashAggregate", "BroadcastHashJoin", "Window"],
        "forbid": ["SortMergeJoin", "CartesianProduct",
                   "BroadcastNestedLoopJoin", "percentile\\("],
    },
    "q_price_percentiles": {
        # the same histogram-percentile invariant on the generic gate:
        # exactly two exchanges (corpus->histogram, histogram->group),
        # the final group aggregate reusing the window's partitioning;
        # no value buffer (ObjectHashAggregate / percentile) anywhere,
        # and the null filter pushed to the parquet scan
        "expect": ["Window", "HashAggregate",
                   "PushedFilters: \\[IsNotNull\\(l_extendedprice\\)"],
        "forbid": ["ObjectHashAggregate", "percentile\\(",
                   "SortMergeJoin", "CartesianProduct",
                   "Exchange hashpartitioning.*Exchange hashpartitioning"
                   ".*Exchange hashpartitioning"],
    },
    "_verification_profile": {
        # the bounded-verification audit face: same grouped map-side
        # candidate generation as the operator (its collect_list
        # buckets are the capped/star-bounded sets), then bucket-keyed
        # equi-joins over bucket-sized frames — no nested loop, no
        # cross product
        "expect": ["HashAggregate"],
        "forbid": ["CartesianProduct", "BroadcastNestedLoopJoin"],
    },
    "_history_probe_capped": {
        # the false-collision probe cap: store semi-join-pruned to the
        # batch's keys, then ONE (band, band_key) window ranks the
        # pruned rows — the final join reuses that partitioning, and
        # nothing nested-loops
        "expect": ["Window"],
        "forbid": ["CartesianProduct", "BroadcastNestedLoopJoin",
                   "SortMergeJoin"],
    },
    "_funnel_depth_capped": {
        # the per-user volume guard's row_number window partitions on
        # the SAME key as the fold's aggregate: exactly one user-keyed
        # exchange feeds both (no second corpus shuffle), no join
        "expect": ["Window", "HashAggregate"],
        "forbid": ["Join", "CartesianProduct",
                   "Exchange hashpartitioning.*Exchange hashpartitioning"],
    },
    "_lsh_verified_pairs": {
        # bounded star-verification: candidate generation is grouped
        # map-side pair/star explode (no bucket self-join in the plan);
        # the shingle verification joins are equi-joins with semi-join
        # prunes — never a nested loop, never a cross product
        "expect": ["HashAggregate"],
        "forbid": ["CartesianProduct", "BroadcastNestedLoopJoin"],
    },
    "_text_corpus_profile_single_scan": {
        # the corpus dashboard: quality + repetition + language +
        # histogram quantiles all computed from ONE projection over
        # ONE corpus scan — no id-join to reattach map-side features,
        # no second featurization lineage for the quantile tail
        "expect": ["Window", "Scan parquet"],
        "forbid": [r"\(\d+\) Scan parquet.*\(\d+\) Scan parquet",
                   "Join", "CartesianProduct"],
    },
    "_retention_cohorts_single_scan": {
        # cohort matrix: ONE corpus scan — the per-user cohort and the
        # per-cohort size both ride windows on the single lineage; a
        # groupBy + self-join spelling read the corpus 3× (pushed
        # join-key filters diverge, so exchange reuse never fires)
        "expect": ["Window", "Scan parquet"],
        "forbid": [r"\(\d+\) Scan parquet.*\(\d+\) Scan parquet",
                   "Join", "CartesianProduct"],
    },
    "_retention_state_decode": {
        # streaming retention decode: ONE state scan (latest-per-user
        # window + explode + the shared windowed matrix tail), no
        # joins, and work is state-sized — never event-history-sized
        "expect": ["Window", "Scan parquet"],
        "forbid": [r"\(\d+\) Scan parquet.*\(\d+\) Scan parquet",
                   "Join", "CartesianProduct"],
    },
}


def _verification_profile(spark, sf_dir):
    from haplorec_spark.operators.dedup import verification_profile
    from haplorec_spark.queries import table

    return verification_profile(
        table(spark, sf_dir, "documents").select("doc_id", "text"),
        threshold=0.8, margin=0.15, shingle_n=1, num_hashes=6,
        bands=6, hot_bucket_cap=4,
    )


def _history_probe_capped(spark, sf_dir):
    import os

    from haplorec_spark.operators.dedup import (
        history_candidate_pairs,
        write_lsh_store,
    )
    from haplorec_spark.queries import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    store = "/tmp/drive/_audit_probe_store"
    if not os.path.exists(store):
        write_lsh_store(docs, store, mode="overwrite")
    return history_candidate_pairs(
        docs.limit(50), store, store_probe_cap=8
    )


def _dup_spans(spark, sf_dir):
    from haplorec_spark.operators.dedup import duplicate_ngram_spans
    from haplorec_spark.queries import table

    return duplicate_ngram_spans(table(spark, sf_dir, "documents"), n=10)


def _semantic_dedup(spark, sf_dir):
    from pyspark.sql import functions as F

    from haplorec_spark.operators.similarity import semantic_dedup_pairs
    from haplorec_spark.queries import table

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return semantic_dedup_pairs(emb, threshold=0.8)


def _strip_boilerplate(spark, sf_dir):
    from haplorec_spark.operators.text import strip_boilerplate_lines
    from haplorec_spark.queries import table

    return strip_boilerplate_lines(table(spark, sf_dir, "documents"))


def _dup_spans_large(spark, sf_dir):
    from haplorec_spark.operators.dedup import duplicate_ngram_spans
    from haplorec_spark.queries import table

    return duplicate_ngram_spans(
        table(spark, sf_dir, "documents"), n=10, max_broadcast_grams=0
    )


def _strip_boilerplate_large(spark, sf_dir):
    # testdata docs are single-line and distinct, so seed a shared
    # header (as the tests do) — otherwise the measured hot set is 0
    # and the broadcast path is (correctly) taken even at bound 0
    from pyspark.sql import functions as F

    from haplorec_spark.operators.text import strip_boilerplate_lines
    from haplorec_spark.queries import table

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.concat(F.lit("HEADER\n"), F.col("text")).alias("text")
    )
    return strip_boilerplate_lines(docs, max_broadcast_lines=0)


def _unigram_lm_large(spark, sf_dir):
    from haplorec_spark.operators.text import unigram_logprob_score
    from haplorec_spark.queries import table

    return unigram_logprob_score(
        table(spark, sf_dir, "documents"), max_broadcast_vocab=0
    )


#: fixed 2x2x2 codebook nest so the PQ audits exercise the plan shape
#: without running training jobs
_PQ_CBS = [
    [[0.0, 0.0], [1.0, 1.0]],
    [[0.0, 1.0], [1.0, 0.0]],
]


def _pq_vectors(spark, sf_dir):
    from pyspark.sql import functions as F

    from haplorec_spark.queries import table

    return table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("slice(embedding, 1, 4)").alias("embedding")
    )


def _chunk_documents(spark, sf_dir):
    from haplorec_spark.operators.text import chunk_documents
    from haplorec_spark.queries import table

    return chunk_documents(
        table(spark, sf_dir, "documents"), chunk_size=24, stride=16
    )


def _pq_encode(spark, sf_dir):
    from haplorec_spark.operators.similarity import pq_encode

    return pq_encode(_pq_vectors(spark, sf_dir), _PQ_CBS)


#: fixed 4-dim bounds so the SQ audits exercise the plan shape without
#: running the bounds aggregate
_SQ_BOUNDS = ([0.0, 0.0, -1.0, -1.0], [1.0, 2.0, 1.0, 0.5])


def _sq_encode(spark, sf_dir):
    from haplorec_spark.operators.similarity import sq_encode

    return sq_encode(_pq_vectors(spark, sf_dir), _SQ_BOUNDS)


def _sq_adc(spark, sf_dir):
    from pyspark.sql import functions as F

    from haplorec_spark.operators.similarity import sq_encode, sq_topk

    vecs = _pq_vectors(spark, sf_dir)
    return sq_topk(
        sq_encode(vecs, _SQ_BOUNDS),
        vecs.filter(F.col("vec_id") < 5),
        _SQ_BOUNDS,
    )


def _web_urls(spark, sf_dir):
    from pyspark.sql import functions as F

    from haplorec_spark.queries import table

    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://WWW."), F.upper("source"),
            F.lit("-Site.org:443/p/"), F.col("doc_id").cast("string"),
            F.lit("?utm_campaign=z&q=1#f"),
        ).alias("url"),
    )


def _web_canonicalize(spark, sf_dir):
    from haplorec_spark.operators.web import (
        canonicalize_urls,
        filter_blocked_domains,
        parse_urls,
    )

    return filter_blocked_domains(
        parse_urls(canonicalize_urls(_web_urls(spark, sf_dir), "url"), "url"),
        ["src0-site.org"],
    )


def _cap_per_domain(spark, sf_dir):
    from haplorec_spark.operators.web import (
        canonicalize_urls,
        cap_per_domain,
        parse_urls,
    )

    return cap_per_domain(
        parse_urls(canonicalize_urls(_web_urls(spark, sf_dir), "url"), "url"),
        5,
        ["doc_id"],
    )


def _ivf_pq_topk(spark, sf_dir):
    from pyspark.sql import functions as F

    from haplorec_spark.operators.similarity import ivf_pq_topk

    vecs = _pq_vectors(spark, sf_dir)
    return ivf_pq_topk(
        vecs,
        vecs.filter(F.col("vec_id") < 10),
        k=5,
        n_clusters=4,
        iterations=1,
        m=2,
        pq_k=4,
        pq_iterations=1,
    )


def _pq_adc(spark, sf_dir):
    from pyspark.sql import functions as F

    from haplorec_spark.operators.similarity import pq_encode, pq_topk

    vecs = _pq_vectors(spark, sf_dir)
    return pq_topk(
        pq_encode(vecs, _PQ_CBS),
        vecs.filter(F.col("vec_id") < 10),
        _PQ_CBS,
        k=5,
    )

def _bigram_lm(spark, sf_dir):
    """Bigram-LM scoring plan: pair extraction is a map-side transform
    over the token array (Generate, never a positional self-join);
    both count tables broadcast at this vocabulary size."""
    from haplorec_spark.operators.text import bigram_logprob_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bigram_logprob_score(docs)


def _refine_topk(spark, sf_dir):
    """Exact-refine stage: the candidate shortlist and probe vectors
    broadcast onto the corpus scan; the only shuffle is the per-probe
    top-k window."""
    from pyspark.sql import functions as F

    from haplorec_spark.operators.similarity import refine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 5)
    cand = probes.select(
        F.col("vec_id").alias("probe_id")
    ).crossJoin(
        emb.filter(F.col("vec_id") % 7 == 0).select(
            F.col("vec_id").alias("neighbor_id")
        )
    )
    return refine_topk(cand, emb, probes, k=5)


def _train_linear_grad(spark, sf_dir):
    """One training iteration's gradient plan: weights broadcast, the
    doc-keyed feats joins reuse feats' cached partitioning, and the
    only fresh exchange is the word-keyed gradient aggregate."""
    from pyspark.sql import functions as F

    from haplorec_spark.operators.training import (
        _prepare_features,
        _residuals,
        _word_gradient,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", (F.length("text") % 2).alias("label")
    )
    feats, labels = _prepare_features(
        docs, label_col="label", text_col="text", id_col="doc_id",
        average=True,
    )
    feats.count()  # materialize the cache, as the trainer does
    labels.count()
    weights = feats.select("__word").distinct().select(
        "__word", F.lit(0.0).alias("__w")
    ).localCheckpoint(eager=True)
    resid = _residuals(
        feats, labels, weights, 0.0,
        vocab_size=weights.count(), max_broadcast_vocab=2_000_000,
    )
    return _word_gradient(feats, resid, 100)


def _mixture_upsample(spark, sf_dir):
    from haplorec_spark.operators.sampling import mixture_upsample
    from haplorec_spark.queries import table

    return mixture_upsample(
        table(spark, sf_dir, "documents"),
        {"en": 0.2, "de": 0.5, "zh": 0.3},
        "lang",
        ["doc_id"],
    )


def _dsir_weights(spark, sf_dir, **kw):
    from pyspark.sql import functions as F

    from haplorec_spark.operators.sampling import importance_weights
    from haplorec_spark.queries import table

    docs = table(spark, sf_dir, "documents")
    return importance_weights(
        docs, docs.filter(F.col("doc_id") % 7 == 0), **kw
    )


def _dsir_weights_large(spark, sf_dir):
    return _dsir_weights(spark, sf_dir, max_broadcast_vocab=0)


def _bpe_pair_counts(spark, sf_dir):
    """One BPE training iteration's pair-count plan, exactly as
    train_bpe builds it (minus the localCheckpoint the real trainer
    pins the seed table with — the audit wants the lineage visible)."""
    from haplorec_spark.operators.bpe import _adjacent_pairs, bpe_word_counts
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    syms = bpe_word_counts(docs).select(
        "count",
        F.expr("concat(split(word, ''), array('</w>'))").alias("syms"),
    )
    return (
        syms.select("count", F.explode(_adjacent_pairs("syms")).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("count").alias("c"))
        .orderBy(F.col("c").desc(), "l", "r")
        .limit(1)
    )


def _bpe_tokenize(spark, sf_dir):
    from haplorec_spark.operators.bpe import bpe_tokenize, train_bpe
    from haplorec_spark.queries import table

    docs = table(spark, sf_dir, "documents")
    merges = train_bpe(docs.limit(20), n_merges=4)
    return bpe_tokenize(docs, merges)


def _map_side_curation(spark, sf_dir):
    from haplorec_spark.curation import CurationConfig, map_side_curation
    from haplorec_spark.queries import table

    return map_side_curation(
        table(spark, sf_dir, "documents"),
        CurationConfig(
            detect_language="ngram",
            languages=["en", "de"],
            classifier_weights={"the": 0.4, "slow": -0.7},
            dedup=None,
        ),
    )


def _bpe_token_length_histogram(spark, sf_dir):
    from haplorec_spark.operators.bpe import (
        bpe_token_length_histogram,
        train_bpe,
    )
    from haplorec_spark.queries import table

    docs = table(spark, sf_dir, "documents")
    merges = train_bpe(docs.limit(20), n_merges=4)
    return bpe_token_length_histogram(docs, merges)


def _pack_token_ids(spark, sf_dir):
    from haplorec_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_vocab,
        train_bpe,
    )
    from haplorec_spark.operators.packing import pack_token_ids
    from haplorec_spark.queries import table

    docs = table(spark, sf_dir, "documents")
    merges = train_bpe(docs.limit(20), n_merges=4)
    ids = bpe_encode_ids(docs, merges, bpe_vocab(docs.limit(20), merges))
    return pack_token_ids(ids, 128, pad_id=0)


def _bpe_encode_ids(spark, sf_dir):
    from haplorec_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_vocab,
        train_bpe,
    )
    from haplorec_spark.queries import table

    docs = table(spark, sf_dir, "documents")
    merges = train_bpe(docs.limit(20), n_merges=4)
    return bpe_encode_ids(docs, merges, bpe_vocab(docs.limit(20), merges))


def _curation_bpe_pack(spark, sf_dir):
    from haplorec_spark.curation import CurationConfig, curate_documents
    from haplorec_spark.operators.bpe import train_bpe
    from haplorec_spark.queries import table

    docs = table(spark, sf_dir, "documents")
    merges = train_bpe(docs.limit(20), n_merges=4)
    out, _ = curate_documents(
        docs,
        config=CurationConfig(
            mixture_weights={"en": 0.5, "de": 0.5}, seq_len=64
        ),
        bpe_merges=merges,
    )
    return out


def _script_curation(spark, sf_dir):
    # the script-segmented curation chain (round 9): language detect +
    # keep-list + quality floors under segmentation="script" must stay
    # ONE map-side projection/filter chain — segmentation is regexp
    # passes inside the same expressions, no join, no Python
    from haplorec_spark.curation import CurationConfig, map_side_curation
    from haplorec_spark.queries import table

    docs = table(spark, sf_dir, "documents")
    return map_side_curation(
        docs,
        CurationConfig(
            detect_language="ngram",
            languages=["en", "zh", "ja", "ko", "th"],
            segmentation="script",
        ),
    )


def _wet_source(spark, sf_dir):
    # the WARC/WET record parser: a binaryFile scan into ONE
    # mapInPandas — per-FILE Python (the imperative record framing),
    # never a shuffle; downstream work stays in column programs
    import gzip as _gzip
    import os

    from haplorec_spark.sources import wet_source

    p = "/tmp/drive/_audit_wet"
    os.makedirs(p, exist_ok=True)
    payload = b"the audit record payload"
    rec = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\n"
        b"WARC-Record-ID: <urn:uuid:a>\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"WARC-Target-URI: http://example.com/\r\n"
        b"Content-Type: text/plain\r\n"
        + b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
        + payload + b"\r\n\r\n"
    )
    with open(f"{p}/a.warc.gz", "wb") as f:
        f.write(_gzip.compress(rec))
    return wet_source(spark, p)


def _unigram_encode_ids(spark, sf_dir):
    from haplorec_spark.operators.unigram import (
        train_unigram,
        unigram_encode_ids,
        unigram_vocab,
    )
    from haplorec_spark.queries import table

    docs = table(spark, sf_dir, "documents")
    pieces = train_unigram(docs.limit(20), 60, max_piece_len=4)
    return unigram_encode_ids(docs, pieces, unigram_vocab(pieces))


def _funnel_depth_capped(spark, sf_dir):
    from haplorec_spark.operators.funnel import funnel_depth
    from haplorec_spark.queries import table

    return funnel_depth(
        table(spark, sf_dir, "events"), ["view", "click", "purchase"],
        within_seconds=259200, max_events_per_user=1000,
    )


def _lsh_verified_pairs(spark, sf_dir):
    from haplorec_spark.operators.dedup import lsh_verified_pairs
    from haplorec_spark.queries import table

    return lsh_verified_pairs(
        table(spark, sf_dir, "documents").select("doc_id", "text"),
        threshold=0.7, hot_bucket_cap=64,
    )


def _text_corpus_profile_single_scan(spark, sf_dir):
    from haplorec_spark.operators.profiling import text_corpus_profile
    from haplorec_spark.queries import table

    return text_corpus_profile(table(spark, sf_dir, "documents"))


def _retention_cohorts_single_scan(spark, sf_dir):
    from haplorec_spark.operators.retention import retention_cohorts
    from haplorec_spark.queries import table

    return retention_cohorts(table(spark, sf_dir, "events"))


def _retention_state_decode(spark, sf_dir):
    import os

    from haplorec_spark.queries import table
    from haplorec_spark.streaming import (
        _retention_ingest_fn,
        retention_state_cohorts,
    )

    state = "/tmp/drive/_audit_retention_state"
    if not os.path.exists(state):
        ingest = _retention_ingest_fn(
            state_path=state, period="week",
            user_col="user_id", ts_col="ts",
        )
        ingest(table(spark, sf_dir, "events"), 0)
    return retention_state_cohorts(spark, state)


import haplorec_spark.queries as _qmod

reg = registry()
bad = 0
for name, spec in CHECKS.items():
    # Some audited plans (q_events_hourly) are library functions without a
    # driver correctness gate; resolve those from the module directly.
    if name.startswith("_"):
        fn = globals()[name]
    else:
        fn = reg[name].fn if name in reg else getattr(_qmod, name)
    df = fn(spark, SF)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    problems = []
    for pat in spec["expect"]:
        if not re.search(pat, plan, re.DOTALL):
            problems.append(f"missing /{pat}/")
    for pat in spec["forbid"]:
        if re.search(pat, plan, re.DOTALL):
            problems.append(f"found forbidden /{pat}/")
    status = "OK " if not problems else "BAD"
    bad += bool(problems)
    print(f"{status} {name}" + (f": {problems}" if problems else ""))
    if problems:
        print(plan[:4000])

print(f"\n{len(CHECKS) - bad}/{len(CHECKS)} plans clean")
