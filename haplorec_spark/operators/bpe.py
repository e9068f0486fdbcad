"""Byte-pair-encoding tokenizer training and encoding, Spark-first.

The classic BPE trainer (Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units") never touches the corpus
after the first pass: it learns merges from the WORD-FREQUENCY table.
That is exactly the shape that scales on Spark:

* ONE corpus scan builds ``(word, count)`` — the same explode +
  token-keyed count as :func:`haplorec_spark.operators.text.build_vocab`
  (map-side combined, one shuffle). At 100 TB the corpus is read once.
* Merge learning then runs over the DISTINCT-WORD table only
  (vocabulary-sized, many orders of magnitude smaller than the
  corpus), adaptively: when the vocabulary fits the measured
  ``max_driver_vocab`` bound — the normal case; real tokenizer
  corpora have 10^5-10^6 distinct words — the word-count table is
  collected ONCE (bounded, like the k-means codebook collect in
  ``similarity.kmeans_centroids``) and merges are learned by the
  classic incremental pair-count algorithm in driver memory
  (:func:`_train_bpe_driver`): a production 32k-64k merge vocabulary
  is one Spark round-trip plus seconds of CPU, not one Spark job per
  merge.
* Above the bound, the distributed loop runs with an INCREMENTALLY
  MAINTAINED pair-count DataFrame: the adjacent-pair counts are
  aggregated ONCE up front, then each iteration collects the top
  ``merge_batch + 1`` pairs from that table, accepts the longest
  prefix provably identical to what sequential iterations would pick
  (:func:`_accept_merge_prefix`), rewrites ONLY the words that
  contain an accepted pair, and folds the induced count delta
  (-old adjacencies, +new adjacencies of the rewritten words) back
  into the pair table — the same delta bookkeeping
  :func:`_train_bpe_driver` does in memory, as a vocabulary-sized
  DataFrame update. No iteration ever re-zips and re-aggregates the
  full symbol table again. Exact, never approximate — all rungs
  produce the bit-identical merge table (test-pinned).
* Encoding inverts the same trick: the greedy merge-order loop is
  genuinely procedural (rank-ordered pair replacement — the documented
  pandas-UDF case, like U2/A13), but it runs per DISTINCT word, and the
  corpus gets its tokens back through a word-keyed join. The Python
  cost is vocabulary-sized; the corpus-sized work stays JVM-side.

Lineage across iterations is truncated with non-eager
``localCheckpoint()`` every iteration (materialized for free by the
next top-k job) so ``n_merges`` chained folds never build an
O(n_merges)-deep plan for Catalyst to re-analyze each round.

Determinism: ties in pair counts break by (left, right) lexicographic
order, so the learned merge table is reproducible across engines — the
pure-Python replica in ``tests/test_bpe.py`` must (and does) produce
bit-identical merges and encodings from the same word counts.
"""

from __future__ import annotations

import pandas as pd  # module-level so the pandas-UDF type hints resolve
from pyspark.sql import DataFrame, functions as F

__all__ = [
    "GPT2_PRETOKEN_PATTERN",
    "pretokenize_words",
    "bpe_word_counts",
    "train_bpe",
    "bpe_encode_words",
    "bpe_tokenize",
    "bpe_vocab",
    "bpe_encode_ids",
    "bpe_token_length_histogram",
    "decode_byte_token",
    "save_bpe_tokenizer",
    "load_bpe_tokenizer",
]

#: End-of-word sentinel appended as its own symbol (the Sennrich setup):
#: it lets the learned subwords distinguish word-final from word-internal
#: occurrences without reserving any real character.
END_OF_WORD = "</w>"


def _seed_syms_py(word: str, byte_level: bool) -> list[str]:
    """A word's seed symbol sequence (sans sentinel): characters, or —
    byte-level mode, the GPT-2-style modern default — its UTF-8 bytes
    as two-char lowercase hex strings, so any unicode text tokenizes
    over a closed 256-symbol base alphabet with no <unk> at the
    character level."""
    if byte_level:
        h = word.encode("utf-8").hex()
        return [h[i : i + 2] for i in range(0, len(h), 2)]
    return list(word)


def _seed_syms_sql(byte_level: bool) -> str:
    """The SQL twin of :func:`_seed_syms_py` over a ``word`` column,
    sentinel appended — the only expression byte-level mode swaps."""
    if byte_level:
        # one regex pass chunks the hex into byte pairs — the
        # per-index substring form recomputed the hex inside the
        # lambda and paid UTF8String's O(i) code-point walk per pair
        h = "lower(hex(encode(word, 'UTF-8')))"
        return (
            f"concat(regexp_extract_all({h}, '..', 0),"
            f" array('{END_OF_WORD}'))"
        )
    return f"concat(split(word, ''), array('{END_OF_WORD}'))"


def decode_byte_token(token: str) -> str:
    """Render a byte-level token (hex string) as text for display;
    undecodable byte runs (a token may split a multi-byte codepoint)
    show replacement characters. The sentinel passes through."""
    if token == END_OF_WORD:
        return token
    body = token[:-len(END_OF_WORD)] if token.endswith(END_OF_WORD) else token
    tail = token[len(body):]
    return bytes.fromhex(body).decode("utf-8", errors="replace") + tail


#: The published GPT-2/RoBERTa pre-tokenization pattern (Radford et
#: al. 2019, the ``pat`` of the public reference encoder): contraction
#: suffixes first, then optionally-space-prefixed Unicode
#: letter/number/punctuation category runs, then whitespace — where
#: ``\s+(?!\S)`` keeps the LAST space of a multi-space run glued to
#: the following word, the "leading-space ownership" that makes
#: ``' word'`` and ``'word'`` distinct tokens. Java regex handles the
#: lookahead and ``\p{L}``/``\p{N}`` natively; note Java's ``\s`` is
#: ASCII whitespace (the one documented divergence from the Python
#: ``regex``-module original, which treats e.g. NBSP as whitespace —
#: here NBSP is a punctuation run, a stable and deterministic choice).
GPT2_PRETOKEN_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"
    r"|\s+(?!\S)|\s+"
)

#: Valid ``pretokenize=`` modes, shared by every face that splits
#: documents into words (train, encode, fertility, histogram, drift).
PRETOKENIZE_MODES = ("whitespace", "gpt2")


def pretokenize_words(text_col: str, pretokenize: str = "whitespace"):
    """Column of the document's word array under the named
    pre-tokenization mode — THE single definition of "word" shared by
    training (:func:`bpe_word_counts`) and every encode face
    (:func:`bpe_encode_ids`, :func:`bpe_tokenize`), so the two can
    never drift; the mode travels in the saved artifact
    (:func:`save_bpe_tokenizer`) for the same reason ``byte_level``
    does.

    * ``"whitespace"`` — the original behavior: lowercase, split on
      single spaces, drop empty strings. Right for whitespace-clean
      analytic corpora; on real web text it glues punctuation to
      words (``word.``, ``(word``) so learned merges and any public
      tokenizer disagree.
    * ``"gpt2"`` — the published GPT-2 regex
      (:data:`GPT2_PRETOKEN_PATTERN`): case is PRESERVED,
      punctuation/letters/digits split into separate runs, a word
      owns its single leading space. Whitespace-only pretokens are
      dropped (they carry no merge signal — the engine's
      word-frequency contract has never counted bare separators).
      This is the mode that makes byte-level training and
      ``bpe_encode_ids`` agree with public tokenizer behavior on
      punctuation-glued web text.

    One ``regexp_extract_all`` pass per document either way — a
    map-side column program, no Python.
    """
    if pretokenize not in PRETOKENIZE_MODES:
        raise ValueError(
            f"unknown pretokenize mode {pretokenize!r}; "
            f"expected one of {PRETOKENIZE_MODES}"
        )
    if pretokenize == "gpt2":
        toks = F.regexp_extract_all(
            F.col(text_col), F.lit(GPT2_PRETOKEN_PATTERN), F.lit(0)
        )
        return F.filter(toks, lambda w: ~w.rlike(r"^\s+$"))
    return F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda w: w != ""
    )


def bpe_word_counts(
    docs: DataFrame,
    *,
    text_col: str = "text",
    min_count: int = 1,
    pretokenize: str = "whitespace",
) -> DataFrame:
    """(word, count): the word-frequency table the trainer consumes —
    one corpus scan, one map-side-combined shuffle. "Word" is defined
    by ``pretokenize`` (:func:`pretokenize_words`): the default
    whitespace split, or the published GPT-2 regex for
    public-tokenizer-faithful training on web text.

    ``min_count`` drops hapax-legomena-style noise before training
    (standard practice: a pair occurring only inside singleton words
    can never be a useful merge). Empty-string artifacts of repeated
    whitespace are dropped, as in ``build_vocab``.
    """
    counts = (
        docs.select(
            F.explode(pretokenize_words(text_col, pretokenize)).alias(
                "word"
            )
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    if min_count > 1:
        counts = counts.filter(F.col("count") >= min_count)
    return counts


def _adjacent_pairs(syms_col: str = "syms"):
    """array<struct<l,r>> of adjacent symbol pairs — map-side zip of
    the array against its own tail, no explode-then-self-join."""
    n1 = f"greatest(size({syms_col}) - 1, 0)"
    return F.expr(
        f"zip_with(slice({syms_col}, 1, {n1}),"
        f" slice({syms_col}, 2, {n1}), (a, b) -> struct(a as l, b as r))"
    )


def _apply_merge(syms, left: str, right: str):
    """One BPE merge pass over a symbol array: greedy left-to-right,
    non-overlapping (``[a,a,a]`` under merge (a,a) becomes
    ``[aa, a]``) — a single map-side fold, built with Column lambdas
    so arbitrary corpus characters need no SQL-string escaping.

    ``F.get`` (0-based, null-on-out-of-bounds) keeps the empty-
    accumulator probe legal under ANSI mode, where ``element_at``
    would raise on the first element.
    """
    merged = left + right

    def step(acc, s):
        last = F.get(acc, F.size(acc) - 1)
        return F.when(
            last.eqNullSafe(F.lit(left)) & (s == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(
        syms, F.expr("cast(array() as array<string>)"), step
    )


def _apply_merges_batch(merge_list: list[tuple[str, str]]):
    """Apply an ORDERED batch of merges to a symbol array — one
    Arrow-batched pandas UDF over the vocabulary-sized symbol table
    (never the corpus), replacing ``len(merge_list)`` chained
    single-merge folds with one plan layer. Per merge the replacement
    is greedy left-to-right, non-overlapping — byte-identical to
    :func:`_apply_merge` and to the pure-Python replica in
    ``tests/test_bpe.py``."""
    from pyspark.sql.functions import pandas_udf

    def apply_one(syms: list, left: str, right: str) -> list:
        out, i, n = [], 0, len(syms)
        merged = left + right
        while i < n:
            if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    @pandas_udf("array<string>")
    def apply_all(col: pd.Series) -> pd.Series:
        def go(syms):
            syms = list(syms)
            for left, right in merge_list:
                syms = apply_one(syms, left, right)
            return syms

        return col.map(go)

    return apply_all


def _train_bpe_driver(
    word_counts: list[tuple[str, int]],
    n_merges: int,
    min_pair_count: int,
    byte_level: bool = False,
) -> list[tuple[str, str, int]]:
    """Exact BPE training over a COLLECTED word-count table — the
    classic incremental algorithm (pair-count heap + pair→word
    inverted index, only the words containing the merged pair are
    rewritten per step), so learning 32k merges costs seconds of
    driver CPU and ZERO Spark jobs. Same spec, same (count desc,
    (left, right) asc) tie-break as the distributed loop and the
    pure-Python replica in ``tests/test_bpe.py`` — the three must be
    bit-identical.

    The heap uses lazy invalidation: every count change pushes a fresh
    entry; stale entries (stored count != current) are skipped on pop.
    """
    import heapq
    from collections import Counter, defaultdict

    words: list[tuple[list[str], int]] = [
        (_seed_syms_py(w, byte_level) + [END_OF_WORD], c)
        for w, c in word_counts
    ]
    pair_counts: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    for ix, (syms, c) in enumerate(words):
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] += c
            pair_words[p].add(ix)
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str, int]] = []
    while len(merges) < n_merges and heap:
        negc, pair = heapq.heappop(heap)
        cnt = pair_counts.get(pair, 0)
        if cnt <= 0 or -negc != cnt:
            continue  # stale entry; the current count was re-pushed
        if cnt < min_pair_count:
            break
        left, right = pair
        merged = left + right
        merges.append((left, right, cnt))
        changed: Counter = Counter()
        for ix in list(pair_words[pair]):
            syms, wc = words[ix]
            out: list[str] = []
            i, n = 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            old_pairs = [
                (syms[i], syms[i + 1]) for i in range(len(syms) - 1)
            ]
            new_pairs = [
                (out[i], out[i + 1]) for i in range(len(out) - 1)
            ]
            for p in old_pairs:
                changed[p] -= wc
            for p in new_pairs:
                changed[p] += wc
            for p in set(old_pairs) - set(new_pairs):
                pair_words[p].discard(ix)
            for p in set(new_pairs) - set(old_pairs):
                pair_words[p].add(ix)
            words[ix] = (out, wc)
        for p, delta in changed.items():
            if delta == 0:
                continue
            c = pair_counts[p] + delta
            if c <= 0:
                pair_counts.pop(p, None)
            else:
                pair_counts[p] = c
                heapq.heappush(heap, (-c, p))
    return merges


def _accept_merge_prefix(
    ranked: list[tuple[str, str, int]],
    cutoff: int | None,
    alphabet: set[str],
) -> list[tuple[str, str, int]]:
    """The longest prefix of the ranked pair list that PROVABLY equals
    the picks ``len(prefix)`` sequential BPE iterations would make,
    so a whole batch can be merged off one pair-count job without
    changing the learned table.

    ``ranked`` is the collected top pairs, sorted (count desc, left,
    right) — the trainer's exact pick order; ``cutoff`` is the count
    of the first pair BELOW the collected window (None when the window
    holds every existing pair). Scanning in order, a candidate is
    accepted while ALL of:

    * **symbol-disjoint**: its {left, right} shares no symbol with any
      earlier accepted pair's {left, right, merged}. Merging (a,b)
      only changes counts of pairs touching a, b, or the new symbol
      ab, so disjoint pairs keep their collected counts through every
      earlier merge in the batch.
    * **novel merged symbol, no self-pair**: its merged string is not
      already in the symbol alphabet, and scanning stops AFTER
      accepting a colliding pair OR a self-pair (left == right). A
      collision conflates the new symbol with existing occurrences; a
      self-pair's merge sites mint new pairs out of the accepted
      pair's OWN occurrences ([a,a,a,a] → (aa,aa)) — in both cases
      pairs can GAIN count mid-batch in ways the collected counts
      don't bound, so nothing after such a pair is provably the
      sequential pick.
    * **strict count gap** (positions after the first): its count is
      strictly above every NON-accepted pair's — i.e. above the count
      of the first ranked pair outside the accepted prefix (the list
      is sorted, so that one bounds the rest), and above ``cutoff``.
      Every pair whose count CAN rise mid-batch — a new pair (ab, x)
      needs an old (b, x) adjacency at each site, and (b, x) shares b
      with an accepted pair so it is itself non-accepted — is bounded
      by a non-accepted pair's collected count, so nothing can outrank
      (or tie-break past) an accepted pick at its sequential turn;
      unchanged pairs ranked below stay below under the deterministic
      (count desc, left, right) order.

    The first pair is always the true sequential pick (same sort, same
    tie-break), so progress is guaranteed even when the gap rule
    truncates everything else (flat counts, overlapping top pairs).
    """
    accepted: list[tuple[str, str, int]] = []
    support: set[str] = set()
    for left, right, cnt in ranked:
        if accepted and (left in support or right in support):
            break
        merged = left + right
        accepted.append((left, right, cnt))
        support.update((left, right, merged))
        if merged in alphabet or left == right:
            # collision — or a SELF-pair: merging (a,a) over a run
            # [a,a,a,...] mints new (aa,a)/(aa,aa) adjacencies whose
            # counts derive from the accepted pair's own occurrences,
            # so they are NOT bounded by the non-accepted window (the
            # neighbor pair at each mint site is the accepted pair
            # itself — the one case the disjointness argument cannot
            # cover). Nothing after this pair is provably sequential.
            break
    bound: int | None = cutoff
    if len(accepted) < len(ranked):
        first_out = ranked[len(accepted)][2]
        bound = first_out if bound is None else max(bound, first_out)
    if bound is not None:
        keep = [accepted[0]]
        for cand in accepted[1:]:
            if cand[2] <= bound:
                break
            keep.append(cand)
        accepted = keep
    return accepted


def train_bpe(
    docs: DataFrame,
    n_merges: int = 50,
    *,
    text_col: str = "text",
    min_word_count: int = 1,
    min_pair_count: int = 1,
    max_word_chars: int | None = None,
    checkpoint_interval: int = 8,
    merge_batch: int = 32,
    max_driver_vocab: int | None = 2_000_000,
    byte_level: bool = False,
    pretokenize: str = "whitespace",
) -> DataFrame:
    """(merge_rank, left, right, merged, pair_count): the learned BPE
    merge table, in training order.

    Each word is seeded as its character sequence plus the
    :data:`END_OF_WORD` symbol; every iteration counts weighted
    adjacent pairs across the distinct-word table, merges the most
    frequent pair (ties: lexicographic (left, right) — deterministic
    across engines), and rewrites the symbol arrays map-side. Stops
    early when no pair reaches ``min_pair_count`` (or none is left).

    Scale shape — three rungs, all producing the IDENTICAL table:

    1. The corpus is scanned ONCE (``bpe_word_counts``) into the
       word-frequency table; merge learning never touches the corpus
       again. At 100 TB this scan is the only corpus-sized cost.
    2. When the distinct-word table fits ``max_driver_vocab`` (the
       measured-bound adaptive pattern of ``dedup_clusters``/
       ``assign_ids``; checked by the one bounded ``limit(n+1)``
       collect that also FETCHES the table), merges are learned by
       :func:`_train_bpe_driver` — the classic incremental pair-count
       algorithm — in driver memory: a production 32k–64k merge
       vocabulary costs ONE Spark round-trip and seconds of CPU,
       instead of one job per merge. This is the normal path: real
       tokenizer training corpora have 10^5–10^6 distinct words.
       Driver memory is ≈2 GB per million words (measured: 1.16M
       words → 2.08 GB RSS, 3.6 merges/s over the first 500 merges
       and accelerating as pair supports shrink), so the 2M default
       costs ≈4 GB — size the knob to the driver's heap, the same
       way every single-node tokenizer trainer is sized.

       **Driver-memory prerequisite** (not just a docstring aside):
       the 2M-word default assumes a driver with ≥8 GB of heap —
       Spark's default 1g ``spark.driver.memory`` can OOM on a corpus
       whose pruned vocabulary approaches the bound. On a
       default-configured driver pass ``max_driver_vocab=500_000``
       (the pre-round-7 default, ≈1 GB) or raise
       ``spark.driver.memory``; callers who sized their driver keep
       the fast rung for every realistic tokenizer corpus.
    3. Above the bound, the distributed loop runs over the symbol
       table with an INCREMENTALLY MAINTAINED pair-count DataFrame
       (aggregated once at seed, then updated with each accepted
       batch's exact ±delta — the driver rung's bookkeeping as a
       DataFrame update): one top-k job per iteration collects the
       top ``merge_batch + 1`` pairs and accepts the longest prefix
       provably identical to sequential picks
       (:func:`_accept_merge_prefix`), rewriting only the words that
       contain an accepted pair — O(n_merges / realized-batch)
       driver round-trips, exact, never approximate. Measured 2.7×
       (1.16M-word vocab) to 3.7× (116k) over the round-6
       recount-every-pair loop; the residual per-iteration cost is
       the ~0.3-0.4 s Spark job floor plus one map-side hit scan,
       so the driver rung remains ~13× faster at 1.16M words —
       prune (``min_word_count``, ``max_word_chars``) or raise
       ``max_driver_vocab`` before leaning on this rung.

    ``tests/test_bpe.py`` pins all three rungs against each other and
    against an independent pure-Python replica.

    ``byte_level`` seeds each word as its UTF-8 BYTES (two-char hex
    symbols, the GPT-2-style modern default) instead of Java code
    units: the base alphabet is closed at 256, so arbitrary unicode
    tokenizes with no character-level <unk>, and learned tokens can
    split multi-byte codepoints. Train and encode MUST agree on the
    flag (hex symbols never match char symbols); render tokens for
    display with :func:`decode_byte_token`. Default (char-level) is
    the documented behavior for the ASCII-dominant test corpora.

    ``pretokenize`` picks the word definition
    (:func:`pretokenize_words`): the default whitespace split, or
    ``"gpt2"`` — the published GPT-2 regex (contraction suffixes,
    letter/digit/punctuation category runs, leading-space ownership,
    case preserved) — so byte-level training learns merges over the
    same pretokens a public tokenizer would see on punctuation-glued
    web text. Train and encode MUST agree on the mode (the artifact
    carries it, like ``byte_level``).

    ``max_word_chars`` drops longer "words" from TRAINING (web corpora
    carry unbroken URLs/base64/DNA runs; the merge fold's accumulator
    copy is O(len²) per word, so a single 10k-char token costs more
    than the rest of the vocabulary — and its interior pairs are noise
    to the merge statistics anyway, the reason real BPE trainers cap
    word length). Encoding is unaffected: long words still tokenize
    under the learned merges.
    """
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    if checkpoint_interval < 1:
        # retained for API stability: the incremental loop now
        # truncates lineage every iteration (non-eager checkpoints),
        # but an invalid cadence is still a caller bug worth failing
        # fast on, before the corpus scan is paid
        raise ValueError(
            f"checkpoint_interval must be >= 1, got {checkpoint_interval}"
        )
    if merge_batch < 1:
        raise ValueError(f"merge_batch must be >= 1, got {merge_batch}")
    spark = docs.sparkSession
    counts = bpe_word_counts(
        docs,
        text_col=text_col,
        min_count=min_word_count,
        pretokenize=pretokenize,
    )
    if max_word_chars is not None:
        counts = counts.filter(F.length("word") <= max_word_chars)
    # pin the corpus-derived word table: neither the driver-bound
    # probe nor the distributed iterations may re-trigger the corpus
    # scan
    counts = counts.localCheckpoint(eager=True)
    if max_driver_vocab is not None and n_merges > 0:
        head = counts.limit(max_driver_vocab + 1).collect()
        if len(head) <= max_driver_vocab:
            return spark.createDataFrame(
                [
                    (i, l, r, l + r, c)
                    for i, (l, r, c) in enumerate(
                        _train_bpe_driver(
                            [(r["word"], int(r["count"])) for r in head],
                            n_merges,
                            min_pair_count,
                            byte_level,
                        )
                    )
                ],
                "merge_rank int, left string, right string, "
                "merged string, pair_count bigint",
            )
    # re-widen before seeding: AQE coalesces the word-count shuffle to
    # ~1 partition at test scale, which would serialize every
    # iteration's hit scan and merge apply onto one core — one
    # vocabulary-sized shuffle up front buys full-width map stages for
    # the whole loop
    syms = counts.repartition(
        spark.sparkContext.defaultParallelism
    ).select("count", F.expr(_seed_syms_sql(byte_level)).alias("syms"))
    # the full symbol alphabet, tracked driver-side for the batch
    # collision check: seed characters (bounded by the charset, like
    # the k-means codebook) plus every merged symbol as it is learned.
    # Only needed when batches can exceed one pair — with
    # merge_batch=1 the single candidate is accepted unconditionally,
    # so the distinct+collect job would be pure waste
    alphabet: set[str] = set()
    if merge_batch > 1 and n_merges > 0:
        alphabet = {
            r["s"]
            for r in syms.select(
                F.explode("syms").alias("s")
            ).distinct().collect()
        }
    # the pair-count table, aggregated ONCE from the seed symbols and
    # then maintained INCREMENTALLY: every accepted batch folds its
    # exact count delta (-old adjacencies, +new adjacencies of the
    # rewritten words) back in — the driver rung's bookkeeping
    # (bpe.py _train_bpe_driver) re-expressed as a vocabulary-sized
    # DataFrame update, so no iteration re-aggregates the full symbol
    # table. Non-eager checkpoints: each iteration's top-k job is the
    # first (and only) computation of the pending update, after which
    # the lineage is truncated.
    pairs = (
        syms.select(
            "count", F.explode(_adjacent_pairs("syms")).alias("p")
        )
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("count").alias("c"))
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[str, str, int]] = []
    while len(merges) < n_merges:
        want = min(merge_batch, n_merges - len(merges))
        ranked_rows = (
            pairs.orderBy(F.col("c").desc(), "l", "r")
            .limit(want + 1)
            .collect()
        )
        if not ranked_rows or ranked_rows[0]["c"] < min_pair_count:
            break
        ranked = [
            (r["l"], r["r"], int(r["c"])) for r in ranked_rows[:want]
        ]
        cutoff = (
            int(ranked_rows[want]["c"])
            if len(ranked_rows) > want
            else None
        )
        accepted = _accept_merge_prefix(ranked, cutoff, alphabet)
        # sequential stops at the first pick below min_pair_count;
        # counts in the accepted prefix are exactly sequential's, so
        # the same cut applies before the batch is committed
        hit_floor = any(c < min_pair_count for _, _, c in accepted)
        if hit_floor:
            accepted = [
                (l, r, c) for l, r, c in accepted if c >= min_pair_count
            ]
            if not accepted:
                break
        merges.extend(accepted)
        for left, right, _ in accepted:
            alphabet.add(left + right)
        if hit_floor or len(merges) >= n_merges:
            # neither table is ever read again — skip the apply
            break
        # rewrite ONLY the words containing an accepted pair: accepted
        # batches are symbol-disjoint (_accept_merge_prefix), so a
        # word no accepted pair occurs in pre-batch is untouched by
        # the whole batch (merging two symbols can never create an
        # adjacency of two symbols it doesn't mint). The hit test is
        # one map-side exists() over the adjacency zip; literals go
        # through Column lambdas so corpus characters need no SQL
        # escaping.
        pair_lits = [(l, r) for l, r, _ in accepted]

        def _make_is_hit(lits):
            def _is_hit(p):
                cond = F.lit(False)
                for left, right in lits:
                    cond = cond | (
                        (p["l"] == F.lit(left))
                        & (p["r"] == F.lit(right))
                    )
                return cond

            return _is_hit

        flagged = syms.withColumn(
            "hit",
            F.exists(_adjacent_pairs("syms"), _make_is_hit(pair_lits)),
        )
        misses = flagged.filter(~F.col("hit")).select("count", "syms")
        hits = flagged.filter(F.col("hit")).select(
            "count", F.col("syms").alias("old_syms")
        )
        if len(accepted) == 1:
            # single merge: keep the JVM-side map-side array fold
            left, right, _ = accepted[0]
            new_syms = _apply_merge(F.col("old_syms"), left, right)
        else:
            apply_all = _apply_merges_batch(pair_lits)
            new_syms = apply_all(F.col("old_syms"))
        # computed once (by the next top-k job, through the delta
        # lineage), then reused as the rewritten half of the symbol
        # table — hit rows only, a small fraction of the vocabulary
        hits = hits.select(
            "count", "old_syms", new_syms.alias("syms")
        ).localCheckpoint(eager=False)
        # raw ±count delta terms, NOT pre-aggregated: the union's
        # groupBy below already sums them, so a separate delta groupBy
        # would only add a second shuffle to every iteration
        delta = (
            hits.select(
                "count",
                _adjacent_pairs("old_syms").alias("op"),
                _adjacent_pairs("syms").alias("np"),
            )
            .select(
                F.explode(
                    F.concat(
                        F.expr(
                            "transform(op, p -> struct("
                            "p.l as l, p.r as r, -count as d))"
                        ),
                        F.expr(
                            "transform(np, p -> struct("
                            "p.l as l, p.r as r, count as d))"
                        ),
                    )
                ).alias("pd")
            )
            .select(
                F.col("pd.l").alias("l"),
                F.col("pd.r").alias("r"),
                F.col("pd.d").alias("c"),
            )
        )
        pairs = (
            pairs.unionByName(delta)
            .groupBy("l", "r")
            .agg(F.sum("c").alias("c"))
            .filter(F.col("c") > 0)
            .localCheckpoint(eager=False)
        )
        # coalesce the union back to a constant width: without it the
        # miss/hit split DOUBLES the partition count every iteration
        # (narrow merge, no shuffle — the table is vocabulary-sized).
        # Checkpointed non-eagerly EVERY iteration: the next top-k job
        # computes this table anyway (through delta → hits → flagged),
        # which materializes the checkpoint for free — so the next
        # iteration's hit scan reads stored partitions instead of
        # re-running a stack of exists() filters (depth-k recompute was
        # measured at ~4× the per-iteration cost before this).
        syms = (
            misses.unionByName(hits.select("count", "syms"))
            .coalesce(spark.sparkContext.defaultParallelism)
            .localCheckpoint(eager=False)
        )
    return spark.createDataFrame(
        [
            (i, l, r, l + r, c)
            for i, (l, r, c) in enumerate(merges)
        ],
        "merge_rank int, left string, right string, "
        "merged string, pair_count bigint",
    )


def _merge_ranks(merges: DataFrame) -> dict[tuple[str, str], int]:
    """The merge table as a driver-side rank dict — bounded at
    ``n_merges`` rows by construction, like the k-means codebook."""
    return {
        (r["left"], r["right"]): r["merge_rank"]
        for r in merges.select("merge_rank", "left", "right").collect()
    }


def _encode_word(
    word: str,
    ranks: dict[tuple[str, str], int],
    byte_level: bool = False,
) -> list[str]:
    """Greedy rank-order BPE encoding of one word (training-order
    replay): repeatedly merge the present pair with the LOWEST merge
    rank, left-to-right non-overlapping, until no learned pair
    remains. (Rank-order greedy, not sequential replay: a low-rank
    pair whose symbols only APPEAR after a later merge still gets
    merged — the subword-nmt encoding semantics.) The pure-Python
    replica in ``tests/test_bpe.py`` re-implements this spec
    independently."""
    syms = _seed_syms_py(word, byte_level) + [END_OF_WORD]
    while len(syms) > 1:
        pairs = {(syms[i], syms[i + 1]) for i in range(len(syms) - 1)}
        ranked = [(ranks[p], p) for p in pairs if p in ranks]
        if not ranked:
            break
        _, (left, right) = min(ranked)
        out: list[str] = []
        i = 0
        while i < len(syms):
            if (
                i + 1 < len(syms)
                and syms[i] == left
                and syms[i + 1] == right
            ):
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode_words(
    words: DataFrame,
    merges: DataFrame,
    *,
    word_col: str = "word",
    byte_level: bool = False,
) -> DataFrame:
    """(word, bpe_tokens, n_bpe_tokens): each distinct word encoded
    with the learned merge table.

    The greedy rank-order loop is procedural (SURVEY §2.9's documented
    pandas-UDF case); it runs as an Arrow-batched pandas UDF over the
    (deduplicated) word table, with the merge table collected to a
    rank dict — bounded at ``n_merges`` rows.
    """
    from pyspark.sql.functions import pandas_udf

    ranks = _merge_ranks(merges)

    @pandas_udf("array<string>")
    def encode(col: pd.Series) -> pd.Series:
        return col.map(lambda w: _encode_word(w, ranks, byte_level))

    return (
        words.select(F.col(word_col).alias("word"))
        .distinct()
        .withColumn("bpe_tokens", encode(F.col("word")))
        .withColumn("n_bpe_tokens", F.size("bpe_tokens"))
    )


def bpe_vocab(
    docs: DataFrame,
    merges: DataFrame,
    *,
    text_col: str = "text",
    specials: tuple[str, ...] = ("<pad>", "<unk>", "<bos>", "<eos>"),
    byte_level: bool = False,
    pretokenize: str = "whitespace",
) -> DataFrame:
    """(token_id, token, count): the id-assigned vocabulary a trained
    tokenizer ships — specials first (ids 0..len-1), then every token
    the merge table produces over this corpus, ordered by corpus
    frequency desc then token asc (deterministic across engines and
    layouts).

    The token set must come from the CORPUS, not the merge table
    alone: characters that never participated in a merge are still
    tokens. One distinct-word encode (the bounded pandas UDF of
    :func:`bpe_encode_words`) weighted by word counts, one token-keyed
    aggregate, and a single-partition rank window over the
    vocabulary-sized result (dimension-sized, like
    ``fk.resolve_fk_ids``' dictionary).
    """
    from pyspark.sql import Window

    counts = bpe_word_counts(
        docs, text_col=text_col, pretokenize=pretokenize
    )
    enc = bpe_encode_words(
        counts.select("word"), merges, byte_level=byte_level
    )
    tok_counts = (
        counts.join(enc, on="word")
        .select(F.explode("bpe_tokens").alias("token"), "count")
        .groupBy("token")
        .agg(F.sum("count").alias("count"))
    )
    if specials:
        # reserved names: a corpus token spelled exactly like a special
        # (web text routinely contains literal '<unk>') must not mint a
        # SECOND row with that name — it is excluded here, so encoding
        # resolves such occurrences to the special's id, deterministic
        tok_counts = tok_counts.filter(
            ~F.col("token").isin(list(specials))
        )
    w = Window.orderBy(F.col("count").desc(), "token")
    base = tok_counts.select(
        (F.row_number().over(w) + F.lit(len(specials) - 1)).alias(
            "token_id"
        ),
        "token",
        "count",
    )
    spark = docs.sparkSession
    spec = spark.createDataFrame(
        [(i, s, 0) for i, s in enumerate(specials)],
        "token_id int, token string, count bigint",
    )
    return spec.unionByName(base)


def bpe_encode_ids(
    docs: DataFrame,
    merges: DataFrame,
    vocab: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    unk_token: str = "<unk>",
    byte_level: bool = False,
    pretokenize: str = "whitespace",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(id, token_ids, n_tokens [, keep...]): every document as its
    BPE token-id sequence, in text order — the array a training-shard
    consumer feeds a model. ``keep`` columns of ``docs`` ride the
    EXISTING wordless-document left join (round 10: the crawl
    provenance thread) — no new shuffle.

    Scale shape: the greedy encoder runs once per DISTINCT word with
    BOTH bounded tables (merge ranks, vocabulary) closed over in one
    Arrow-batched pandas UDF, so each distinct word maps straight to
    its id array; the corpus half is posexplode + word-keyed join +
    one per-document aggregate whose ordering is restored map-side
    (``array_sort`` over (position, ids) structs — no window, no
    second shuffle). Tokens absent from ``vocab`` (possible when the
    vocabulary was built on a different corpus slice) map to
    ``unk_token``'s id.
    """
    from pyspark.sql.functions import pandas_udf

    ranks = _merge_ranks(merges)
    tok_ids = {
        r["token"]: r["token_id"]
        for r in vocab.select("token", "token_id").collect()
    }
    if unk_token not in tok_ids:
        raise ValueError(
            f"vocab has no {unk_token!r} row to map unknown tokens to"
        )
    unk = tok_ids[unk_token]

    @pandas_udf("array<int>")
    def encode_ids(col: pd.Series) -> pd.Series:
        return col.map(
            lambda w: [
                tok_ids.get(t, unk)
                for t in _encode_word(w, ranks, byte_level)
            ]
        )

    toks = docs.select(
        F.col(id_col),
        F.posexplode(pretokenize_words(text_col, pretokenize)).alias(
            "pos", "word"
        ),
    )
    enc = (
        toks.select("word")
        .distinct()
        .withColumn("ids", encode_ids(F.col("word")))
    )
    agg = (
        toks.join(enc, on="word")
        .groupBy(id_col)
        .agg(
            F.expr(
                "flatten(transform("
                " array_sort(collect_list(struct(pos, ids))),"
                " x -> x.ids))"
            ).alias("token_ids")
        )
    )
    # wordless documents (empty/whitespace-only text) produce no token
    # rows — LEFT-join them back as empty sequences so "every document"
    # means every document (the curation accounting contract)
    return (
        docs.select(id_col, *keep)
        .join(agg, on=id_col, how="left")
        .withColumn(
            "token_ids",
            F.coalesce(
                "token_ids", F.expr("cast(array() as array<int>)")
            ),
        )
        .withColumn("n_tokens", F.size("token_ids"))
    )


def _table_fingerprint(df: DataFrame, *cols: str) -> str:
    """Cheap order-insensitive content fingerprint of an artifact
    part — the shared scheme hosted in ``operators.training``
    (count + crc32 over the named columns), so the BPE tokenizer and
    language-model artifacts tear-check identically."""
    from haplorec_spark.operators.training import (
        _table_fingerprint as _fp,
    )

    return _fp(df, *cols)


def save_bpe_tokenizer(
    merges: DataFrame,
    vocab: DataFrame | None,
    path: str,
    *,
    byte_level: bool = False,
    pretokenize: str = "whitespace",
) -> None:
    """Persist a trained tokenizer: ``<path>/merges`` (+ optional
    ``<path>/vocab``) and a one-row ``<path>/meta`` carrying
    ``byte_level`` AND ``pretokenize`` — the flags train and encode
    MUST agree on, which is exactly why they live in the artifact
    instead of in every caller's head. Writes use the temp-sibling + rename scheme of
    ``training.save_text_model`` so re-saving over an existing
    artifact can never destroy it mid-write, and meta — written LAST —
    carries a content fingerprint of each data part that
    :func:`load_bpe_tokenizer` validates: the parts are individually
    atomic but not jointly, so a crash between swaps must be DETECTED
    at load (new merges under a stale meta would silently flip
    ``byte_level`` semantics) rather than trusted. The loaded artifact
    drops into every encode face (``bpe_encode_words`` /
    ``bpe_tokenize`` / ``bpe_encode_ids``), batch or streaming."""
    from haplorec_spark.operators.training import safe_overwrite_parquet

    if pretokenize not in PRETOKENIZE_MODES:
        raise ValueError(
            f"unknown pretokenize mode {pretokenize!r}; "
            f"expected one of {PRETOKENIZE_MODES}"
        )
    spark = merges.sparkSession
    merges = merges.localCheckpoint(eager=True)
    safe_overwrite_parquet(merges, f"{path}/merges")
    vocab_fp = None
    if vocab is not None:
        vocab = vocab.localCheckpoint(eager=True)
        safe_overwrite_parquet(vocab, f"{path}/vocab")
        vocab_fp = _table_fingerprint(vocab, "token_id", "token")
    safe_overwrite_parquet(
        spark.createDataFrame(
            [
                (
                    bool(byte_level),
                    str(pretokenize),
                    vocab is not None,
                    _table_fingerprint(
                        merges, "merge_rank", "left", "right"
                    ),
                    vocab_fp,
                )
            ],
            "byte_level boolean, pretokenize string, "
            "has_vocab boolean, "
            "merges_fingerprint string, vocab_fingerprint string",
        ),
        f"{path}/meta",
    )


def load_bpe_tokenizer(
    spark, path: str
) -> tuple[DataFrame, DataFrame | None, bool, str]:
    """(merges, vocab-or-None, byte_level, pretokenize) from a
    :func:`save_bpe_tokenizer` artifact, validating meta's content
    fingerprints against the parts actually on disk — a torn save
    (crash between part swaps) raises ``IOError`` instead of pairing
    new merges with a stale ``byte_level`` flag. Artifacts from
    before the fingerprint field load as-is (nothing to validate
    against); artifacts from before the ``pretokenize`` field load
    as ``"whitespace"`` — the only word definition that existed when
    they were trained."""
    meta = spark.read.parquet(f"{path}/meta").first()
    merges = spark.read.parquet(f"{path}/merges")
    want = (
        meta["merges_fingerprint"]
        if "merges_fingerprint" in meta.__fields__
        else None
    )
    if want is not None:
        got = _table_fingerprint(merges, "merge_rank", "left", "right")
        if got != want:
            raise IOError(
                f"tokenizer at {path} is torn: merges fingerprint "
                f"{got} != meta's {want} (re-save the artifact)"
            )
    vocab = None
    if meta["has_vocab"]:
        vocab = spark.read.parquet(f"{path}/vocab")
        want_v = (
            meta["vocab_fingerprint"]
            if "vocab_fingerprint" in meta.__fields__
            else None
        )
        if want_v is not None:
            got_v = _table_fingerprint(vocab, "token_id", "token")
            if got_v != want_v:
                raise IOError(
                    f"tokenizer at {path} is torn: vocab fingerprint "
                    f"{got_v} != meta's {want_v} (re-save the artifact)"
                )
    pretokenize = (
        str(meta["pretokenize"])
        if "pretokenize" in meta.__fields__
        else "whitespace"
    )
    return merges, vocab, bool(meta["byte_level"]), pretokenize


def bpe_tokenize(
    docs: DataFrame,
    merges: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    byte_level: bool = False,
    pretokenize: str = "whitespace",
) -> DataFrame:
    """(id, n_words, n_bpe_tokens): per-document BPE token accounting
    — the fertility measurement (BPE tokens per word) that sizes a
    training run's token budget under a candidate vocabulary.

    Scale shape: the Python encoder runs once per DISTINCT word
    (vocabulary-sized), never per occurrence; the corpus-sized half is
    an explode + word-keyed join + per-doc sum, all JVM-side. The
    word-keyed join shuffles both sides on ``word`` — the encoded
    vocabulary is NOT force-broadcast (a web-scale distinct-word table
    is unbounded; AQE may still choose broadcast when it measures
    small, which is the adaptive pattern this repo uses for hot sets).
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(pretokenize_words(text_col, pretokenize)).alias("word"),
    )
    encoded = bpe_encode_words(
        toks, merges, byte_level=byte_level
    ).select("word", "n_bpe_tokens")
    return (
        toks.join(encoded, on="word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_bpe_tokens").alias("n_bpe_tokens"),
        )
    )


def bpe_token_length_histogram(
    docs: DataFrame,
    merges: DataFrame,
    *,
    text_col: str = "text",
    byte_level: bool = False,
    word_counts: DataFrame | None = None,
    pretokenize: str = "whitespace",
) -> DataFrame:
    """(column='token_len', value, n_rows): the corpus's BPE
    token-LENGTH distribution under a trained merge table, in the
    ``profiling.frequent_values`` histogram shape so
    ``profiling.value_histogram_psi`` scores two corpora (or a pinned
    baseline vs a new drop) directly.

    Token length is the operational fingerprint of tokenizer fit: a
    corpus the tokenizer was trained for encodes into long learned
    tokens; a shifted corpus (new language, new jargon, markup blow-up)
    falls back to short fragments — the distribution moves before any
    downstream metric does. One distinct-word encode (the bounded
    pandas UDF) weighted by word counts, one length-keyed aggregate —
    never a corpus-sized Python path. ``word_counts`` reuses a
    precomputed :func:`bpe_word_counts` frame (callers that also need
    the totals — the streaming fertility monitor — pay the corpus
    shuffle once, not twice).
    """
    counts = (
        word_counts
        if word_counts is not None
        else bpe_word_counts(
            docs, text_col=text_col, pretokenize=pretokenize
        )
    )
    enc = bpe_encode_words(
        counts.select("word"), merges, byte_level=byte_level
    )
    return (
        counts.join(enc, on="word")
        .select(F.explode("bpe_tokens").alias("t"), "count")
        .groupBy(F.length("t").alias("len"))
        .agg(F.sum("count").alias("n_rows"))
        .select(
            F.lit("token_len").alias("column"),
            F.col("len").cast("string").alias("value"),
            "n_rows",
        )
    )
