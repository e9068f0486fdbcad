"""Unigram-LM (SentencePiece-family) tokenizer training and encoding.

The second trainable tokenizer family next to BPE (``operators.bpe``):
instead of learning merge RULES bottom-up, the unigram model (Kudo
2018, "Subword Regularization"; the ``unigram`` mode of the public
SentencePiece package) starts from a LARGE candidate piece vocabulary
and prunes it top-down, keeping the pieces a unigram language model
over segmentations finds most useful. Encoding segments each word into
the maximum-likelihood piece sequence (Viterbi).

The trainer offers both E-steps (``em=`` on :func:`train_unigram`;
round 9 added "soft"), with documented divergences from Kudo's
reference either way:

* ``em="hard"`` (default) uses VITERBI (best-path) piece counts —
  the standard simplification, bit-reproducible against the
  pure-Python replica in ``tests/test_unigram.py`` on any platform
  (integer counts end to end);
* ``em="soft"`` uses forward-backward EXPECTED counts — Kudo's
  actual E-step. Expected counts are floats; determinism is restored
  by FIXED-POINT rounding per (word, piece) BEFORE the corpus
  aggregate (scaled to :data:`SOFT_COUNT_SCALE` integer units), so
  the shuffle sums exact integers in any order. The replica pins the
  result bit-identically on the same platform (``exp``/``log`` are
  libm calls, the one platform-dependence the hard variant avoids);
* pruning ranks prunable pieces by their (hard or expected) count
  under the current model (a proxy for Kudo's exact
  likelihood-loss ranking): a piece the segmentations never use
  contributes nothing and is dropped first. Single-character pieces
  are never pruned, so the alphabet stays closed and every
  training-alphabet word remains segmentable.
* the ENCODE face is Viterbi in both variants (identical to
  SentencePiece's default ``nbest_size=1`` decoding), so a hard- and
  a soft-trained tokenizer differ only through their piece tables.

Determinism contract (everything the replica pins):

* probabilities are ``log(count) - log(total)`` over INTEGER counts —
  no float accumulation order to drift between engines;
* Viterbi ties break toward the LONGEST final piece (then unique by
  string equality);
* pruning ties break by (count asc, piece desc) on the drop side —
  i.e. keep the lexicographically-smaller piece at equal count;
* the final vocabulary is cut to exactly ``vocab_size`` by
  (count desc, piece asc), singles always kept.

Scale shape (the ``bpe.py`` charter):

* ONE corpus scan builds the word-frequency table
  (:func:`~haplorec_spark.operators.bpe.bpe_word_counts`, shared —
  including its ``pretokenize`` modes); everything after is
  DISTINCT-WORD-sized.
* Seeding is a pure SQL substring explode over the distinct-word
  table (corpus-sized work never enters Python).
* Each EM round is: one bounded collect of the piece table
  (vocabulary-sized, like the BPE merge ranks), one Arrow-batched
  pandas-UDF Viterbi pass over DISTINCT words, one piece-keyed
  aggregate. No iteration ever touches the corpus again.

Reference lineage: the reference repo has no tokenizer at all; this
is the forward-looking training-data face, paired with
``operators.bpe`` (SURVEY §2.9's documented pandas-UDF case for the
genuinely procedural per-word kernel).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from haplorec_spark.operators.bpe import (
    PRETOKENIZE_MODES,
    bpe_word_counts,
    pretokenize_words,
)

__all__ = [
    "train_unigram",
    "unigram_seed_counts",
    "unigram_encode_words",
    "unigram_tokenize",
    "unigram_vocab",
    "unigram_encode_ids",
    "save_unigram_tokenizer",
    "load_unigram_tokenizer",
]


def unigram_seed_counts(
    counts: DataFrame, *, max_piece_len: int = 8
) -> DataFrame:
    """(piece, count): every substring of length 1..``max_piece_len``
    of every distinct word, weighted by word frequency — the candidate
    vocabulary the unigram trainer prunes down.

    Pure SQL over the distinct-word table: a position × length
    substring explode (words are short — ``max_word_chars``-bounded
    upstream — so the per-word array is O(len · max_piece_len)), then
    one piece-keyed aggregate. Counts are exact integers (occurrences
    × word count), the determinism anchor for the whole trainer.
    """
    pieces = (
        f"flatten(transform(sequence(1, length(word)),"
        f" i -> transform("
        f" sequence(1, least({int(max_piece_len)}, length(word) - i + 1)),"
        f" n -> substring(word, i, n))))"
    )
    return (
        counts.select(
            F.explode(F.expr(pieces)).alias("piece"), "count"
        )
        # the inner length loop is clipped to the remaining characters
        # (least(L, len - i + 1)) so each substring occurrence is
        # emitted EXACTLY once — an unclipped loop would re-emit every
        # word-final piece once per excess length (substring() clips
        # silently), inflating suffix counts by up to L-1x
        .groupBy("piece")
        .agg(F.sum("count").alias("count"))
    )


def _viterbi(word: str, logp: dict[str, float], max_len: int):
    """Best-path segmentation of ``word`` under piece log-probs —
    ties toward the LONGEST final piece. Returns None when some
    character has no piece (out-of-alphabet word)."""
    n = len(word)
    best: list[float] = [0.0] + [-math.inf] * n
    back: list[int] = [0] * (n + 1)
    for i in range(1, n + 1):
        for ln in range(1, min(max_len, i) + 1):
            p = logp.get(word[i - ln : i])
            if p is None:
                continue
            cand = best[i - ln] + p
            # strictly-better, or equal-and-longer (ties toward the
            # longest final piece — the documented determinism rule)
            if cand > best[i] or (cand == best[i] and ln > back[i]):
                best[i] = cand
                back[i] = ln
    if best[n] == -math.inf:
        return None
    out: list[str] = []
    i = n
    while i > 0:
        ln = back[i]
        out.append(word[i - ln : i])
        i -= ln
    out.reverse()
    return out


#: Fixed-point scale for soft-EM expected counts: one expected use of
#: a piece = 1e6 integer units. Rounding happens per (word, piece)
#: BEFORE the corpus aggregate, so Spark's shuffle sums exact
#: integers — associative in any order — instead of floats whose
#: accumulation order would make the trainer non-deterministic.
#: Headroom contract: a piece's summed count is bounded by total word
#: occurrences × scale, so int64 overflows past ~9e12 occurrences of
#: one piece — far beyond any sane tokenizer-training corpus (the
#: standard practice, SentencePiece included, is to train on a
#: bounded sample of the corpus, not 10T raw tokens); training on
#: more than that needs ``em="hard"`` (unscaled, 1e6× more headroom)
#: or a sampled input.
SOFT_COUNT_SCALE = 1_000_000


def _logaddexp(a: float, b: float) -> float:
    """log(e^a + e^b) without overflow/underflow; -inf absorbing."""
    if a == -math.inf:
        return b
    if b == -math.inf:
        return a
    if a < b:
        a, b = b, a
    return a + math.log1p(math.exp(b - a))


def _expected_counts(
    word: str, logp: dict[str, float], max_len: int
) -> dict[str, int] | None:
    """Forward-backward expected piece counts for one word under the
    current model, fixed-point rounded to :data:`SOFT_COUNT_SCALE`
    units (Kudo 2018's E-step). Runs entirely in LOG space
    (review-caught, round 9): linear-space alpha underflows to 0 at
    ~150+ characters — and a space-free-script document under
    ``pretokenize="whitespace"`` is exactly one such giant "word" —
    which would silently drop the word from training as if it were
    out-of-alphabet. Position loops run in ascending order (a fixed
    accumulation order, part of the determinism contract). Returns
    None for an out-of-alphabet word, mirroring :func:`_viterbi`;
    pieces rounding to zero are dropped (they carry no count, like a
    piece Viterbi never picks)."""
    n = len(word)
    la = [-math.inf] * (n + 1)
    la[0] = 0.0
    for i in range(1, n + 1):
        s = -math.inf
        for ln in range(1, min(max_len, i) + 1):
            lp = logp.get(word[i - ln : i])
            if lp is not None:
                s = _logaddexp(s, la[i - ln] + lp)
        la[i] = s
    if la[n] == -math.inf:
        return None
    lb = [-math.inf] * (n + 1)
    lb[n] = 0.0
    for i in range(n - 1, -1, -1):
        s = -math.inf
        for ln in range(1, min(max_len, n - i) + 1):
            lp = logp.get(word[i : i + ln])
            if lp is not None:
                s = _logaddexp(s, lp + lb[i + ln])
        lb[i] = s
    out: dict[str, float] = {}
    for i in range(n):
        for ln in range(1, min(max_len, n - i) + 1):
            p = word[i : i + ln]
            lp = logp.get(p)
            if lp is not None:
                le = la[i] + lp + lb[i + ln] - la[n]
                if le > -math.inf:
                    out[p] = out.get(p, 0.0) + math.exp(le)
    scaled = {
        p: int(round(e * SOFT_COUNT_SCALE)) for p, e in out.items()
    }
    return {p: c for p, c in scaled.items() if c > 0}


def _soft_counts_udf(logp: dict[str, float], max_len: int):
    """Arrow-batched per-distinct-word expected-count extraction —
    the soft-EM twin of :func:`_viterbi_udf`. Emits the word's
    (piece, fixed-point count) pairs; the caller multiplies by the
    word's corpus count and aggregates integers."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<struct<piece: string, c: long>>")
    def soft(col: pd.Series) -> pd.Series:
        def one(w):
            ec = _expected_counts(w, logp, max_len)
            if ec is None:
                return None
            return [(p, c) for p, c in sorted(ec.items())]

        return col.map(one)

    return soft


def _viterbi_udf(logp: dict[str, float], max_len: int):
    """Arrow-batched per-distinct-word Viterbi segmentation (the
    bounded pandas-UDF shape of ``bpe_encode_words``); the piece
    table rides in the closure, vocabulary-sized."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def seg(col: pd.Series) -> pd.Series:
        return col.map(lambda w: _viterbi(w, logp, max_len))

    return seg


def _collect_logp(pieces: DataFrame) -> dict[str, float]:
    """piece -> log(count) - log(total): the bounded collect each EM
    round pays (vocabulary-sized, like the BPE merge-rank dict).
    Integer counts make the result bit-identical to the replica."""
    rows = pieces.select("piece", "count").collect()
    total = sum(int(r["count"]) for r in rows)
    lt = math.log(total)
    # a zero-count piece (an earlier EM round's best paths never used
    # it) has no probability: it gets NO entry, so Viterbi cannot pick
    # it — identical to the replica's c > 0 filter. It stays in the
    # frame at 0 and is first out at the next prune.
    return {
        r["piece"]: math.log(int(r["count"])) - lt
        for r in rows
        if int(r["count"]) > 0
    }


def train_unigram(
    docs: DataFrame,
    vocab_size: int,
    *,
    text_col: str = "text",
    max_piece_len: int = 8,
    seed_size: int | None = None,
    shrink: float = 0.75,
    em_iters: int = 2,
    min_word_count: int = 1,
    max_word_chars: int | None = None,
    pretokenize: str = "whitespace",
    em: str = "hard",
) -> DataFrame:
    """(piece, count, logp): the trained unigram piece table — all
    single characters of the training alphabet plus the
    highest-count multi-character pieces, at most ``vocab_size`` rows
    (a multi-char straggler whose final-pass count is zero carries no
    probability and is dropped, so the table can come in slightly
    under target — exactly like SentencePiece's final prune).

    The loop: seed ``seed_size`` candidates from substring counts
    (default 8× the target), then alternate ``em_iters`` EM rounds
    (segment/score every DISTINCT word under the current model →
    integer piece counts → re-normalize) with a pruning round that
    keeps the top ``shrink`` fraction of prunable pieces by count,
    until the target size is reached; one final EM pass rescores the
    surviving vocabulary. ``pretokenize`` picks the word definition
    (shared with BPE — the artifact carries it).

    ``em`` picks the E-step (module docstring): ``"hard"`` = Viterbi
    best-path counts (integers end to end, fully portable);
    ``"soft"`` = forward-backward expected counts (Kudo's E-step),
    fixed-point rounded per (word, piece) so the corpus aggregate
    sums exact integers — ``count`` is then in
    :data:`SOFT_COUNT_SCALE` units (one expected use = 1e6), which
    cancels in the normalization.

    ``logp`` is ``log(count) - log(total)`` of the FINAL EM pass —
    what :func:`unigram_encode_words` segments with.
    """
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    if not 0.0 < shrink < 1.0:
        raise ValueError(f"shrink must be in (0, 1), got {shrink}")
    if em_iters < 1:
        raise ValueError(f"em_iters must be >= 1, got {em_iters}")
    if em not in ("hard", "soft"):
        raise ValueError(
            f"unknown em mode {em!r}; expected 'hard' or 'soft'"
        )
    if pretokenize not in PRETOKENIZE_MODES:
        raise ValueError(
            f"unknown pretokenize mode {pretokenize!r}; "
            f"expected one of {PRETOKENIZE_MODES}"
        )
    if seed_size is None:
        seed_size = 8 * vocab_size
    counts = bpe_word_counts(
        docs,
        text_col=text_col,
        min_count=min_word_count,
        pretokenize=pretokenize,
    )
    if max_word_chars is not None:
        counts = counts.filter(F.length("word") <= max_word_chars)
    # pin the corpus-derived table: every EM round re-reads it
    counts = counts.localCheckpoint(eager=True)
    if not counts.head(1):
        raise ValueError(
            "training corpus has no words (empty or whitespace-only "
            "text, or everything fell below min_word_count/"
            "max_word_chars)"
        )

    # checkpoint the seed aggregate ONCE: the singles count, the
    # multi-piece cut, and the first EM round all read it
    seeds = unigram_seed_counts(
        counts, max_piece_len=max_piece_len
    ).localCheckpoint(eager=True)
    singles = seeds.filter(F.length("piece") == 1)
    n_singles = singles.count()
    if n_singles > vocab_size:
        raise ValueError(
            f"the training alphabet alone has {n_singles} characters, "
            f"above vocab_size={vocab_size} — the alphabet is never "
            "pruned, so the target is unreachable"
        )
    multi = (
        seeds.filter(F.length("piece") > 1)
        .orderBy(F.col("count").desc(), "piece")
        .limit(max(seed_size - n_singles, 0))
    )
    pieces = singles.unionByName(multi).localCheckpoint(eager=True)

    def em_round(pcs: DataFrame) -> DataFrame:
        """One EM round: (hard) Viterbi or (soft) expected counts
        under pcs — integer either way (soft is fixed-point-scaled
        BEFORE this aggregate, so the shuffle sum is exact)."""
        if em == "soft":
            soft = _soft_counts_udf(_collect_logp(pcs), max_piece_len)
            segged = counts.withColumn("pc", soft(F.col("word")))
            new = (
                segged.select(F.explode("pc").alias("x"), "count")
                .select(
                    F.col("x.piece").alias("piece"),
                    (F.col("x.c") * F.col("count")).alias("count"),
                )
                .groupBy("piece")
                .agg(F.sum("count").alias("count"))
            )
        else:
            seg = _viterbi_udf(_collect_logp(pcs), max_piece_len)
            segged = counts.withColumn("pieces", seg(F.col("word")))
            new = (
                segged.select(F.explode("pieces").alias("piece"), "count")
                .groupBy("piece")
                .agg(F.sum("count").alias("count"))
            )
        # pieces the best paths never used drop to count 0 — keep the
        # single-char alphabet alive regardless (prob floor of 1 use),
        # so no word ever becomes unsegmentable mid-training
        kept = (
            pcs.select("piece").join(new, on="piece", how="left")
            .select(
                "piece",
                F.when(
                    F.length("piece") == 1,
                    F.greatest(F.coalesce("count", F.lit(0)), F.lit(1)),
                )
                .otherwise(F.coalesce("count", F.lit(0)))
                .alias("count"),
            )
        )
        return kept.localCheckpoint(eager=True)

    current = pieces
    while True:
        for _ in range(em_iters):
            current = em_round(current)
        n_multi = current.filter(F.length("piece") > 1).count()
        target_multi = vocab_size - n_singles
        if n_multi <= target_multi:
            break
        keep_multi = max(int(n_multi * shrink), target_multi)
        pruned = (
            current.filter(F.length("piece") > 1)
            .orderBy(F.col("count").desc(), "piece")
            .limit(keep_multi)
        )
        current = (
            current.filter(F.length("piece") == 1)
            .unionByName(pruned)
            .localCheckpoint(eager=True)
        )
    # final rescore over the surviving vocabulary
    current = em_round(current)
    rows = current.collect()  # vocabulary-sized, bounded by contract
    total = sum(int(r["count"]) for r in rows)
    lt = math.log(total)
    spark = docs.sparkSession
    return spark.createDataFrame(
        [
            (
                r["piece"],
                int(r["count"]),
                round(math.log(int(r["count"])) - lt, 12)
                if int(r["count"]) > 0
                else None,
            )
            for r in rows
        ],
        "piece string, count bigint, logp double",
    ).filter(F.col("logp").isNotNull())


def unigram_encode_words(
    words: DataFrame,
    pieces: DataFrame,
    *,
    word_col: str = "word",
    max_piece_len: int = 8,
) -> DataFrame:
    """(word, pieces, n_pieces): each distinct word's Viterbi
    segmentation under the trained piece table — the unigram twin of
    ``bpe_encode_words`` (same bounded pandas-UDF shape). A word with
    an out-of-alphabet character segments to NULL (callers map it to
    ``<unk>`` — :func:`unigram_encode_ids` does)."""
    logp = {
        r["piece"]: float(r["logp"])
        for r in pieces.select("piece", "logp").collect()
    }
    seg = _viterbi_udf(logp, max_piece_len)
    return (
        words.select(F.col(word_col).alias("word"))
        .distinct()
        .withColumn("pieces", seg(F.col("word")))
        .withColumn("n_pieces", F.size("pieces"))
    )


def unigram_tokenize(
    docs: DataFrame,
    pieces: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 8,
    pretokenize: str = "whitespace",
) -> DataFrame:
    """(id, n_words, n_pieces): per-document unigram token accounting
    — fertility under a trained piece table, the ``bpe_tokenize``
    twin. Unsegmentable words (out-of-alphabet chars) count 1 piece
    (they encode to one ``<unk>``)."""
    toks = docs.select(
        F.col(id_col),
        F.explode(pretokenize_words(text_col, pretokenize)).alias("word"),
    )
    enc = unigram_encode_words(
        toks, pieces, max_piece_len=max_piece_len
    ).select(
        "word",
        F.coalesce("n_pieces", F.lit(1)).alias("n_pieces"),
    )
    return (
        toks.join(enc, on="word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_pieces").alias("n_pieces"),
        )
    )


def unigram_vocab(
    pieces: DataFrame,
    *,
    specials: tuple[str, ...] = ("<pad>", "<unk>", "<bos>", "<eos>"),
) -> DataFrame:
    """(token_id, token, count): id-assigned vocabulary — specials
    first (ids 0..len-1), then every trained piece by count desc then
    piece asc (deterministic across engines). Unlike ``bpe_vocab``
    the piece table IS the vocabulary (unigram has no merge-time vs
    corpus-time distinction), so no corpus pass is needed."""
    from pyspark.sql import Window

    base = pieces
    if specials:
        base = base.filter(~F.col("piece").isin(list(specials)))
    w = Window.orderBy(F.col("count").desc(), "piece")
    ranked = base.select(
        (F.row_number().over(w) + F.lit(len(specials) - 1)).alias(
            "token_id"
        ),
        F.col("piece").alias("token"),
        "count",
    )
    spark = pieces.sparkSession
    spec = spark.createDataFrame(
        [(i, s, 0) for i, s in enumerate(specials)],
        "token_id int, token string, count bigint",
    )
    return spec.unionByName(ranked)


def unigram_encode_ids(
    docs: DataFrame,
    pieces: DataFrame,
    vocab: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    unk_token: str = "<unk>",
    max_piece_len: int = 8,
    pretokenize: str = "whitespace",
) -> DataFrame:
    """(id, token_ids, n_tokens): every document as its unigram
    piece-id sequence in text order — the ``bpe_encode_ids`` twin,
    same physical shape (one distinct-word pandas UDF with both
    bounded tables in the closure; posexplode + word-keyed join +
    map-side ``array_sort`` reassembly; wordless documents come back
    as empty sequences). A word with an out-of-alphabet character
    encodes to one ``unk_token`` id."""
    logp = {
        r["piece"]: float(r["logp"])
        for r in pieces.select("piece", "logp").collect()
    }
    tok_ids = {
        r["token"]: r["token_id"]
        for r in vocab.select("token", "token_id").collect()
    }
    if unk_token not in tok_ids:
        raise ValueError(
            f"vocab has no {unk_token!r} row to map unknown tokens to"
        )
    unk = tok_ids[unk_token]
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def encode_ids(col: pd.Series) -> pd.Series:
        def one(w):
            seg = _viterbi(w, logp, max_piece_len)
            if seg is None:
                return [unk]
            return [tok_ids.get(p, unk) for p in seg]

        return col.map(one)

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
    return (
        docs.select(id_col)
        .join(agg, on=id_col, how="left")
        .withColumn(
            "token_ids",
            F.coalesce(
                "token_ids", F.expr("cast(array() as array<int>)")
            ),
        )
        .withColumn("n_tokens", F.size("token_ids"))
    )


def save_unigram_tokenizer(
    pieces: DataFrame,
    vocab: DataFrame | None,
    path: str,
    *,
    max_piece_len: int = 8,
    pretokenize: str = "whitespace",
    em: str = "hard",
) -> None:
    """Persist a trained unigram tokenizer: ``<path>/pieces``
    (+ optional ``<path>/vocab``) and a one-row ``<path>/meta``
    carrying ``max_piece_len`` and ``pretokenize`` — the knobs train
    and encode MUST agree on — plus the ``em`` variant the table was
    trained with (provenance: encoding is Viterbi either way, but a
    continued training run must resume with the same E-step). Same
    crash-safety contract as ``bpe.save_bpe_tokenizer``: temp-sibling
    + rename per part, meta written LAST with a content fingerprint
    of each data part (the shared ``training._table_fingerprint``
    scheme), so a torn save is DETECTED at load instead of trusted."""
    from haplorec_spark.operators.training import (
        _table_fingerprint,
        safe_overwrite_parquet,
    )

    if pretokenize not in PRETOKENIZE_MODES:
        raise ValueError(
            f"unknown pretokenize mode {pretokenize!r}; "
            f"expected one of {PRETOKENIZE_MODES}"
        )
    if em not in ("hard", "soft"):
        raise ValueError(
            f"unknown em mode {em!r}; expected 'hard' or 'soft'"
        )
    spark = pieces.sparkSession
    pieces = pieces.localCheckpoint(eager=True)
    safe_overwrite_parquet(pieces, f"{path}/pieces")
    vocab_fp = None
    if vocab is not None:
        vocab = vocab.localCheckpoint(eager=True)
        safe_overwrite_parquet(vocab, f"{path}/vocab")
        vocab_fp = _table_fingerprint(vocab, "token_id", "token")
    safe_overwrite_parquet(
        spark.createDataFrame(
            [
                (
                    int(max_piece_len),
                    str(pretokenize),
                    str(em),
                    vocab is not None,
                    _table_fingerprint(pieces, "piece", "count"),
                    vocab_fp,
                )
            ],
            "max_piece_len int, pretokenize string, em string, "
            "has_vocab boolean, "
            "pieces_fingerprint string, vocab_fingerprint string",
        ),
        f"{path}/meta",
    )


def load_unigram_tokenizer(
    spark, path: str
) -> tuple[DataFrame, DataFrame | None, int, str, str]:
    """(pieces, vocab-or-None, max_piece_len, pretokenize, em) from a
    :func:`save_unigram_tokenizer` artifact, validating meta's
    fingerprints against the parts on disk (torn save → ``IOError``,
    the ``bpe.load_bpe_tokenizer`` contract). Artifacts written
    before the ``em`` flag existed load as ``"hard"`` (what they
    were)."""
    from haplorec_spark.operators.training import _table_fingerprint

    meta = spark.read.parquet(f"{path}/meta").first()
    pieces = spark.read.parquet(f"{path}/pieces")
    got = _table_fingerprint(pieces, "piece", "count")
    if got != meta["pieces_fingerprint"]:
        raise IOError(
            f"unigram tokenizer at {path} is torn: pieces fingerprint "
            f"{got} != meta's {meta['pieces_fingerprint']} "
            "(re-save the artifact)"
        )
    vocab = None
    if meta["has_vocab"]:
        vocab = spark.read.parquet(f"{path}/vocab")
        got_v = _table_fingerprint(vocab, "token_id", "token")
        if got_v != meta["vocab_fingerprint"]:
            raise IOError(
                f"unigram tokenizer at {path} is torn: vocab "
                f"fingerprint {got_v} != meta's "
                f"{meta['vocab_fingerprint']} (re-save the artifact)"
            )
    em = (
        str(meta["em"])
        if "em" in (meta.__fields__ or [])
        else "hard"
    )
    return (
        pieces,
        vocab,
        int(meta["max_piece_len"]),
        str(meta["pretokenize"]),
        em,
    )
