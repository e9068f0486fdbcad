"""Unigram-LM tokenizer vs an independent pure-Python replica.

The replica re-implements the documented hard-EM spec from scratch
(dict word counts, substring seeding, Viterbi with the
longest-final-piece tie rule, count-ranked pruning with the single-char
floor) — it shares no code with the operator beyond the spec, so a
bit-identical piece table means both read the spec the same way.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from haplorec_spark.operators.unigram import (
    train_unigram,
    unigram_encode_ids,
    unigram_encode_words,
    unigram_seed_counts,
    unigram_tokenize,
    unigram_vocab,
)
from tests.conftest import rows

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the bat sat on the cat"),
    (2, "lower lowest newer newest"),
    (3, "low lower lowest new newer newest"),
    (4, "wider wide widest the the the"),
    (5, "banana bandana cabana"),
    (6, ""),
    (7, "  spaced   out  "),
]


# --------------------------------------------------------------- replica


def _ref_word_counts(texts):
    c = Counter()
    for t in texts:
        for w in t.lower().split(" "):
            if w:
                c[w] += 1
    return dict(c)


def _ref_seeds(wc, max_len):
    c = Counter()
    for w, n in wc.items():
        for i in range(len(w)):
            # clip to the remaining chars: each occurrence counts once
            for ln in range(1, min(max_len, len(w) - i) + 1):
                c[w[i : i + ln]] += n
    return dict(c)


def _ref_viterbi(word, logp, max_len):
    n = len(word)
    best = [0.0] + [-math.inf] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for ln in range(1, min(max_len, i) + 1):
            p = logp.get(word[i - ln : i])
            if p is None:
                continue
            cand = best[i - ln] + p
            if cand > best[i] or (cand == best[i] and ln > back[i]):
                best[i] = cand
                back[i] = ln
    if best[n] == -math.inf:
        return None
    out, i = [], n
    while i > 0:
        out.append(word[i - back[i] : i])
        i -= back[i]
    return out[::-1]


def _ref_logp(counts):
    total = sum(counts.values())
    lt = math.log(total)
    return {p: math.log(c) - lt for p, c in counts.items() if c > 0}


def _ref_em_round(wc, counts, max_len):
    logp = _ref_logp(counts)
    new = Counter()
    for w, n in wc.items():
        for p in _ref_viterbi(w, logp, max_len):
            new[p] += n
    out = {}
    for p in counts:
        c = new.get(p, 0)
        out[p] = max(c, 1) if len(p) == 1 else c
    return out


def _ref_train(texts, vocab_size, *, max_len=8, seed_size=None,
               shrink=0.75, em_iters=2):
    wc = _ref_word_counts(texts)
    if seed_size is None:
        seed_size = 8 * vocab_size
    seeds = _ref_seeds(wc, max_len)
    singles = {p: c for p, c in seeds.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in seeds.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(seed_size - len(singles), 0)]
    counts = dict(singles, **dict(multi))
    target_multi = vocab_size - len(singles)
    while True:
        for _ in range(em_iters):
            counts = _ref_em_round(wc, counts, max_len)
        multis = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )
        if len(multis) <= target_multi:
            break
        keep = max(int(len(multis) * shrink), target_multi)
        counts = {p: c for p, c in counts.items() if len(p) == 1}
        counts.update(dict(multis[:keep]))
    counts = _ref_em_round(wc, counts, max_len)
    total = sum(counts.values())
    lt = math.log(total)
    return {
        p: (c, round(math.log(c) - lt, 12))
        for p, c in counts.items()
        if c > 0
    }


# ----------------------------------------------------------------- tests


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def test_seed_counts_match_replica(spark, docs):
    from haplorec_spark.operators.bpe import bpe_word_counts

    got = rows(unigram_seed_counts(bpe_word_counts(docs), max_piece_len=4))
    want = sorted(
        _ref_seeds(_ref_word_counts([t for _, t in DOCS]), 4).items()
    )
    assert got == [tuple(kv) for kv in want]


def test_trained_pieces_match_replica(spark, docs):
    pieces = train_unigram(docs, 40, max_piece_len=6)
    got = sorted(
        (r["piece"], r["count"], r["logp"]) for r in pieces.collect()
    )
    want = sorted(
        (p, c, lp)
        for p, (c, lp) in _ref_train(
            [t for _, t in DOCS], 40, max_len=6
        ).items()
    )
    assert got == want
    assert len(got) <= 40
    # the alphabet is closed: every training character survives
    alphabet = {c for _, t in DOCS for w in t.split() for c in w}
    assert alphabet <= {p for p, _, _ in got}


def test_encode_words_match_replica_and_round_trip(spark, docs):
    from haplorec_spark.operators.bpe import bpe_word_counts

    pieces = train_unigram(docs, 40, max_piece_len=6)
    logp = {r["piece"]: r["logp"] for r in pieces.collect()}
    words = bpe_word_counts(docs).select("word")
    got = {
        r["word"]: list(r["pieces"])
        for r in unigram_encode_words(
            words, pieces, max_piece_len=6
        ).collect()
    }
    for w in _ref_word_counts([t for _, t in DOCS]):
        want = _ref_viterbi(w, logp, 6)
        assert got[w] == want, w
        assert "".join(got[w]) == w  # piece round trip


def test_out_of_alphabet_word_encodes_to_unk(spark, docs):
    pieces = train_unigram(docs, 40, max_piece_len=6)
    vocab = unigram_vocab(pieces)
    probe = spark.createDataFrame(
        [(100, "the zebra!? cat")], "doc_id long, text string"
    )
    tok_ids = {
        r["token"]: r["token_id"] for r in vocab.collect()
    }
    (out,) = unigram_encode_ids(
        probe, pieces, vocab, max_piece_len=6
    ).collect()
    ids = list(out["token_ids"])
    # 'zebra!?' contains chars outside the training alphabet -> one <unk>
    assert tok_ids["<unk>"] in ids
    # 'the' and 'cat' still encode to real pieces
    assert len(ids) >= 3


def test_encode_ids_order_and_empty_docs(spark, docs):
    pieces = train_unigram(docs, 40, max_piece_len=6)
    vocab = unigram_vocab(pieces)
    out = {
        r["doc_id"]: (list(r["token_ids"]), r["n_tokens"])
        for r in unigram_encode_ids(
            docs, pieces, vocab, max_piece_len=6
        ).collect()
    }
    assert out[6] == ([], 0)  # empty doc -> empty sequence
    # decode doc 0 back through the vocab: piece concatenation in
    # text order restores the whitespace-normalized document
    tok_of = {r["token_id"]: r["token"] for r in vocab.collect()}
    ids, _ = out[0]
    assert "".join(tok_of[i] for i in ids) == "thecatsatonthemat"


def test_tokenize_counts_and_fertility(spark, docs):
    pieces = train_unigram(docs, 40, max_piece_len=6)
    got = {
        r["doc_id"]: (r["n_words"], r["n_pieces"])
        for r in unigram_tokenize(docs, pieces, max_piece_len=6).collect()
    }
    logp = {r["piece"]: r["logp"] for r in pieces.collect()}
    for d, t in DOCS:
        ws = [w for w in t.lower().split(" ") if w]
        if not ws:
            assert d not in got
            continue
        want = sum(len(_ref_viterbi(w, logp, 6)) for w in ws)
        assert got[d] == (len(ws), want), d


def test_save_load_round_trip_and_torn_artifact(spark, docs, tmp_path):
    from haplorec_spark.operators.training import safe_overwrite_parquet
    from haplorec_spark.operators.unigram import (
        load_unigram_tokenizer,
        save_unigram_tokenizer,
    )

    pieces = train_unigram(docs, 40, max_piece_len=6, pretokenize="whitespace")
    vocab = unigram_vocab(pieces)
    path = str(tmp_path / "uni")
    save_unigram_tokenizer(
        pieces, vocab, path, max_piece_len=6, pretokenize="whitespace",
        em="soft",
    )
    p2, v2, ml, ptk, em = load_unigram_tokenizer(spark, path)
    assert (ml, ptk, em) == (6, "whitespace", "soft") and v2 is not None
    assert sorted(tuple(r) for r in p2.collect()) == sorted(
        tuple(r) for r in pieces.collect()
    )
    # torn: new pieces under the old meta must raise at load
    half = pieces.filter(F.length("piece") == 1).localCheckpoint(
        eager=True
    )
    safe_overwrite_parquet(half, f"{path}/pieces")
    with pytest.raises(IOError, match="torn"):
        load_unigram_tokenizer(spark, path)


def test_gpt2_pretokenize_flows_through(spark):
    """The shared word definition: unigram training and encoding under
    pretokenize='gpt2' agree with the replica run on the gpt2
    pretokens — punctuation splits off, leading spaces owned."""
    texts = ["It's low, lower!", "The low cat; the lower mat."]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    from haplorec_spark.operators.bpe import bpe_word_counts

    pieces = train_unigram(
        df, 60, max_piece_len=4, pretokenize="gpt2"
    )
    wc = {
        r["word"]: r["count"]
        for r in bpe_word_counts(df, pretokenize="gpt2").collect()
    }
    # replica on the ENGINE's word counts (the pretokenizer itself is
    # pinned against its own replica in test_bpe.py)
    seeds = Counter()
    for w, n in wc.items():
        for i in range(len(w)):
            for ln in range(1, min(4, len(w) - i) + 1):
                seeds[w[i : i + ln]] += n
    got_seeds = {
        (r["piece"], r["count"])
        for r in unigram_seed_counts(
            spark.createDataFrame(
                list(wc.items()), "word string, count bigint"
            ),
            max_piece_len=4,
        ).collect()
    }
    assert got_seeds == set(seeds.items())
    # pieces carry case and leading spaces (gpt2 fidelity)
    ps = {r["piece"] for r in pieces.collect()}
    assert " " in ps or any(p.startswith(" ") for p in ps)
    assert any(p != p.lower() for p in ps)  # case preserved


def test_train_unigram_validation(spark, docs):
    with pytest.raises(ValueError, match="vocab_size"):
        train_unigram(docs, 0)
    with pytest.raises(ValueError, match="shrink"):
        train_unigram(docs, 30, shrink=1.0)
    with pytest.raises(ValueError, match="pretokenize"):
        train_unigram(docs, 30, pretokenize="nope")
    with pytest.raises(ValueError, match="alphabet"):
        train_unigram(docs, 3)  # alphabet alone exceeds the target


def test_empty_corpus_fails_with_clear_error(spark):
    """Review-caught: a wordless corpus previously crashed with
    'math domain error' (log(0)) deep in the EM loop."""
    empty = spark.createDataFrame(
        [(0, ""), (1, "   ")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="no words"):
        train_unigram(empty, 40)


# ------------------------------------------------------- soft-EM variant


def _ref_lae(a, b):
    if a == -math.inf:
        return b
    if b == -math.inf:
        return a
    if a < b:
        a, b = b, a
    return a + math.log1p(math.exp(b - a))


def _ref_expected(word, logp, max_len, scale=1_000_000):
    """LOG-SPACE forward-backward expected piece counts, fixed-point
    rounded — the spec of unigram.SOFT_COUNT_SCALE re-read from the
    docstring (log space so a 200+-char word — a whitespace-tokenized
    CJK document — doesn't underflow to out-of-alphabet)."""
    n = len(word)
    a = [0.0] + [-math.inf] * n
    for i in range(1, n + 1):
        s = -math.inf
        for ln in range(1, min(max_len, i) + 1):
            lp = logp.get(word[i - ln : i])
            if lp is not None:
                s = _ref_lae(s, a[i - ln] + lp)
        a[i] = s
    if a[n] == -math.inf:
        return None
    b = [-math.inf] * n + [0.0]
    for i in range(n - 1, -1, -1):
        s = -math.inf
        for ln in range(1, min(max_len, n - i) + 1):
            lp = logp.get(word[i : i + ln])
            if lp is not None:
                s = _ref_lae(s, lp + b[i + ln])
        b[i] = s
    acc = {}
    for i in range(n):
        for ln in range(1, min(max_len, n - i) + 1):
            p = word[i : i + ln]
            lp = logp.get(p)
            if lp is not None:
                le = a[i] + lp + b[i + ln] - a[n]
                acc[p] = acc.get(p, 0.0) + math.exp(le)
    out = {p: int(round(e * scale)) for p, e in acc.items()}
    return {p: c for p, c in out.items() if c > 0}


def _ref_soft_em_round(wc, counts, max_len):
    logp = _ref_logp(counts)
    new = Counter()
    for w, n in wc.items():
        ec = _ref_expected(w, logp, max_len)
        if ec is None:
            continue
        for p, c in ec.items():
            new[p] += c * n
    out = {}
    for p in counts:
        c = new.get(p, 0)
        out[p] = max(c, 1) if len(p) == 1 else c
    return out


def _ref_train_soft(texts, vocab_size, *, max_len=8, seed_size=None,
                    shrink=0.75, em_iters=2):
    wc = _ref_word_counts(texts)
    if seed_size is None:
        seed_size = 8 * vocab_size
    seeds = _ref_seeds(wc, max_len)
    singles = {p: c for p, c in seeds.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in seeds.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(seed_size - len(singles), 0)]
    counts = dict(singles, **dict(multi))
    target_multi = vocab_size - len(singles)
    while True:
        for _ in range(em_iters):
            counts = _ref_soft_em_round(wc, counts, max_len)
        multis = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )
        if len(multis) <= target_multi:
            break
        keep = max(int(len(multis) * shrink), target_multi)
        counts = {p: c for p, c in counts.items() if len(p) == 1}
        counts.update(dict(multis[:keep]))
    counts = _ref_soft_em_round(wc, counts, max_len)
    total = sum(counts.values())
    lt = math.log(total)
    return {
        p: (c, round(math.log(c) - lt, 12))
        for p, c in counts.items()
        if c > 0
    }


def test_soft_em_pieces_match_replica(spark, docs):
    pieces = train_unigram(docs, 40, max_piece_len=6, em="soft")
    got = sorted(
        (r["piece"], r["count"], r["logp"]) for r in pieces.collect()
    )
    want = sorted(
        (p, c, lp)
        for p, (c, lp) in _ref_train_soft(
            [t for _, t in DOCS], 40, max_len=6
        ).items()
    )
    assert got == want
    # the alphabet is still closed
    alphabet = {c for _, t in DOCS for w in t.split() for c in w}
    assert alphabet <= {p for p, _, _ in got}


def test_soft_em_differs_from_hard_and_still_encodes(spark, docs):
    """Non-vacuity: the soft E-step actually changes the learned
    probabilities (expected counts spread mass over every
    segmentation, Viterbi concentrates it), and the resulting table
    encodes with exact round trips either way."""
    hard = train_unigram(docs, 40, max_piece_len=6, em="hard")
    soft = train_unigram(docs, 40, max_piece_len=6, em="soft")
    h = {r["piece"]: r["logp"] for r in hard.collect()}
    s = {r["piece"]: r["logp"] for r in soft.collect()}
    assert h != s
    from haplorec_spark.operators.bpe import bpe_word_counts

    words = bpe_word_counts(docs).select("word")
    for pieces in (hard, soft):
        enc = unigram_encode_words(words, pieces, max_piece_len=6)
        for r in enc.collect():
            assert "".join(r["pieces"]) == r["word"]


def test_unigram_rejects_bad_em(spark, docs):
    with pytest.raises(ValueError, match="em mode"):
        train_unigram(docs, 40, em="fuzzy")


def test_soft_em_survives_giant_single_word(spark):
    """Review-caught (round 9): linear-space forward-backward
    underflowed at ~150+ chars, silently dropping the word from soft
    training as if out-of-alphabet — and a space-free-script document
    under whitespace pretokenization is exactly one such giant word.
    Log space must train on it and encode it losslessly."""
    giant = "ab" * 200  # one 400-char word
    docs = spark.createDataFrame(
        [(0, giant), (1, "ab abab ababab")], "doc_id long, text string"
    )
    pieces = train_unigram(docs, 10, max_piece_len=4, em="soft")
    got = {r["piece"]: r["count"] for r in pieces.collect()}
    # the giant word's mass reached the counts: 'ab'-family pieces
    # carry far more than doc 1 alone could give them
    assert got.get("ab", 0) > 0
    assert sum(got.values()) > 100 * 1_000_000  # >> doc 1's mass
    enc = unigram_encode_words(
        spark.createDataFrame([(giant,)], "word string"),
        pieces,
        max_piece_len=4,
    ).collect()
    assert "".join(enc[0]["pieces"]) == giant
    # replica agreement on the giant word itself
    logp = {r["piece"]: r["logp"] for r in pieces.collect()}
    assert _ref_expected(giant, logp, 4) is not None

