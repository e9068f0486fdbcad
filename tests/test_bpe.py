"""BPE trainer/encoder vs an independent pure-Python replica.

The replica re-implements the Sennrich BPE spec from scratch (dict
word counts, tuple symbol sequences) with the same deterministic
tie-break (count desc, then (left, right) lexicographic), so the
Spark operator and the oracle share no code beyond the spec.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from haplorec_spark.operators.bpe import (
    END_OF_WORD,
    bpe_encode_words,
    bpe_tokenize,
    bpe_word_counts,
    train_bpe,
)
from tests.conftest import rows

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the bat sat on the cat"),
    (2, "lower lowest newer newest"),
    (3, "low lower lowest new newer newest"),
    (4, "wider wide widest the the the"),
    (5, "a ab abc abcd abcde"),
    (6, "aaa aaaa aa aaa aaa"),  # overlap stress: greedy (a,a) merges
    (7, ""),  # empty doc: contributes no words
    (8, "  double  spaced   words  "),  # whitespace artifacts dropped
]


# --------------------------------------------------------------- replica


def _ref_word_counts(texts):
    c = Counter()
    for t in texts:
        for w in t.lower().split(" "):
            if w:
                c[w] += 1
    return dict(c)


def _ref_merge_seq(syms, left, right):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_train(word_counts, n_merges, min_pair_count=1):
    table = {
        tuple(list(w) + [END_OF_WORD]): c for w, c in word_counts.items()
    }
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in table.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # count desc, then (left, right) lexicographic
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if cnt < min_pair_count:
            break
        merges.append((left, right, cnt))
        table = {
            _ref_merge_seq(s, left, right): c for s, c in table.items()
        }
    return merges


def _ref_encode(word, ranks):
    syms = list(word) + [END_OF_WORD]
    while True:
        best = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, syms[i], syms[i + 1])
        if best is None:
            return syms
        syms = list(_ref_merge_seq(syms, best[1], best[2]))


# ----------------------------------------------------------------- tests


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def test_word_counts_match_replica(spark, docs):
    got = rows(bpe_word_counts(docs))
    want = sorted(_ref_word_counts([t for _, t in DOCS]).items())
    assert got == [tuple(kv) for kv in want]


def test_trained_merges_match_replica(spark, docs):
    merges = train_bpe(docs, n_merges=30, checkpoint_interval=5)
    got = [
        (r["merge_rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in merges.orderBy("merge_rank").collect()
    ]
    want = [
        (i, l, r, l + r, c)
        for i, (l, r, c) in enumerate(
            _ref_train(_ref_word_counts([t for _, t in DOCS]), 30)
        )
    ]
    assert got == want


def test_min_pair_count_stops_early(spark, docs):
    merges = train_bpe(docs, n_merges=30, min_pair_count=4)
    got = [(r["left"], r["right"]) for r in merges.orderBy("merge_rank").collect()]
    want = [
        (l, r)
        for l, r, _ in _ref_train(
            _ref_word_counts([t for _, t in DOCS]), 30, min_pair_count=4
        )
    ]
    assert got == want
    assert 0 < len(got) < 30


def test_exhaustion_stops_before_n_merges(spark):
    tiny = spark.createDataFrame([(0, "a b")], "doc_id int, text string")
    merges = train_bpe(tiny, n_merges=50)
    # 'a</w>' and 'b</w>' fully merge after two rounds; nothing remains
    assert merges.count() == 2


def test_encode_words_match_replica(spark, docs):
    merges = train_bpe(docs, n_merges=20, checkpoint_interval=7)
    ranks = {
        (r["left"], r["right"]): r["merge_rank"]
        for r in merges.collect()
    }
    words = bpe_word_counts(docs).select("word")
    got = {
        r["word"]: (list(r["bpe_tokens"]), r["n_bpe_tokens"])
        for r in bpe_encode_words(words, merges).collect()
    }
    for w in _ref_word_counts([t for _, t in DOCS]):
        want = _ref_encode(w, ranks)
        assert got[w] == (want, len(want)), w


def test_encoding_reconstructs_word(spark, docs):
    # lossless: concatenating a word's BPE tokens restores word + </w>
    merges = train_bpe(docs, n_merges=15)
    words = bpe_word_counts(docs).select("word")
    bad = (
        bpe_encode_words(words, merges)
        .filter(
            F.array_join("bpe_tokens", "")
            != F.concat(F.col("word"), F.lit(END_OF_WORD))
        )
        .count()
    )
    assert bad == 0


def test_tokenize_counts_match_replica(spark, docs):
    merges = train_bpe(docs, n_merges=20)
    ranks = {
        (r["left"], r["right"]): r["merge_rank"]
        for r in merges.collect()
    }
    got = rows(bpe_tokenize(docs, merges))
    want = []
    for doc_id, text in DOCS:
        ws = [w for w in text.lower().split(" ") if w]
        if not ws:
            continue  # empty docs produce no token rows
        want.append(
            (doc_id, len(ws), sum(len(_ref_encode(w, ranks)) for w in ws))
        )
    assert got == sorted(want)


def test_zero_merges_encodes_characters(spark, docs):
    merges = train_bpe(docs, n_merges=0)
    assert merges.count() == 0
    words = spark.createDataFrame([("cat",)], "word string")
    (r,) = bpe_encode_words(words, merges).collect()
    assert list(r["bpe_tokens"]) == ["c", "a", "t", END_OF_WORD]


def test_trainer_on_parquet_corpus(spark):
    # integration: the sf0.001 documents table trains without error and
    # matches the replica end-to-end (corpus-derived word counts)
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(40)
    merges = train_bpe(docs, n_merges=12)
    texts = [r["text"] for r in docs.select("text").collect()]
    want = [
        (i, l, r, l + r, c)
        for i, (l, r, c) in enumerate(
            _ref_train(_ref_word_counts(texts), 12)
        )
    ]
    got = [
        (r["merge_rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in merges.orderBy("merge_rank").collect()
    ]
    assert got == want


def test_max_word_chars_excludes_long_words_from_training(spark):
    # one giant unbroken token must not contribute merges when capped
    docs = spark.createDataFrame(
        [(0, "cat cat cat " + "x" * 200), (1, "cat bat")],
        "doc_id int, text string",
    )
    capped = train_bpe(docs, n_merges=10, max_word_chars=16)
    got = [(r["left"], r["right"]) for r in capped.orderBy("merge_rank").collect()]
    texts = ["cat cat cat", "cat bat"]  # the long word dropped
    want = [
        (l, r)
        for l, r, _ in _ref_train(_ref_word_counts(texts), 10)
    ]
    assert got == want
    # no learned symbol contains the capped word's character
    assert all("x" not in l + r for l, r in got)


def test_batched_equals_sequential(spark, docs):
    """merge_batch / max_driver_vocab are pure scheduling knobs: all
    three rungs (driver-side incremental, distributed sequential,
    distributed batched) must learn the bit-identical table."""
    def table(batch, driver):
        return [
            tuple(r)
            for r in train_bpe(
                docs, n_merges=30, merge_batch=batch,
                checkpoint_interval=3,
                max_driver_vocab=500_000 if driver else None,
            ).orderBy("merge_rank").collect()
        ]

    sequential = table(1, driver=False)
    assert table(8, driver=False) == sequential
    assert table(64, driver=False) == sequential
    assert table(32, driver=True) == sequential


def test_batched_equals_sequential_on_parquet(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(60)
    seq = [
        tuple(r)
        for r in train_bpe(
            docs, n_merges=40, merge_batch=1, max_driver_vocab=None
        ).orderBy("merge_rank").collect()
    ]
    bat = [
        tuple(r)
        for r in train_bpe(
            docs, n_merges=40, merge_batch=16, max_driver_vocab=None
        ).orderBy("merge_rank").collect()
    ]
    drv = [
        tuple(r)
        for r in train_bpe(docs, n_merges=40)
        .orderBy("merge_rank").collect()
    ]
    assert bat == seq
    assert drv == seq


def test_merge_symbol_collision_stops_batch(spark):
    """'a'+'bc' and 'ab'+'c' can both produce symbol 'abc'; the batch
    acceptance must stay exact when merged strings collide with the
    evolving alphabet (the replica is the authority)."""
    text = " ".join(["abc"] * 8 + ["ab"] * 5 + ["bc"] * 4 + ["abcabc"] * 3)
    docs = spark.createDataFrame([(0, text)], "doc_id int, text string")
    got = [
        (r["left"], r["right"], r["pair_count"])
        for r in train_bpe(
            docs, n_merges=12, merge_batch=12, max_driver_vocab=None
        ).orderBy("merge_rank").collect()
    ]
    want = _ref_train(_ref_word_counts([text]), 12)
    assert got == want


def test_checkpoint_interval_validated(spark, docs):
    with pytest.raises(ValueError, match="checkpoint_interval"):
        train_bpe(docs, n_merges=2, checkpoint_interval=0)
    with pytest.raises(ValueError, match="checkpoint_interval"):
        train_bpe(docs, n_merges=2, checkpoint_interval=-3)
    with pytest.raises(ValueError, match="merge_batch"):
        train_bpe(docs, n_merges=2, merge_batch=0)


def test_accept_merge_prefix_unit():
    from haplorec_spark.operators.bpe import _accept_merge_prefix

    # disjoint, strictly descending: all accepted
    ranked = [("a", "b", 10), ("c", "d", 8), ("e", "f", 6)]
    assert _accept_merge_prefix(ranked, 2, {"a", "b", "c", "d", "e", "f"}) \
        == ranked
    # overlap stops the scan; gap rule drops ties with the rejected one
    ranked = [("a", "b", 10), ("b", "c", 9), ("e", "f", 6)]
    assert _accept_merge_prefix(ranked, None, set("abcef")) \
        == [("a", "b", 10)]
    # tie with the first non-accepted pair truncates (tie-break hazard)
    ranked = [("a", "b", 10), ("c", "d", 8), ("e", "f", 8)]
    out = _accept_merge_prefix(ranked, 8, set("abcdef"))
    assert out == [("a", "b", 10)]
    # collision: accepted, but nothing after it
    ranked = [("a", "b", 10), ("c", "d", 4), ("e", "f", 2)]
    assert _accept_merge_prefix(ranked, None, {"ab", "a", "b", "c", "d",
                                               "e", "f"}) \
        == [("a", "b", 10)]
    # first pair always survives even under a tie with the cutoff
    ranked = [("a", "b", 5)]
    assert _accept_merge_prefix(ranked, 5, set("ab")) == [("a", "b", 5)]


def test_distributed_rung_matches_replica(spark, docs):
    """The same end-to-end checks the default (driver) rung gets, with
    the distributed loop forced: merges, min_pair_count stop, and the
    cap all behave identically above the driver-vocab bound."""
    merges = train_bpe(
        docs, n_merges=30, min_pair_count=4, max_driver_vocab=None
    )
    got = [
        (r["left"], r["right"]) for r in merges.orderBy("merge_rank").collect()
    ]
    want = [
        (l, r)
        for l, r, _ in _ref_train(
            _ref_word_counts([t for _, t in DOCS]), 30, min_pair_count=4
        )
    ]
    assert got == want


def test_vocab_and_encode_ids_match_replica(spark, docs):
    from haplorec_spark.operators.bpe import bpe_encode_ids, bpe_vocab

    merges = train_bpe(docs, n_merges=20)
    ranks = {
        (r["left"], r["right"]): r["merge_rank"] for r in merges.collect()
    }
    # replica vocabulary: token -> corpus frequency over ref encodings
    wc = _ref_word_counts([t for _, t in DOCS])
    freq = Counter()
    for w, c in wc.items():
        for t in _ref_encode(w, ranks):
            freq[t] += c
    specials = ("<pad>", "<unk>", "<bos>", "<eos>")
    order = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    want_vocab = [(i, s, 0) for i, s in enumerate(specials)] + [
        (len(specials) + i, t, c) for i, (t, c) in enumerate(order)
    ]
    vocab = bpe_vocab(docs, merges)
    got_vocab = [
        tuple(r) for r in vocab.orderBy("token_id").collect()
    ]
    assert got_vocab == want_vocab

    # id sequences: concatenated per-word encodings in text order
    ids = {t: i for i, t, _ in want_vocab}
    out = {
        r["doc_id"]: (list(r["token_ids"]), r["n_tokens"])
        for r in bpe_encode_ids(docs, merges, vocab).collect()
    }
    for doc_id, text in DOCS:
        ws = [w for w in text.lower().split(" ") if w]
        if not ws:
            # wordless docs are PRESENT with an empty id sequence
            assert out[doc_id] == ([], 0)
            continue
        want = [ids[t] for w in ws for t in _ref_encode(w, ranks)]
        assert out[doc_id] == (want, len(want)), doc_id


def test_encode_ids_unknown_token_maps_to_unk(spark, docs):
    from haplorec_spark.operators.bpe import bpe_encode_ids, bpe_vocab

    merges = train_bpe(docs, n_merges=10)
    vocab = bpe_vocab(docs, merges)
    ids = {r["token"]: r["token_id"] for r in vocab.collect()}
    other = spark.createDataFrame(
        [(99, "zqz cat")], "doc_id int, text string"
    )  # 'z'/'q' never occur in DOCS -> unk per character
    (r,) = bpe_encode_ids(other, merges, vocab).collect()
    got = list(r["token_ids"])
    assert got[:3] == [ids["<unk>"]] * 3  # z, q, z
    assert ids["<unk>"] not in got[3:]  # 'cat' tokens all known

    import pytest as _pytest

    with _pytest.raises(ValueError, match="<unk>"):
        bpe_encode_ids(
            other, merges, vocab.filter(F.col("token") != "<unk>")
        )


# ------------------------------------------------------- byte-level mode


def _ref_train_bytes(word_counts, n_merges, min_pair_count=1):
    """Replica trainer over UTF-8-byte seeds (hex-pair symbols)."""
    def seed(w):
        h = w.encode("utf-8").hex()
        return tuple([h[i:i + 2] for i in range(0, len(h), 2)]
                     + [END_OF_WORD])

    table = {seed(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in table.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if cnt < min_pair_count:
            break
        merges.append((left, right, cnt))
        table = {
            _ref_merge_seq(s, left, right): c for s, c in table.items()
        }
    return merges


def test_byte_level_matches_replica_all_rungs(spark):
    from haplorec_spark.operators.bpe import decode_byte_token

    rows = [(0, "café café crème"), (1, "naïve café déjà vu"),
            (2, "the cat sat"), (3, "日本 語 日本")]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    wc = _ref_word_counts([t for _, t in rows])
    want = [
        (i, l, r, l + r, c)
        for i, (l, r, c) in enumerate(_ref_train_bytes(wc, 25))
    ]

    def table(**kw):
        return [
            tuple(r)
            for r in train_bpe(docs, n_merges=25, byte_level=True, **kw)
            .orderBy("merge_rank").collect()
        ]

    assert table() == want                            # driver rung
    assert table(max_driver_vocab=None) == want       # distributed seq
    assert table(max_driver_vocab=None, merge_batch=8) == want  # batched

    # tokens render back to readable text: the most frequent full-word
    # merge chain reconstructs 'café</w>' from hex
    merges = train_bpe(docs, n_merges=25, byte_level=True)
    words = spark.createDataFrame([("café",)], "word string")
    (enc,) = bpe_encode_words(words, merges, byte_level=True).collect()
    joined = "".join(decode_byte_token(t) for t in enc["bpe_tokens"])
    assert joined == "café" + END_OF_WORD


def test_byte_level_encode_ids_round_trip(spark):
    from haplorec_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_vocab,
    )

    rows = [(0, "café café crème the"), (1, "the naïve café")]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    merges = train_bpe(docs, n_merges=15, byte_level=True)
    vocab = bpe_vocab(docs, merges, byte_level=True)
    out = {
        r["doc_id"]: list(r["token_ids"])
        for r in bpe_encode_ids(
            docs, merges, vocab, byte_level=True
        ).collect()
    }
    tok_of = {r["token_id"]: r["token"] for r in vocab.collect()}
    # id sequences decode losslessly back to each document's words
    for did, text in rows:
        hexcat = "".join(tok_of[i] for i in out[did])
        joined = hexcat.replace(END_OF_WORD, "")
        words = [w for w in text.lower().split() if w]
        assert bytes.fromhex(joined).decode("utf-8") == "".join(words)
        assert hexcat.count(END_OF_WORD) == len(words)


def test_tokenizer_save_load_round_trip(spark, docs, tmp_path):
    from haplorec_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_vocab,
        load_bpe_tokenizer,
        save_bpe_tokenizer,
    )

    merges = train_bpe(docs, n_merges=15, byte_level=True)
    vocab = bpe_vocab(docs, merges, byte_level=True)
    path = str(tmp_path / "tok")
    save_bpe_tokenizer(merges, vocab, path, byte_level=True)

    m2, v2, bl, ptk = load_bpe_tokenizer(spark, path)
    assert bl is True and v2 is not None and ptk == "whitespace"
    assert sorted(tuple(r) for r in m2.collect()) == sorted(
        tuple(r) for r in merges.collect()
    )
    assert sorted(tuple(r) for r in v2.collect()) == sorted(
        tuple(r) for r in vocab.collect()
    )
    # loaded artifact drives id encoding identically
    a = sorted(
        (r["doc_id"], tuple(r["token_ids"]))
        for r in bpe_encode_ids(
            docs, merges, vocab, byte_level=True
        ).collect()
    )
    b = sorted(
        (r["doc_id"], tuple(r["token_ids"]))
        for r in bpe_encode_ids(docs, m2, v2, byte_level=bl).collect()
    )
    assert a == b

    # re-save a LOADED artifact over its own path (the overwrite-safety
    # contract), and the vocab-less form round-trips too
    save_bpe_tokenizer(m2, v2, path, byte_level=bl, pretokenize=ptk)
    m3, v3, _, _ = load_bpe_tokenizer(spark, path)
    assert sorted(tuple(r) for r in m3.collect()) == sorted(
        tuple(r) for r in merges.collect()
    )
    path2 = str(tmp_path / "tok2")
    save_bpe_tokenizer(merges, None, path2)
    m4, v4, bl4, ptk4 = load_bpe_tokenizer(spark, path2)
    assert v4 is None and bl4 is False and ptk4 == "whitespace" and m4.count() == merges.count()


def test_self_pair_batch_stays_sequential(spark):
    """Regression (round-6 review): merging a SELF-pair (a,a) mints
    pairs like (aa,aa) out of the accepted pair's own occurrences, so
    the batch must stop after it — otherwise the distributed batched
    rung diverges from sequential on run-heavy corpora."""
    text = "aaaaaab " * 9 + "b b"
    docs = spark.createDataFrame([(0, text)], "doc_id int, text string")
    want = [
        tuple(r)
        for r in train_bpe(
            docs, n_merges=4, max_driver_vocab=None, merge_batch=1
        ).orderBy("merge_rank").collect()
    ]
    got = [
        tuple(r)
        for r in train_bpe(
            docs, n_merges=4, max_driver_vocab=None, merge_batch=6
        ).orderBy("merge_rank").collect()
    ]
    drv = [
        tuple(r)
        for r in train_bpe(docs, n_merges=4).orderBy("merge_rank").collect()
    ]
    ref = [
        (i, l, r, l + r, c)
        for i, (l, r, c) in enumerate(
            _ref_train(_ref_word_counts([text]), 4)
        )
    ]
    assert want == ref and got == ref and drv == ref


def test_vocab_excludes_special_collisions(spark):
    """A corpus token spelled like a special must not mint a second
    vocab row; occurrences resolve to the special's id."""
    from haplorec_spark.operators.bpe import bpe_encode_ids, bpe_vocab

    # '<unk>' appears as a real corpus word often enough to fully merge
    docs = spark.createDataFrame(
        [(0, " ".join(["<unk>"] * 30 + ["cat"] * 3))],
        "doc_id int, text string",
    )
    merges = train_bpe(docs, n_merges=30)
    vocab = bpe_vocab(docs, merges)
    toks = [r["token"] for r in vocab.collect()]
    assert toks.count("<unk>") == 1  # only the special row survives
    ids = {r["token"]: r["token_id"] for r in vocab.collect()}
    (row,) = bpe_encode_ids(
        spark.createDataFrame([(9, "<unk>")], "doc_id int, text string"),
        merges,
        vocab,
    ).collect()
    # the fully-merged corpus token '<unk></w>' is also excluded? no —
    # only exact special names are; the word encodes to its learned
    # tokens, which resolve to their own ids unless they collide
    assert all(isinstance(i, int) for i in row["token_ids"])
    assert ids["<unk>"] == 1


def test_char_mode_rung_parity_on_astral_unicode(spark):
    """ADVICE r6: char-mode seeding must agree across rungs BEYOND the
    BMP — the driver rung seeds by Python code points (list(word)),
    the distributed rung by Spark split(word, ''), and for
    supplementary-plane characters (emoji, rare CJK) those could
    diverge on engines whose empty-pattern split cuts surrogate
    halves. Spark 4 splits by code point (probed), so all rungs must
    stay bit-identical on an astral-heavy corpus — this pins the
    guarantee so an engine upgrade that regresses to code-unit
    splitting fails loudly instead of silently flipping tables when a
    corpus crosses max_driver_vocab."""
    rows = [
        ("🎉🎊 fête 🎉🎊 fête naïve",),
        ("𝕊𝕡𝕒𝕣𝕜 🎉🎉 𝕊𝕡𝕒𝕣𝕜 data",),
        ("汉字 🚀🚀 汉字 fête naïve",),
        ("🎉🎊 𝕊𝕡𝕒𝕣𝕜 🚀 data data",),
    ] * 3
    docs = spark.createDataFrame(rows, "text string")

    def table(**kw):
        return [
            tuple(r)
            for r in train_bpe(docs, n_merges=15, **kw)
            .orderBy("merge_rank")
            .collect()
        ]

    driver = table()
    assert table(max_driver_vocab=None, merge_batch=1) == driver
    assert table(max_driver_vocab=None, merge_batch=8) == driver
    # the learned symbols really do carry astral characters (the test
    # would be vacuous if the corpus collapsed to ASCII pairs)
    assert any(
        any(ord(c) > 0xFFFF for c in merged)
        for _, _, _, merged, _ in driver
    )


def test_tokenizer_artifact_torn_save_detected(spark, docs, tmp_path):
    """ADVICE r6: the three-part artifact is individually atomic but
    not jointly — meta (written last) carries fingerprints of the data
    parts, so a crash between swaps (simulated: merges re-swapped
    under the old meta) raises at load instead of silently pairing new
    merges with a stale byte_level flag."""
    from haplorec_spark.operators.bpe import (
        bpe_vocab,
        load_bpe_tokenizer,
        save_bpe_tokenizer,
    )
    from haplorec_spark.operators.training import safe_overwrite_parquet

    merges = train_bpe(docs, n_merges=10)
    vocab = bpe_vocab(docs, merges)
    path = str(tmp_path / "tok")
    save_bpe_tokenizer(merges, vocab, path)
    m2, v2, bl, _ = load_bpe_tokenizer(spark, path)
    assert not bl and v2 is not None
    assert sorted(tuple(r) for r in m2.collect()) == sorted(
        tuple(r) for r in merges.collect()
    )
    # torn: a NEW merges table swapped in, meta still the old one
    half = merges.filter(F.col("merge_rank") < 5).localCheckpoint(
        eager=True
    )
    safe_overwrite_parquet(half, f"{path}/merges")
    with pytest.raises(IOError, match="torn"):
        load_bpe_tokenizer(spark, path)
    # re-save repairs; torn vocab is caught the same way
    save_bpe_tokenizer(merges, vocab, path)
    load_bpe_tokenizer(spark, path)
    safe_overwrite_parquet(
        vocab.filter(F.col("token_id") < 6).localCheckpoint(eager=True),
        f"{path}/vocab",
    )
    with pytest.raises(IOError, match="torn"):
        load_bpe_tokenizer(spark, path)


# ------------------------------------------- GPT-2 pre-tokenization

def _is_sp(c):
    # Java regex \s (the engine's pattern host) is ASCII whitespace
    return c in " \t\n\x0b\f\r"


def _gpt2_pretokens_ref(text):
    """Pure-Python replica of GPT2_PRETOKEN_PATTERN (leftmost-first
    alternation semantics, hand-walked — shares no regex engine with
    the implementation): contraction suffixes; optionally
    space-prefixed unicode letter / number / other runs; whitespace
    runs gluing their last space to a following word."""
    import unicodedata

    def cat(c):
        return unicodedata.category(c)[0]

    toks, i, n = [], 0, len(text)
    while i < n:
        hit = None
        for suf in ("'s", "'t", "'re", "'ve", "'m", "'ll", "'d"):
            if text.startswith(suf, i):
                hit = suf
                break
        if hit:
            toks.append(hit)
            i += len(hit)
            continue
        lead = 1 if text[i] == " " else 0
        k = i + lead
        if k < n and cat(text[k]) == "L":
            while k < n and cat(text[k]) == "L":
                k += 1
            toks.append(text[i:k])
        elif k < n and cat(text[k]) == "N":
            while k < n and cat(text[k]) == "N":
                k += 1
            toks.append(text[i:k])
        elif k < n and not _is_sp(text[k]):
            while (
                k < n
                and not _is_sp(text[k])
                and cat(text[k]) not in ("L", "N")
            ):
                k += 1
            toks.append(text[i:k])
        else:
            k = i
            while k < n and _is_sp(text[k]):
                k += 1
            if k == n or k - i == 1:
                toks.append(text[i:k])
            else:
                # \s+(?!\S): leave the last space glued to the word
                toks.append(text[i:k - 1])
                k -= 1
        i = k
    return toks


GPT2_FIXTURES = [
    "Hello, world! It's John's dog.",
    "a  b   c\td",
    "  leading and trailing  ",
    "x2y 42nd héllo Füße naïve 北京 東京42",
    "(word) word. word? 'quoted' \"dq\" e.g., U.S.A.",
    "don't can't we'll they've I'm he'd you're",
    "price: $5.99, 10% off!",
    "",
    "   ",
    "line1\nline2\r\nline3",
    "CamelCase UPPER lower 'S ODD'S",
    "multi    spaces      here",
]


def test_gpt2_pretokens_match_replica(spark):
    from haplorec_spark.operators.bpe import pretokenize_words

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(GPT2_FIXTURES)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: list(r["w"])
        for r in df.select(
            "doc_id", pretokenize_words("text", "gpt2").alias("w")
        ).collect()
    }
    for i, t in enumerate(GPT2_FIXTURES):
        want = [
            w
            for w in _gpt2_pretokens_ref(t)
            if not (w and all(_is_sp(c) for c in w))
        ]
        assert got[i] == want, repr(t)


def test_gpt2_pretokens_punctuation_and_contractions():
    """The headline fidelity cases, pinned explicitly: punctuation
    splits off the word, a word owns its single leading space, case
    is preserved, contraction suffixes are their own tokens."""
    assert _gpt2_pretokens_ref("Hello, world! It's John's dog.") == [
        "Hello", ",", " world", "!", " It", "'s", " John", "'s",
        " dog", ".",
    ]
    # leading-space ownership across a multi-space run: the run keeps
    # all but its last space; the word keeps one
    assert _gpt2_pretokens_ref("a   b") == ["a", "  ", " b"]


def test_gpt2_word_counts_match_replica(spark):
    from collections import Counter

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(GPT2_FIXTURES)],
        "doc_id long, text string",
    )
    got = rows(bpe_word_counts(df, pretokenize="gpt2"))
    want = Counter(
        w
        for t in GPT2_FIXTURES
        for w in _gpt2_pretokens_ref(t)
        if not (w and all(_is_sp(c) for c in w))
    )
    assert got == sorted(want.items())


def test_gpt2_rung_parity(spark):
    """Driver and distributed rungs learn the bit-identical merge
    table under gpt2 pre-tokenization (space-prefixed words and punct
    runs flow through both loops unchanged)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(GPT2_FIXTURES)],
        "doc_id long, text string",
    )
    a = [
        tuple(r)
        for r in train_bpe(df, n_merges=25, pretokenize="gpt2")
        .orderBy("merge_rank")
        .collect()
    ]
    b = [
        tuple(r)
        for r in train_bpe(
            df, n_merges=25, pretokenize="gpt2", max_driver_vocab=None
        )
        .orderBy("merge_rank")
        .collect()
    ]
    assert a == b and len(a) == 25


def test_gpt2_byte_level_encode_ids_round_trip(spark):
    """The id-space export contract on punctuation-glued unicode web
    text: gpt2 + byte_level ids decode back to the EXACT original
    text (single-spaced text: every space is owned by the following
    word, so concatenating decoded pretokens restores the document)."""
    from haplorec_spark.operators.bpe import (
        END_OF_WORD,
        bpe_encode_ids,
        bpe_vocab,
    )

    texts = [
        "It's a naïve test, 100% real!",
        "Füße (feet) cost $5.99 — don't they?",
        "北京 and 東京42 overlap; e.g. U.S.A.",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = train_bpe(
        df, n_merges=40, byte_level=True, pretokenize="gpt2"
    )
    vocab = bpe_vocab(df, merges, byte_level=True, pretokenize="gpt2")
    tok_of = {
        r["token_id"]: r["token"]
        for r in vocab.select("token_id", "token").collect()
    }
    out = {
        r["doc_id"]: list(r["token_ids"])
        for r in bpe_encode_ids(
            df, merges, vocab, byte_level=True, pretokenize="gpt2"
        ).collect()
    }
    for i, t in enumerate(texts):
        hexcat = "".join(
            tok_of[x].replace(END_OF_WORD, "") for x in out[i]
        )
        assert bytes.fromhex(hexcat).decode("utf-8") == t, t


def test_unknown_pretokenize_mode_raises(spark, docs):
    from haplorec_spark.operators.bpe import save_bpe_tokenizer

    with pytest.raises(ValueError, match="pretokenize"):
        bpe_word_counts(docs, pretokenize="words")
    merges = train_bpe(docs, n_merges=3)
    with pytest.raises(ValueError, match="pretokenize"):
        save_bpe_tokenizer(merges, None, "/tmp/never", pretokenize="x")


def test_artifact_meta_carries_pretokenize(spark, docs, tmp_path):
    """Train/encode must agree on the word definition, so the flag
    travels in the artifact (the byte_level contract); artifacts from
    before the field load as whitespace."""
    from haplorec_spark.operators.bpe import (
        load_bpe_tokenizer,
        save_bpe_tokenizer,
    )
    from haplorec_spark.operators.training import safe_overwrite_parquet

    merges = train_bpe(docs, n_merges=8, pretokenize="gpt2")
    path = str(tmp_path / "tok_gpt2")
    save_bpe_tokenizer(merges, None, path, pretokenize="gpt2")
    _, _, bl, ptk = load_bpe_tokenizer(spark, path)
    assert (bl, ptk) == (False, "gpt2")

    # legacy artifact: meta without the pretokenize field
    from haplorec_spark.operators.bpe import _table_fingerprint

    legacy = str(tmp_path / "tok_legacy")
    m = merges.localCheckpoint(eager=True)
    safe_overwrite_parquet(m, f"{legacy}/merges")
    safe_overwrite_parquet(
        spark.createDataFrame(
            [(False, False,
              _table_fingerprint(m, "merge_rank", "left", "right"),
              None)],
            "byte_level boolean, has_vocab boolean, "
            "merges_fingerprint string, vocab_fingerprint string",
        ),
        f"{legacy}/meta",
    )
    _, _, _, ptk2 = load_bpe_tokenizer(spark, legacy)
    assert ptk2 == "whitespace"
