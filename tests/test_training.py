"""train_linear_text_classifier vs an independent numpy replica.

The trainer is iterative (no closed-form SQL), so per the engine's
oracle charter it gets the IVF-k-means treatment: an engine-independent
replica of the exact update rule (numpy, dense), compared iterate by
iterate to float tolerance, plus behavioral end-to-end checks
(separable corpus converges; trained weights drop into
linear_text_score and rank correctly; adaptive join paths agree).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from haplorec_spark.operators.text import linear_text_score
from haplorec_spark.operators.training import train_linear_text_classifier

DOCS = [
    # label 1: "clean" vocabulary
    (1, "the quick brown fox jumps over the lazy dog", 1),
    (2, "a clear well written sentence about science", 1),
    (3, "the dog and the fox are friends in science", 1),
    (4, "clear writing about a quick brown dog", 1),
    # label 0: "junk" vocabulary
    (5, "buy cheap pills now click here now now", 0),
    (6, "click click buy buy cheap cheap here", 0),
    (7, "free pills here click now buy", 0),
    (8, "cheap free free pills pills click", 0),
    # mixed
    (9, "the quick fox click here", 1),
    (10, "buy the dog now", 0),
]


def numpy_train(rows, iterations, lr, l2=0.0, min_df=1, average=True,
                l1=0.0, keep=None):
    """Dense replica of the documented update rule (incl. the ISTA
    soft-threshold for l1 and the round-8 vocab keep-set)."""
    toks = [(i, t.lower().split(" "), y) for i, t, y in rows]
    df = {}
    for _, ws, _ in toks:
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    vocab = sorted(w for w, c in df.items() if c >= min_df)
    if keep is not None:
        vocab = [w for w in vocab if w in set(keep)]
    vidx = {w: j for j, w in enumerate(vocab)}
    n, v = len(toks), len(vocab)
    X = np.zeros((n, v))
    y = np.array([float(lab) for _, _, lab in toks])
    for i, (_, ws, _) in enumerate(toks):
        for w in ws:
            if w in vidx:
                X[i, vidx[w]] += 1.0
        if average:
            X[i] /= len(ws)
    wts = np.zeros(v)
    bias = 0.0
    losses = []
    for _ in range(iterations):
        p = 1.0 / (1.0 + np.exp(-(bias + X @ wts)))
        pc = np.clip(p, 1e-12, 1 - 1e-12)
        losses.append(float(np.mean(-(y * np.log(pc) + (1 - y) * np.log(1 - pc)))))
        r = p - y
        grad = X.T @ r / n + l2 * wts
        wts -= lr * grad
        if l1:
            wts = np.sign(wts) * np.maximum(np.abs(wts) - lr * l1, 0.0)
        bias -= lr * float(np.mean(r))
    return dict(zip(vocab, wts)), bias, losses


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string, label int")


@pytest.mark.parametrize(
    "kw",
    [
        dict(iterations=5, learning_rate=1.0),
        dict(iterations=3, learning_rate=0.5, l2=0.1),
        dict(iterations=4, learning_rate=1.0, min_df=2),
        dict(iterations=3, learning_rate=1.0, average=False),
    ],
)
def test_matches_numpy_replica(spark, docs, kw):
    model = train_linear_text_classifier(docs, **kw)
    exp_w, exp_b, exp_loss = numpy_train(DOCS, kw["iterations"],
                                         kw["learning_rate"],
                                         l2=kw.get("l2", 0.0),
                                         min_df=kw.get("min_df", 1),
                                         average=kw.get("average", True))
    got = {r["word"]: r["weight"] for r in model.weights.collect()}
    assert set(got) == set(exp_w)
    for w in exp_w:
        assert got[w] == pytest.approx(exp_w[w], abs=1e-9), w
    assert model.bias == pytest.approx(exp_b, abs=1e-9)
    assert model.loss == pytest.approx(exp_loss, abs=1e-9)
    assert model.n_docs == len(DOCS)
    assert model.vocab_size == len(exp_w)


def test_loss_decreases_and_separates(spark, docs):
    model = train_linear_text_classifier(
        docs, iterations=60, learning_rate=2.0
    )
    assert model.loss[-1] < model.loss[0]
    assert model.loss[-1] < 0.3
    # trained weights drop straight into the apply operator
    scored = linear_text_score(
        docs,
        model.weights,
        bias=model.bias,
        average=model.average,
        max_broadcast_vocab=2_000_000,
    )
    probs = {r["doc_id"]: r["prob"] for r in scored.collect()}
    labels = {i: y for i, _, y in DOCS}
    acc = sum(
        (probs[i] >= 0.5) == (labels[i] == 1) for i in probs
    ) / len(probs)
    assert acc >= 0.9
    # signature words got the right sign
    wts = {r["word"]: r["weight"] for r in model.weights.collect()}
    assert wts["science"] > 0 and wts["pills"] < 0


def test_shuffle_join_path_matches_broadcast(spark, docs):
    """max_broadcast_vocab=0 forces the merge-join path; results equal."""
    a = train_linear_text_classifier(docs, iterations=3, learning_rate=1.0)
    b = train_linear_text_classifier(
        docs, iterations=3, learning_rate=1.0, max_broadcast_vocab=0
    )
    wa = {r["word"]: r["weight"] for r in a.weights.collect()}
    wb = {r["word"]: r["weight"] for r in b.weights.collect()}
    assert wa == pytest.approx(wb, abs=1e-12)
    assert a.bias == pytest.approx(b.bias, abs=1e-12)


def test_empty_doc_and_validation(spark):
    df = spark.createDataFrame(
        [(1, "", 1), (2, "spam spam", 0)],
        "doc_id int, text string, label int",
    )
    m = train_linear_text_classifier(df, iterations=2, learning_rate=1.0)
    assert m.n_docs == 2 and math.isfinite(m.loss[-1])
    bad = spark.createDataFrame(
        [(1, "x", 2)], "doc_id int, text string, label int"
    )
    with pytest.raises(ValueError, match="must be 0/1"):
        train_linear_text_classifier(bad, iterations=1)
    with pytest.raises(ValueError, match="iterations"):
        train_linear_text_classifier(df, iterations=0)


# --------------------------------------------------------------- eval face


def _py_auc(pairs):
    """Tie-aware Mann-Whitney AUC replica."""
    xs = sorted(pairs, key=lambda t: t[0])
    ranks, i = {}, 0
    while i < len(xs):
        j = i
        while j < len(xs) and xs[j][0] == xs[i][0]:
            j += 1
        avg = (i + 1 + j) / 2.0
        for t in range(i, j):
            ranks[t] = avg
        i = j
    npos = sum(y for _, y in xs)
    nneg = len(xs) - npos
    if not npos or not nneg:
        return None
    rpos = sum(ranks[t] for t, (_, y) in enumerate(xs) if y)
    return (rpos - npos * (npos + 1) / 2.0) / (npos * nneg)


def test_eval_metrics_match_replicas(spark):
    from haplorec_spark.operators.training import (
        evaluate_binary_classifier,
    )

    pairs = [
        (0.9, 1), (0.8, 1), (0.8, 0), (0.7, 1), (0.5, 0),
        (0.5, 1), (0.5, 0), (0.3, 0), (0.2, 1), (0.1, 0),
    ]
    df = spark.createDataFrame(pairs, "prob double, label int")
    r = evaluate_binary_classifier(df).collect()[0]
    tp = sum(1 for p, y in pairs if p >= 0.5 and y == 1)
    fp = sum(1 for p, y in pairs if p >= 0.5 and y == 0)
    fn = sum(1 for p, y in pairs if p < 0.5 and y == 1)
    tn = sum(1 for p, y in pairs if p < 0.5 and y == 0)
    assert (r["n"], r["n_pos"]) == (10, 5)
    assert r["accuracy"] == (tp + tn) / 10
    assert r["precision"] == pytest.approx(tp / (tp + fp), abs=1e-6)
    assert r["recall"] == pytest.approx(tp / (tp + fn), abs=1e-6)
    assert r["f1"] == pytest.approx(
        2 * tp / (2 * tp + fp + fn), abs=1e-6
    )
    assert r["auc"] == pytest.approx(_py_auc(pairs), abs=1e-6)
    # DuckDB replay of the tie-averaged rank-sum AUC
    import duckdb

    con = duckdb.connect()
    con.execute("create table s(prob double, label int)")
    con.executemany("insert into s values (?, ?)", pairs)
    want = con.execute(
        """
        WITH r AS (SELECT label,
                          avg(rn) OVER (PARTITION BY prob) AS rk
                   FROM (SELECT prob, label,
                                row_number() OVER (ORDER BY prob) AS rn
                         FROM s))
        SELECT (sum(CASE WHEN label = 1 THEN rk END)
                - 5 * 6 / 2.0) / (5 * 5) FROM r
        """
    ).fetchone()[0]
    assert r["auc"] == pytest.approx(want, abs=1e-6)


def test_eval_degenerate_classes_and_constant_scores(spark):
    from haplorec_spark.operators.training import (
        evaluate_binary_classifier,
    )

    one_class = spark.createDataFrame(
        [(0.7, 1), (0.2, 1)], "prob double, label int"
    )
    r = evaluate_binary_classifier(one_class).collect()[0]
    assert r["auc"] is None and r["recall"] == 0.5
    const = spark.createDataFrame(
        [(0.4, 1), (0.4, 0), (0.4, 1), (0.4, 0)],
        "prob double, label int",
    )
    c = evaluate_binary_classifier(const).collect()[0]
    assert c["auc"] == 0.5  # tie-averaged ranks, the textbook value
    assert c["precision"] is None  # no predicted positives at 0.5


def test_eval_closes_the_training_loop(spark, docs):
    from haplorec_spark.operators.text import linear_text_score
    from haplorec_spark.operators.training import (
        evaluate_binary_classifier,
        train_linear_text_classifier,
    )

    model = train_linear_text_classifier(
        docs, iterations=60, learning_rate=2.0
    )
    scored = linear_text_score(
        docs, model.weights, bias=model.bias,
        max_broadcast_vocab=2_000_000,
    ).join(docs.select("doc_id", "label"), "doc_id")
    r = evaluate_binary_classifier(scored).collect()[0]
    assert r["accuracy"] >= 0.9 and r["auc"] >= 0.9


def test_calibration_buckets_hand_computed(spark):
    from haplorec_spark.operators.training import calibration_buckets

    pairs = [
        (0.05, 0), (0.15, 0), (0.15, 1), (0.95, 1), (0.95, 1),
        (0.95, 0), (1.0, 1),
    ]
    df = spark.createDataFrame(pairs, "prob double, label int")
    rows = {r["bucket"]: r for r in calibration_buckets(df).collect()}
    assert set(rows) == {0, 1, 9}
    b1 = rows[1]
    assert b1["n"] == 2 and b1["pos_rate"] == 0.5
    assert b1["mean_prob"] == 0.15 and b1["abs_gap"] == 0.35
    b9 = rows[9]  # prob=1.0 folds into the top bucket
    assert b9["n"] == 4
    assert b9["pos_rate"] == 0.75
    assert (b9["p_low"], b9["p_high"]) == (0.9, 1.0)
    # ECE from the frame matches the hand value
    ece = sum(r["n"] * r["abs_gap"] for r in rows.values()) / len(pairs)
    by_hand = (
        1 * abs(0.05 - 0.0)
        + 2 * abs(0.15 - 0.5)
        + 4 * abs((0.95 * 3 + 1.0) / 4 - 0.75)
    ) / 7
    assert abs(ece - by_hand) < 1e-6
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_buckets"):
        calibration_buckets(df, n_buckets=0)


def test_warm_start_equals_straight_run(spark, docs):
    """train(2, init=train(3)) == train(5) exactly — the continuation
    contract that makes incremental refits trustworthy."""
    from haplorec_spark.operators.training import (
        load_text_model,
        save_text_model,
    )

    kw = dict(learning_rate=1.0)
    first = train_linear_text_classifier(docs, iterations=3, **kw)
    cont = train_linear_text_classifier(
        docs, iterations=2, init=first, **kw
    )
    straight = train_linear_text_classifier(docs, iterations=5, **kw)
    wc = {r["word"]: r["weight"] for r in cont.weights.collect()}
    ws = {r["word"]: r["weight"] for r in straight.weights.collect()}
    assert wc == pytest.approx(ws, abs=1e-12)
    assert cont.bias == pytest.approx(straight.bias, abs=1e-12)
    # loss history continues: cont.loss == straight.loss[3:]
    assert cont.loss == pytest.approx(straight.loss[3:], abs=1e-12)


def test_model_save_load_roundtrip(spark, docs, tmp_path):
    from haplorec_spark.operators.training import (
        load_text_model,
        save_text_model,
    )

    model = train_linear_text_classifier(docs, iterations=3)
    path = str(tmp_path / "clf")
    save_text_model(model, path)
    back = load_text_model(spark, path)
    assert back.bias == model.bias
    assert back.average is model.average
    assert (back.n_docs, back.vocab_size) == (
        model.n_docs, model.vocab_size,
    )
    assert back.loss == pytest.approx(model.loss, abs=0)
    wa = {r["word"]: r["weight"] for r in model.weights.collect()}
    wb = {r["word"]: r["weight"] for r in back.weights.collect()}
    assert wa == wb
    # the loaded model warm-starts and applies
    cont = train_linear_text_classifier(docs, iterations=1, init=back)
    assert len(cont.loss) == 1
    scored = linear_text_score(
        docs, back.weights, bias=back.bias, max_broadcast_vocab=10**9
    )
    assert scored.count() == docs.count()


def test_warm_start_rejects_mismatched_feature_scaling(spark, docs):
    m = train_linear_text_classifier(docs, iterations=1, average=False)
    with pytest.raises(ValueError, match="average"):
        train_linear_text_classifier(
            docs, iterations=1, average=True, init=m
        )


def test_model_resave_to_same_path(spark, docs, tmp_path):
    """save(load(p), p) must not destroy the artifact it reads."""
    from haplorec_spark.operators.training import (
        load_text_model,
        save_text_model,
    )

    model = train_linear_text_classifier(docs, iterations=2)
    path = str(tmp_path / "clf2")
    save_text_model(model, path)
    before = {r["word"]: r["weight"]
              for r in load_text_model(spark, path).weights.collect()}
    save_text_model(load_text_model(spark, path), path)
    after = {r["word"]: r["weight"]
             for r in load_text_model(spark, path).weights.collect()}
    assert after == before


@pytest.fixture(scope="module")
def lang_docs(spark):
    """Tiny 3-language labeled corpus for the language-ID trainer:
    enough signal to separate, small enough to train in seconds."""
    rows = []
    sents = {
        "en": ["the cat is in the house", "we have the best dog",
               "this is the old garden", "they are in the house",
               "the dog and the cat play", "it is a good day"],
        "fr": ["le chat est dans la maison", "nous avons le chien",
               "c est le vieux jardin", "ils sont dans la maison",
               "le chien et le chat jouent", "c est une bonne journee"],
        "de": ["die katze ist im haus", "wir haben den besten hund",
               "das ist der alte garten", "sie sind im haus",
               "der hund und die katze spielen", "es ist ein guter tag"],
    }
    i = 0
    for lang, ss in sents.items():
        for s in ss:
            rows.append((i, lang, s))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_train_language_classifier_separates(spark, lang_docs):
    from haplorec_spark.operators.text import language_id_model
    from haplorec_spark.operators.training import train_language_classifier

    model = train_language_classifier(
        lang_docs, iterations=20, learning_rate=8.0, min_df=2
    )
    assert model.languages == ["de", "en", "fr"]  # sorted label set
    held_out = spark.createDataFrame(
        [(0, "en", "the house and the garden"),
         (1, "fr", "la maison et le jardin"),
         (2, "de", "das haus und der garten")],
        "doc_id long, want string, text string",
    )
    pred = {
        r["doc_id"]: r["predicted_lang"]
        for r in language_id_model(held_out, model).collect()
    }
    want = {r["doc_id"]: r["want"] for r in held_out.collect()}
    assert pred == want


def test_top_features_distills_and_matches_full_argmax(spark, lang_docs):
    from haplorec_spark.operators.text import language_id_model
    from haplorec_spark.operators.training import (
        top_features,
        train_language_classifier,
    )

    model = train_language_classifier(
        lang_docs, iterations=20, learning_rate=8.0, min_df=2
    )
    lit = top_features(model, k=10)
    assert set(lit) == set(model.languages)
    for lang, (bias, ws) in lit.items():
        assert len(ws) <= 10
        assert bias == pytest.approx(model.biases[lang])
    # the distilled literal model still classifies nearly all of the
    # training set (distillation is lossy by design — the k=10 cut on
    # this tiny corpus is allowed a couple of boundary flips)
    got = {
        r["doc_id"]: r["predicted_lang"]
        for r in language_id_model(lang_docs, lit).collect()
    }
    want = {r["doc_id"]: r["lang"] for r in lang_docs.collect()}
    agree = sum(got[i] == want[i] for i in want)
    assert agree >= len(want) - 2, (agree, len(want))
    # as_literal carries the FULL vocabulary
    full = model.as_literal()
    assert sum(len(w) for _, w in full.values()) == model.weights.count()


def test_language_model_save_load_and_torn_artifact(
    spark, lang_docs, tmp_path
):
    from haplorec_spark.operators.text import language_id_model
    from haplorec_spark.operators.training import (
        load_language_model,
        save_language_model,
        train_language_classifier,
    )

    model = train_language_classifier(
        lang_docs, iterations=8, learning_rate=8.0, min_df=2
    )
    path = str(tmp_path / "langid")
    save_language_model(model, path)
    loaded = load_language_model(spark, path)
    assert loaded.languages == model.languages
    assert loaded.biases == pytest.approx(model.biases)
    assert loaded.average == model.average and loaded.ngram == model.ngram
    want = sorted(
        tuple(r) for r in language_id_model(lang_docs, model).collect()
    )
    got = sorted(
        tuple(r) for r in language_id_model(lang_docs, loaded).collect()
    )
    assert got == want
    # torn artifact: new weights swapped in, meta stale -> load raises
    half = model.weights.limit(model.weights.count() // 2)
    from haplorec_spark.operators.training import safe_overwrite_parquet

    safe_overwrite_parquet(half, f"{path}/weights")
    with pytest.raises(IOError, match="torn"):
        load_language_model(spark, path)


def test_four_gram_distilled_model_scores_with_four_grams(spark, lang_docs):
    """Regression: the literal mapping form drops the model's ngram
    field; the scorer must recover it from feature-key lengths (every
    char_ngram_text_sql feature is exactly n chars) — the old
    hardcoded-trigram path missed every 4-gram feature and predicted
    one bias-only constant language for the whole corpus."""
    from haplorec_spark.operators.text import language_id_model
    from haplorec_spark.operators.training import (
        top_features,
        train_language_classifier,
    )

    model = train_language_classifier(
        lang_docs, ngram=4, iterations=20, learning_rate=8.0, min_df=2
    )
    lit = top_features(model, k=10)
    assert all(len(w) == 4 for _, ws in lit.values() for w in ws)
    full = {
        r["doc_id"]: r["predicted_lang"]
        for r in language_id_model(lang_docs, model).collect()
    }
    got = {
        r["doc_id"]: r["predicted_lang"]
        for r in language_id_model(lang_docs, lit).collect()
    }
    # the bug's signature was a single constant prediction
    assert len(set(got.values())) > 1
    agree = sum(got[i] == full[i] for i in full)
    assert agree >= len(full) - 2, (agree, len(full))


def test_average_false_model_scored_and_undistillable(spark, lang_docs):
    """The LanguageIdModel.average field is public API: the full-model
    scorer must honor average=False (no gram-count division), and the
    literal mapping form — which carries no average flag — must refuse
    to distill such a model instead of silently rescaling."""
    import dataclasses

    from haplorec_spark.operators.text import language_id_model
    from haplorec_spark.operators.training import (
        top_features,
        train_language_classifier,
    )

    model = train_language_classifier(
        lang_docs, iterations=8, learning_rate=8.0, min_df=2
    )
    summed = dataclasses.replace(model, average=False)
    avg_scores = {
        r["doc_id"]: r["lang_score"]
        for r in language_id_model(lang_docs, model).collect()
    }
    sum_scores = {
        r["doc_id"]: r["lang_score"]
        for r in language_id_model(lang_docs, summed).collect()
    }
    assert any(avg_scores[i] != sum_scores[i] for i in avg_scores)
    with pytest.raises(ValueError, match="average"):
        top_features(summed)
    with pytest.raises(ValueError, match="average"):
        summed.as_literal()


def test_torn_artifact_weight_permutation_detected(
    spark, lang_docs, tmp_path
):
    """Regression: the old count+|weight|-mass fingerprint passed a
    stale weights table whose weights were permuted across words; the
    shared crc32 row fingerprint must catch it."""
    from haplorec_spark.operators.training import (
        load_language_model,
        safe_overwrite_parquet,
        save_language_model,
        train_language_classifier,
    )

    model = train_language_classifier(
        lang_docs, iterations=8, learning_rate=8.0, min_df=2
    )
    path = str(tmp_path / "langid_perm")
    save_language_model(model, path)
    rows = [list(r) for r in spark.read.parquet(f"{path}/weights").collect()]
    i, j = next(
        (a, b)
        for a in range(len(rows))
        for b in range(a + 1, len(rows))
        if rows[a][2] != rows[b][2]
    )
    rows[i][2], rows[j][2] = rows[j][2], rows[i][2]  # same count, same mass
    permuted = spark.createDataFrame(
        [tuple(r) for r in rows], "lang string, word string, weight double"
    )
    safe_overwrite_parquet(permuted, f"{path}/weights")
    with pytest.raises(IOError, match="torn"):
        load_language_model(spark, path)


def test_old_fingerprint_scheme_gets_actionable_error(
    spark, lang_docs, tmp_path
):
    """An intact artifact saved under the pre-crc32 fingerprint scheme
    (count + |weight| mass, carries a decimal point) must fail load
    with the re-save message, not be misreported as torn."""
    from haplorec_spark.operators.training import (
        load_language_model,
        safe_overwrite_parquet,
        save_language_model,
        train_language_classifier,
    )

    model = train_language_classifier(
        lang_docs, iterations=4, learning_rate=8.0, min_df=2
    )
    path = str(tmp_path / "langid_old")
    save_language_model(model, path)
    meta = spark.read.parquet(f"{path}/meta")
    old = meta.withColumn(
        "weights_fingerprint", F.lit("252:13.482716")
    )
    safe_overwrite_parquet(old, f"{path}/meta")
    with pytest.raises(IOError, match="older fingerprint scheme"):
        load_language_model(spark, path)


def test_top_features_force_includes_full_length_feature(spark):
    """ADVICE r7 + r8: the mapping form recovers the gram size from
    its LONGEST key, so distillation must never keep only sub-n
    boundary grams — the strongest full-length feature is
    force-included, and (r8) the globally weakest kept feature is
    evicted in exchange so the total feature count never exceeds
    k × languages (a model distilled to land exactly at
    MAX_LITERAL_FEATURES must not overshoot to 2049 and be rejected
    by the consumer's bound check)."""
    from haplorec_spark.operators.training import (
        LanguageIdModel,
        top_features,
    )

    w = spark.createDataFrame(
        [
            ("aa", "x▁", 9.0),      # short boundary grams dominate
            ("aa", "y▁", 5.0),      # ... so k=2 keeps only sub-n keys
            ("aa", "abc", 0.2),
            ("aa", "abd", 0.5),     # strongest full-length feature
            ("bb", "qr", 3.0),
            ("bb", "s▁", 0.01),     # globally weakest kept → evicted
        ],
        "lang string, word string, weight double",
    )
    m = LanguageIdModel(
        languages=["aa", "bb"], weights=w, biases={"aa": 0.0, "bb": 0.0},
        average=True, ngram=3,
    )
    lit = top_features(m, k=2)
    keys_aa = set(lit["aa"][1])
    keys_bb = set(lit["bb"][1])
    assert "abd" in keys_aa      # full-length carrier force-included
    assert "s▁" not in keys_bb   # weakest kept feature evicted in trade
    assert "qr" in keys_bb
    # the bound-critical invariant: carrier insertion never grows the
    # total feature count past what k × languages allows
    total = len(keys_aa) + len(keys_bb)
    assert total <= 2 * 2
    assert max(len(k) for k in keys_aa | keys_bb) == 3


def test_literal_form_raises_without_any_full_length_feature(spark):
    """A trained weight table with NO full-length feature cannot carry
    the gram size in the mapping form: both distillation faces raise
    instead of letting the scorer run at the wrong n."""
    import pytest

    from haplorec_spark.operators.training import (
        LanguageIdModel,
        top_features,
    )

    w = spark.createDataFrame(
        [("aa", "x▁", 9.0), ("aa", "yz", 1.0)],
        "lang string, word string, weight double",
    )
    m = LanguageIdModel(
        languages=["aa"], weights=w, biases={"aa": 0.0},
        average=True, ngram=3,
    )
    with pytest.raises(ValueError, match="full-length"):
        top_features(m, k=1)
    with pytest.raises(ValueError, match="full-length"):
        m.as_literal()


def test_l1_training_matches_replica_and_sparsifies(spark, docs):
    """Round-8 ISTA knob: l1 training matches the numpy proximal-step
    replica to float precision AND produces exact zeros (sparsity
    emerges during training, not by post-hoc truncation)."""
    from haplorec_spark.operators.training import (
        train_linear_text_classifier,
    )

    m = train_linear_text_classifier(
        docs, iterations=8, learning_rate=1.0, l1=0.02
    )
    got = {
        r["word"]: r["weight"] for r in m.weights.collect()
    }
    want_w, want_b, _ = numpy_train(DOCS, 8, 1.0, l1=0.02)
    assert set(got) == set(want_w)
    for w in got:
        assert got[w] == pytest.approx(want_w[w], abs=1e-12), w
    assert m.bias == pytest.approx(want_b, abs=1e-12)
    n_zero = sum(1 for x in got.values() if x == 0.0)
    assert n_zero > 0  # exact zeros exist
    assert any(x != 0.0 for x in got.values())  # and signal survives


def test_vocab_restricted_training_matches_replica(spark, docs):
    """Round-8 refit knob: vocab= restricts the feature set; the fit
    matches the numpy replica trained on the same restricted
    vocabulary, and no out-of-vocab feature appears."""
    from haplorec_spark.operators.training import (
        train_linear_text_classifier,
    )

    keep = ["the", "click", "buy", "dog"]
    m = train_linear_text_classifier(
        docs, iterations=6, learning_rate=1.0, vocab=keep
    )
    got = {r["word"]: r["weight"] for r in m.weights.collect()}
    assert set(got) <= set(keep)
    want_w, want_b, _ = numpy_train(DOCS, 6, 1.0, keep=keep)
    assert set(got) == set(want_w)
    for w in got:
        assert got[w] == pytest.approx(want_w[w], abs=1e-12), w
    assert m.bias == pytest.approx(want_b, abs=1e-12)
