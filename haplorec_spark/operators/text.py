"""Text-analysis operators for training-data curation.

Everything is declarative ``pyspark.sql.functions`` programs — no
Python UDFs. The per-document scorers are pure column projections
(map-side, zero shuffle, embarrassingly parallel over parquet row
groups at 100 TB); the corpus-relative operators shuffle only
key-value granularity, never document text.

Per-document (map-side):

* ``language_id``      — n-gram lexicon heuristic: score each candidate
  language by stopword hits, argmax with a deterministic tiebreak.
* ``quality_score``    — length / punctuation / stopword-ratio features
  combined into one bounded score; optionally appends the repetition
  features below in the same projection.
* ``repetition_metrics`` — Gopher-style repetition filters: duplicate
  word fraction, duplicate word-bigram fraction, top-word fraction.
* ``token_counts``     — whitespace tokens plus a BPE-ish regex token
  count (letter runs, digit runs, single punctuation marks).
* ``redact_pii``       — mask emails / IPv4s / SSN- and phone-shaped
  numbers with typed placeholders, with per-type match counts.
* ``chunk_documents``  — sliding/tiling word windows (training-prep
  chunking; the cut-long complement of ``pack_sequences``).
* ``linear_text_score`` — apply a pretrained linear (fastText-style)
  classifier: literal-map projection for small vocabularies, measured
  adaptive join for large ones.

Corpus-relative (word/line-keyed aggregation + broadcast back):

* ``doc_fingerprints`` — bottom-k sketch of md5 shingle hashes (a
  winnowing-style content fingerprint; equal fingerprints => likely
  near-identical content).
* ``unigram_logprob_score`` — mean unigram-LM log-probability per
  document (the CCNet-style perplexity quality signal).
* ``perplexity_buckets`` — CCNet head/middle/tail tiers from exact
  score quantiles (map-side CASE against collected cut scalars).
* ``strip_boilerplate_lines`` — cross-document line-level dedup.

Each has an exact DuckDB oracle; regexes are limited to constructs with
identical Java-regex / RE2 semantics (character classes, +).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language function-word lexicons (public common stopwords).
LANG_LEXICON: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "fr": ["le", "la", "de", "et", "un", "une", "est"],
    "es": ["el", "la", "de", "y", "un", "una", "es"],
    "de": ["der", "die", "das", "und", "ein", "ist", "zu"],
}

#: Wider per-language function-word lists (public common stopwords)
#: feeding the character-trigram profiles of :func:`language_id_ngram`.
#: Declaration order is the deterministic tiebreak order.
LANG_FUNCTION_WORDS: dict[str, list[str]] = {
    "en": ["the", "a", "an", "of", "and", "to", "in", "is", "that", "it",
           "for", "on", "with", "as", "this", "was", "are", "be", "at",
           "by", "not", "from", "but", "have", "you", "we", "they",
           "his", "her", "which"],
    "fr": ["le", "la", "les", "de", "des", "du", "et", "un", "une",
           "est", "que", "qui", "dans", "pour", "pas", "sur", "avec",
           "par", "mais", "son", "ses", "nous", "vous", "ils", "elle",
           "sont", "plus", "ce", "cette", "aux"],
    "es": ["el", "la", "los", "las", "de", "del", "y", "un", "una",
           "es", "que", "en", "no", "por", "con", "para", "su", "sus",
           "se", "lo", "como", "pero", "este", "esta", "son", "fue",
           "ser", "al", "hay", "muy"],
    "de": ["der", "die", "das", "und", "ein", "eine", "ist", "zu",
           "den", "dem", "des", "nicht", "mit", "auf", "von", "im",
           "sich", "auch", "als", "an", "es", "sind", "war", "wird",
           "bei", "aus", "nach", "oder", "wie", "einem"],
    "it": ["il", "lo", "la", "gli", "le", "di", "del", "della", "e",
           "un", "una", "che", "in", "non", "per", "con", "su", "si",
           "come", "ma", "anche", "sono", "era", "questo", "questa",
           "al", "dal", "nel", "della", "degli"],
    "pt": ["o", "os", "as", "de", "do", "da", "dos", "das", "e", "um",
           "uma", "que", "em", "por", "com", "para", "se", "mais",
           "como", "mas", "foi", "ser", "ao", "pelo", "pela", "este",
           "esta", "os", "uns", "umas"],
    "nl": ["de", "het", "een", "en", "van", "is", "in", "op", "te",
           "dat", "die", "niet", "met", "voor", "aan", "als", "er",
           "maar", "om", "ook", "bij", "uit", "naar", "zijn", "was",
           "wordt", "deze", "dit", "over", "hebben"],
}


def _trigram_profile(words: list[str]) -> list[str]:
    """Sorted character trigrams of space-padded words — padding keeps
    the word-boundary trigrams (' le', 'le ') that carry most of the
    language signal (the Cavnar & Trenkle 1994 n-gram-profile
    observation)."""
    tris: set[str] = set()
    for w in words:
        s = f" {w} "
        for i in range(len(s) - 2):
            tris.add(s[i : i + 3])
    return sorted(tris)


#: lang -> sorted trigram membership profile (a few hundred entries per
#: language); shared verbatim by the DuckDB oracle in
#: tests/test_registry.py so implementation and oracle agree on the
#: profile by construction.
LANG_TRIGRAM_PROFILES: dict[str, list[str]] = {
    lang: _trigram_profile(ws) for lang, ws in LANG_FUNCTION_WORDS.items()
}



#: The distilled TRAINED language-ID model (third rung): one-vs-rest
#: logistic weights over character-trigram features, top 36 features
#: per language (252 total — under the 256 map-side literal bound).
#: {lang: (bias, {feature: weight})}; feature tokens are
#: ``char_ngram_text_sql`` trigrams (spaces rendered ``▁``), weights
#: rounded to 6 decimals. Trained in-engine by
#: ``training.train_language_classifier`` on the deterministic
#: function-word + common-word corpus and distilled by
#: ``training.top_features`` — regenerate with
#: ``scripts/make_pinned_langid.py``. Shared verbatim by the DuckDB
#: oracle in tests/test_registry.py (the LANG_TRIGRAM_PROFILES
#: convention), so implementation and oracle agree on the model by
#: construction.
PINNED_LANGID_MODEL = {'de': (-1.806742,
        {'ach': 0.434969,
         'as▁': -0.380002,
         'aus': 0.44887,
         'bei': 0.402282,
         'ben': 0.383481,
         'ch▁': 0.572281,
         'der': 0.652809,
         'ebe': 0.419664,
         'ein': 0.702619,
         'eit': 0.42046,
         'en▁': 1.085879,
         'er▁': 0.570842,
         'e▁d': 0.390971,
         'hau': 0.476352,
         'hen': 0.447759,
         'ich': 0.398305,
         'ie▁': 0.390902,
         'ind': 0.414545,
         'ine': 0.465247,
         'iss': 0.39958,
         'nd▁': 0.427223,
         'n▁a': 0.621218,
         'os▁': -0.452052,
         'r▁z': 0.383495,
         'sse': 0.441702,
         'st▁': 0.430362,
         's▁d': -0.370778,
         'te▁': 0.733977,
         'ute': 0.486974,
         '▁au': 0.594361,
         '▁co': -0.395736,
         '▁de': 0.491977,
         '▁ei': 0.702619,
         '▁le': 0.417155,
         '▁si': 0.369838,
         '▁wi': 0.510156}),
 'en': (-1.757257,
        {'at▁': 0.420108,
         'de▁': -0.263658,
         'ed▁': 0.71747,
         'en▁': -0.867642,
         'es▁': 0.354081,
         'e▁a': 0.337575,
         'e▁t': 0.346143,
         'gs▁': 0.268768,
         'hin': 0.268768,
         'his': 0.478502,
         'ing': 1.124166,
         'is▁': 0.561122,
         'ngs': 0.268768,
         'ng▁': 0.946783,
         'of▁': 0.272172,
         'os▁': -0.460777,
         'que': -0.27526,
         's▁a': 0.339623,
         's▁b': 0.390808,
         's▁d': -0.376744,
         's▁w': 0.356256,
         'te▁': -0.416644,
         'the': 0.471707,
         'thi': 0.521322,
         'wor': 0.393541,
         '▁da': -0.339483,
         '▁de': -0.618723,
         '▁es': -0.273428,
         '▁le': -0.433882,
         '▁of': 0.272172,
         '▁pa': -0.280101,
         '▁qu': -0.314654,
         '▁th': 1.245676,
         '▁to': 0.262485,
         '▁un': -0.345771,
         '▁wa': 0.584776}),
 'es': (-1.813115,
        {'aba': 0.430468,
         'abr': 0.278131,
         'as▁': 0.316225,
         'a▁c': 0.320345,
         'bra': 0.278131,
         'el▁': 0.470201,
         'ing': -0.296206,
         'ino': 0.296208,
         'lab': 0.278131,
         'las': 0.293862,
         'le▁': -0.275754,
         'mos': 0.375087,
         'nin': 0.296208,
         'nos': 0.514475,
         'n▁e': 0.332705,
         'osa': 0.295493,
         'os▁': 1.021067,
         'que': 0.310095,
         'rab': 0.430468,
         's▁d': 0.407652,
         's▁l': 0.381301,
         'ue▁': 0.397589,
         '▁co': 0.462495,
         '▁es': 0.548911,
         '▁ha': 0.38763,
         '▁la': 0.421071,
         '▁lo': 0.376372,
         '▁ma': -0.333317,
         '▁pa': 0.303722,
         '▁se': 0.324464,
         '▁su': 0.351552,
         '▁un': 0.275107,
         '▁vi': 0.32597,
         '▁wa': -0.285659,
         '▁wo': -0.288884,
         '▁y▁': 0.294753}),
 'fr': (-1.778818,
        {'ais': 0.584847,
         'as▁': -0.428105,
         'de▁': 0.3136,
         'ell': 0.32969,
         'ent': 0.817741,
         'en▁': -1.158778,
         'er▁': -0.542476,
         'es▁': 0.952159,
         'ing': -0.298609,
         'iso': 0.453804,
         'le▁': 0.68938,
         'lle': 0.539787,
         'mai': 0.384576,
         'ne▁': 0.396043,
         'nne': 0.591091,
         'ns▁': 0.841346,
         'nt▁': 1.119176,
         'ons': 0.399866,
         'os▁': -0.468529,
         'ous': 0.335814,
         'ses': 0.448579,
         'son': 0.760363,
         's▁a': 0.296858,
         's▁d': 0.422914,
         's▁e': 0.352147,
         's▁l': 0.327609,
         'ts▁': 0.552463,
         't▁e': 0.448578,
         't▁p': 0.507914,
         't▁q': 0.410537,
         'ur▁': 0.398896,
         'us▁': 0.475669,
         'vou': 0.409021,
         '▁ce': 0.436563,
         '▁co': -0.407426,
         '▁so': 0.306559}),
 'it': (-1.775135,
        {'al▁': 0.352842,
         'as▁': -0.685549,
         'a▁a': 0.569453,
         'a▁d': 0.5327,
         'del': 0.64683,
         'ell': 0.363274,
         'el▁': 0.369303,
         'en▁': -1.152173,
         'es▁': -0.441145,
         'e▁l': 0.402668,
         'gli': 0.502422,
         'gon': 0.437119,
         'he▁': 0.379807,
         'iam': 0.637183,
         'i▁c': 0.492214,
         'i▁d': 0.408077,
         'la▁': 0.580499,
         'li▁': 0.502422,
         'lla': 0.390503,
         'l▁d': 0.351168,
         'mo▁': 0.353744,
         'ni▁': 0.549355,
         'no▁': 1.04085,
         'ole': 0.483011,
         'ono': 0.862829,
         'os▁': -0.47395,
         'o▁c': 0.498856,
         'o▁u': 0.399503,
         'per': 0.374231,
         's▁a': -0.363296,
         's▁d': -0.384679,
         'ues': 0.376373,
         'va▁': 0.418591,
         '▁an': 0.410191,
         '▁co': 0.388622,
         '▁de': 0.437134}),
 'nl': (-1.829752,
        {'aan': 0.526282,
         'aar': 0.430276,
         'an▁': 0.635898,
         'ar▁': 0.363325,
         'as▁': -0.420869,
         'de▁': 0.323862,
         'en▁': 2.96161,
         'es▁': -0.440478,
         'et▁': 0.91234,
         'eze': 0.46286,
         'is▁': 0.31964,
         'lde': 0.274237,
         'men': 0.419723,
         'n▁d': 0.753167,
         'n▁e': 0.494501,
         'n▁o': 0.352787,
         'n▁w': 0.380068,
         'on▁': -0.307563,
         'oor': 0.511506,
         'ord': 0.42064,
         'os▁': -0.446016,
         'ren': 0.444131,
         's▁a': -0.350135,
         's▁d': -0.36425,
         't▁m': 0.376378,
         '▁aa': 0.274697,
         '▁an': -0.356577,
         '▁co': -0.391087,
         '▁di': 0.56448,
         '▁he': 0.578521,
         '▁me': 0.505661,
         '▁pa': -0.274485,
         '▁qu': -0.312683,
         '▁un': -0.342044,
         '▁we': 0.366834,
         '▁wo': 0.553055}),
 'pt': (-1.805513,
        {'am▁': 0.44028,
         'as▁': 1.610607,
         'a▁c': 0.373178,
         'a▁d': 0.327565,
         'a▁e': 0.413134,
         'a▁f': 0.36524,
         'cas': 0.414987,
         'com': 0.323039,
         'do▁': 0.355744,
         'em▁': 0.73028,
         'en▁': -1.137666,
         'es▁': -0.440545,
         'e▁c': 0.502947,
         'lha': 0.450979,
         'mas': 0.411408,
         'ma▁': 0.379648,
         'mos': 0.360291,
         'm▁u': 0.441978,
         'nca': 0.508337,
         'on▁': -0.313783,
         'os▁': 1.196129,
         'o▁p': 0.342564,
         'pel': 0.355928,
         'que': 0.327883,
         'ria': 0.469729,
         's▁a': 0.455898,
         's▁d': 0.597708,
         's▁p': 0.588938,
         's▁u': 0.307804,
         'uma': 0.471489,
         '▁co': 0.407267,
         '▁da': 0.458056,
         '▁do': 0.480845,
         '▁os': 0.469412,
         '▁pe': 0.568328,
         '▁um': 0.742065})}


_TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _hit_count(words_expr: str, lexicon: list[str]) -> str:
    """SQL count of tokens contained in the lexicon.

    Membership is written ``w IN (...)`` — not
    ``array_contains(array(...), w)`` — so Catalyst's OptimizeIn rule
    rewrites the literal list to an ``InSet`` hash lookup; the array
    form is an O(|lexicon|) scan per token per language, measured
    ~15× slower on the sf0.1 trigram gate."""
    arr = ", ".join(f"'{w}'" for w in lexicon)
    return f"size(filter({words_expr}, w -> w in ({arr})))"


def _lexicon_lang_exprs(text_col: str):
    """(score Columns aliased ``__s_<lang>``, pred Column over them,
    best Column over them) — the lexicon-hit scorer shared by
    :func:`language_id` and ``with_language(method='lexicon')``, the
    same materialize-before-argmax shape as :func:`_ngram_lang_exprs`
    (inlining each score into every CASE arm and the ``greatest()``
    re-ran the hit scan ~8× per language)."""
    words = f"split(lower({text_col}), ' ')"
    n = f"size({words})"
    score_cols = [
        F.expr(
            f"round({_hit_count(words, lex)} / cast({n} as double), 6)"
        ).alias(f"__s_{lang}")
        for lang, lex in LANG_LEXICON.items()
    ]
    langs = list(LANG_LEXICON)
    best = F.greatest(*[F.col(f"__s_{la}") for la in langs])
    pred = F.when(F.lit(False), F.lit(None))
    for la in langs:
        pred = pred.when(F.col(f"__s_{la}") == best, F.lit(la))
    return score_cols, pred, best


def language_id(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, predicted_lang, lang_score): argmax of lexicon-hit ratios.

    Deterministic tiebreak: higher score wins, then lexicon declaration
    order (en, fr, es, de). Score = hits / token count, rounded.
    """
    score_cols, pred, best = _lexicon_lang_exprs(text_col)
    return (
        docs.select(F.col(id_col), *score_cols)
        .select(
            F.col(id_col),
            pred.alias("predicted_lang"),
            best.alias("lang_score"),
        )
    )


def language_id_ngram(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, predicted_lang, lang_score): character-trigram profile
    scoring over 7 languages — the second rung above
    :func:`language_id`'s whole-word lexicon.

    Each language's profile is the trigram set of its space-padded
    function words (:data:`LANG_TRIGRAM_PROFILES`, Cavnar &
    Trenkle-style membership profiles); a document scores
    ``|doc trigrams ∩ profile| / |doc trigrams|`` per language
    (multiset over the doc's trigram stream, so frequent function
    words weigh more), argmax with the deterministic declaration-order
    tiebreak. Trigram membership generalizes where exact word lookup
    fails — inflected forms ('les', 'chats') still hit ' le'/'es '
    style boundary trigrams — while staying a pure map-side column
    program: zero shuffle, zero Python, profiles are literal arrays
    (a few hundred entries per language, the literal-codebook pattern
    of ``similarity.assign_clusters``).
    """
    trigrams, score_cols, pred, best = _ngram_lang_exprs(text_col)
    return (
        docs.select(F.col(id_col), trigrams.alias("__t3"))
        .select(F.col(id_col), *score_cols)
        .select(
            F.col(id_col),
            pred.alias("predicted_lang"),
            best.alias("lang_score"),
        )
    )


def _ngram_lang_exprs(text_col: str):
    """(trigram Column, per-language score Columns aliased
    ``__s_<lang>``, pred Column over the score columns, best Column
    over them) — the trigram-profile scorer as reusable expressions,
    so callers (``language_id_ngram``, curation's detect_language)
    stay map-side without an id-keyed join back. Three stacked
    projections, each consuming the previous one's helper columns:
    trigrams → scores → argmax.

    Two measured hot-path choices (together 21.6 → 1.9 s on the sf0.1
    gate):

    * Trigrams slide over a per-document CHAR ARRAY bound once as a
      lambda variable (``transform(array(split(s, '')), cs -> ...)``
      — code-point safe: Java regex zero-width matches cannot split
      a surrogate pair) instead of calling ``substring(s, i, 3)`` per
      position: UTF8String.substring locates code point i by
      scanning from the start, making the per-index form O(len²) per
      document. ``slice`` + ``concat_ws`` reproduces the short
      boundary gram of the substring form exactly, so scores are
      bit-identical to the DuckDB oracle's ``substr`` replay.
      (Bit-parity relies on Spark ≥ 3.4 empty-pattern split semantics
      — no trailing '' element, SPARK-40194; the engine targets
      Spark 4.)
    * Profile membership is an IN-list (Catalyst's OptimizeIn turns
      ≥10 literals into an ``InSet`` hash probe), not
      ``array_contains`` over a literal array (an O(|profile|) scan
      per trigram per language); and each language's score is
      materialized ONCE as a ``__s_<lang>`` column before the
      argmax, instead of re-inlining the score expression into every
      CASE arm and the ``greatest``."""
    s = f"concat(' ', lower({text_col}), ' ')"
    tris = (
        f"flatten(transform(array(split({s}, '')),"
        f" cs -> transform(sequence(1, greatest(size(cs) - 2, 1)),"
        f" i -> concat_ws('', slice(cs, i, 3)))))"
    )
    score_cols = []
    for lang, prof in LANG_TRIGRAM_PROFILES.items():
        arr = ", ".join("'" + t + "'" for t in prof)
        score_cols.append(
            F.expr(
                f"round(size(filter(__t3, t -> t in ({arr})))"
                f" / cast(size(__t3) as double), 6)"
            ).alias(f"__s_{lang}")
        )
    langs = list(LANG_TRIGRAM_PROFILES)
    best = F.greatest(*[F.col(f"__s_{la}") for la in langs])
    pred = F.when(F.lit(False), F.lit(None))
    for la in langs:
        pred = pred.when(F.col(f"__s_{la}") == best, F.lit(la))
    return F.expr(tris), score_cols, pred, best


def char_ngram_text_sql(text_col: str, n: int = 3) -> str:
    """SQL for the character-n-gram FEATURE TEXT of a document: the
    space-padded, lowercased sliding n-grams of ``text_col``, joined
    by single spaces with in-gram spaces rendered ``▁`` so the
    bag-of-words tokenizer (``split(..., ' ')``) recovers exactly one
    token per n-gram. This is the shared feature definition between
    ``training.train_language_classifier`` (which trains on it) and
    :func:`language_id_model` (which scores with it) — they must
    never drift, so both call this.

    Same O(len) construction as :func:`_ngram_lang_exprs`: the char
    array is bound once as a lambda variable instead of a per-index
    ``substring`` scan (which is O(len²) per document); ``slice`` +
    ``concat_ws`` keeps gram values — including the short boundary
    gram of a sub-n-length document — identical to the substring
    form, so trained weights and the DuckDB oracles are unaffected."""
    s = f"concat(' ', lower({text_col}), ' ')"
    return (
        f"array_join(flatten(transform(array(split({s}, '')),"
        f" cs -> transform(sequence(1, greatest(size(cs) - {n - 1}, 1)),"
        f" i -> translate(concat_ws('', slice(cs, i, {n})), ' ', '▁')))),"
        f" ' ')"
    )


def _mapping_ngram(model) -> int:
    """Recover the n-gram size a literal mapping form was trained
    with: a full ``char_ngram_text_sql`` feature is exactly ``n``
    characters (in-gram spaces rendered ``▁``), so the LONGEST key
    carries it — the mapping drops the model's ``ngram`` field, and
    scoring with the wrong n would silently miss every feature and
    predict bias-only. Shorter keys are legitimate boundary grams of
    the same space (a document shorter than n-2 chars emits one
    sub-n gram), and scoring at n reproduces those same short grams
    for the same short documents, so max is exact — not a
    heuristic — whenever at least one full-length feature survived
    distillation."""
    lens = {len(w) for _, ws in model.values() for w in ws}
    return max(lens) if lens else 3


def _langid_literal_cols(model, ftext: str):
    """(per-language probability Columns aliased ``__p_<lang>``, pred
    Column over them, best-prob Column over them) for the literal
    mapping form ``{lang: (bias, {feature: weight})}`` over the
    feature-text SQL ``ftext`` — map-side, zero shuffle (the
    :func:`_literal_score_prob` pattern, per language). Callers
    materialize the probability columns in one projection and argmax
    over the column references in the next, so each literal-map
    aggregate runs once per row instead of once per CASE arm plus
    once inside the ``greatest``."""
    prob_cols = []
    langs = list(model)
    for lang, (bias, weights) in model.items():
        _, prob = _literal_score_prob(weights, bias, True, ftext)
        prob_cols.append(prob.alias(f"__p_{lang}"))
    # backtick-quoted: model keys are user data and may contain dots,
    # which unquoted F.col would parse as nested-field access
    refs = [F.col(f"`__p_{la}`") for la in langs]
    best = F.greatest(*refs) if len(refs) > 1 else refs[0]
    pred = F.when(F.lit(False), F.lit(None))
    for la in langs:
        pred = pred.when(F.col(f"`__p_{la}`") == best, F.lit(la))
    return prob_cols, pred, best


def language_id_model(
    docs: DataFrame,
    model,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_literal_vocab: int = 256,
    max_broadcast_vocab: int = 2_000_000,
) -> DataFrame:
    """(id, predicted_lang, lang_score): the TRAINED third rung of
    language ID — per-language one-vs-rest linear scores over
    character-n-gram features, argmax with the model's declared
    language order as the deterministic tiebreak (first listed wins).
    ``lang_score`` is the winning language's sigmoid probability,
    rounded to 6 decimals (so literal and join paths agree bit-for-bit
    and the DuckDB oracle can replay it).

    ``model`` is a ``training.LanguageIdModel`` or its literal mapping
    form ``{lang: (bias, {feature: weight})}`` (from
    ``training.top_features`` / ``LanguageIdModel.as_literal`` or
    :data:`PINNED_LANGID_MODEL`). The mapping form's n-gram size is
    recovered from its feature-key lengths (every
    ``char_ngram_text_sql`` feature is exactly n characters), so a
    4-gram-trained distilled model scores with 4-grams — never
    silently with the default 3.

    Scale shape, chosen by the measured total vocabulary (the
    :func:`linear_text_score` pattern): a mapping under
    ``max_literal_vocab`` total features inlines as literal SQL maps —
    pure map-side projection, zero shuffle, the form
    ``curation.map_side_curation`` and streaming ingest require;
    larger models run ONE n-gram explode → (lang, word, weight) join
    (broadcast under ``max_broadcast_vocab``, shuffle join above) →
    per-doc pivot over the bounded language list → the same argmax.
    Both paths produce identical predictions (test-asserted).
    """
    from collections.abc import Mapping as _Mapping

    if isinstance(model, _Mapping):
        # the mapping form drops the ngram field; the feature keys
        # carry it (and the form is average-normalized by convention,
        # enforced at distill time by training.top_features/as_literal)
        ftext = char_ngram_text_sql(text_col, _mapping_ngram(model))
        average = True
        total = sum(len(w) for _, w in model.values())
        if total <= max_literal_vocab:
            prob_cols, pred, best = _langid_literal_cols(
                model, "__ftext"
            )
            drop = [c for c in ("__ftext",) if c in docs.columns]
            return (
                docs.drop(*drop)
                .withColumn("__ftext", F.expr(ftext))
                .select(F.col(id_col), *prob_cols)
                .select(
                    F.col(id_col),
                    pred.alias("predicted_lang"),
                    best.alias("lang_score"),
                )
            )
        languages = list(model)
        spark = docs.sparkSession
        weights = spark.createDataFrame(
            [
                (lang, w, float(x))
                for lang, (_, ws) in model.items()
                for w, x in ws.items()
            ],
            "lang string, word string, weight double",
        )
        biases = {lang: float(b) for lang, (b, _) in model.items()}
        n_vocab = total  # known driver-side — no re-measuring job
    else:
        languages = list(model.languages)
        weights = model.weights
        biases = dict(model.biases)
        average = bool(model.average)
        ftext = char_ngram_text_sql(text_col, int(model.ngram))
        n_vocab = weights.count()  # measured bound, as everywhere else
    w = (
        F.broadcast(weights)
        if n_vocab <= max_broadcast_vocab
        else weights.hint("merge")
    )
    base = docs.select(
        F.col(id_col),
        F.expr(f"split({ftext}, ' ')").alias("__grams"),
    )
    sums = (
        base.select(id_col, F.explode("__grams").alias("word"))
        .join(w, on="word", how="inner")
        .groupBy(id_col)
        .pivot("lang", languages)
        .agg(F.sum("weight"))
    )
    scored = base.select(
        id_col, F.expr("size(__grams)").cast("double").alias("__n")
    ).join(sums, on=id_col, how="left")
    probs: list[tuple[str, object]] = []
    for lang in languages:
        contrib = F.coalesce(F.col(f"`{lang}`"), F.lit(0.0))
        if average:
            contrib = contrib / F.col("__n")
        score = F.round(F.lit(biases[lang]) + contrib, 6)
        probs.append(
            (
                lang,
                F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-score)), 6),
            )
        )
    best = F.greatest(*[p for _, p in probs]) if len(probs) > 1 else probs[0][1]
    pred = F.when(F.lit(False), F.lit(None))
    for lang, p in probs:
        pred = pred.when(p == best, F.lit(lang))
    return scored.select(
        F.col(id_col),
        pred.alias("predicted_lang"),
        best.alias("lang_score"),
    )


def with_language(
    docs: DataFrame,
    *,
    method: str = "ngram",
    text_col: str = "text",
    lang_col: str = "lang",
    model=None,
) -> DataFrame:
    """``docs`` with ``lang_col`` (over)written by the predicted
    language — the attach-in-place face of :func:`language_id` /
    :func:`language_id_ngram` for pipelines whose input has no (or an
    untrusted) language column. Two projections, zero shuffle, zero
    join: the trigram stream is materialized once in a helper column
    and dropped.

    ``method="model"`` attaches the TRAINED rung's prediction
    (:func:`language_id_model`) and requires ``model`` in the literal
    mapping form under the map-side bound — this face must stay
    shuffle-free (it is what ``curation.map_side_curation`` and
    streaming ingest call), so a DataFrame-weights model belongs to
    the batch scorer, distilled first via ``training.top_features``."""
    if method == "model":
        from collections.abc import Mapping as _Mapping

        if not isinstance(model, _Mapping):
            raise ValueError(
                "with_language(method='model') needs the literal "
                "mapping form {lang: (bias, {feature: weight})} — "
                "distill a trained model with training.top_features"
            )
        total = sum(len(w) for _, w in model.values())
        if total > 256:
            raise ValueError(
                f"model has {total} features, above the map-side "
                "literal bound (256); distill with a smaller k or "
                "score in batch via language_id_model"
            )
        prob_cols, pred, _ = _langid_literal_cols(model, "__ftext")
        ftext = char_ngram_text_sql(text_col, _mapping_ngram(model))
        helper = ["__ftext"] + [f"__p_{la}" for la in model]
        drop = [c for c in (*helper, lang_col) if c in docs.columns]
        return (
            docs.drop(*drop)
            .withColumn("__ftext", F.expr(ftext))
            .select("*", *prob_cols)
            .withColumn(lang_col, pred)
            .drop(*helper)
        )
    if model is not None:
        raise ValueError(
            f"model= is only meaningful with method='model', got "
            f"method={method!r}"
        )
    if method == "ngram":
        trigrams, score_cols, pred, _ = _ngram_lang_exprs(text_col)
        helper = ["__t3"] + [f"__s_{la}" for la in LANG_TRIGRAM_PROFILES]
        drop = [c for c in (*helper, lang_col) if c in docs.columns]
        return (
            docs.drop(*drop)
            .withColumn("__t3", trigrams)
            .select("*", *score_cols)
            .withColumn(lang_col, pred)
            .drop(*helper)
        )
    if method == "lexicon":
        score_cols, pred, _ = _lexicon_lang_exprs(text_col)
        helper = [f"__s_{la}" for la in LANG_LEXICON]
        drop = [c for c in (*helper, lang_col) if c in docs.columns]
        return (
            docs.drop(*drop)
            .select("*", *score_cols)
            .withColumn(lang_col, pred)
            .drop(*helper)
        )
    raise ValueError(f"unknown language-id method: {method!r}")


def _repetition_exprs(text_col: str) -> list[tuple[str, str]]:
    """(alias, SQL expr) pairs for the Gopher-style repetition features.

    All three are computed from the word array of one row — map-side,
    shuffle-free (Rae et al. 2021 'Gopher' §A.1 repetition filters):

    * ``dup_word_fraction``   — 1 - distinct/total words; linearithmic.
    * ``dup_bigram_fraction`` — same over adjacent word bigrams.
    * ``top_word_fraction``   — occurrences of the modal word / total.
      O(distinct × n) per document via a filter scan per distinct word;
      fine for natural-language vocabularies (distinct ≪ n for the
      repetitive docs this filter targets). For adversarially long
      all-distinct documents the scalable form is explode + two-level
      groupBy (one shuffle) — this map-side form is chosen because the
      filter runs per-row over 100 TB where a shuffle costs more than
      the per-doc scan.
    """
    ws = f"split(lower({text_col}), ' ')"
    n = f"size({ws})"
    bi = (
        f"zip_with(slice({ws}, 1, {n} - 1), slice({ws}, 2, {n} - 1),"
        f" (a, b) -> concat(a, ' ', b))"
    )
    top = (
        f"array_max(transform(array_distinct({ws}),"
        f" w -> size(filter({ws}, x -> x = w))))"
    )
    return [
        (
            "dup_word_fraction",
            f"round(1.0 - size(array_distinct({ws})) / cast({n} as double), 6)",
        ),
        (
            "dup_bigram_fraction",
            f"round(CASE WHEN {n} >= 2 THEN"
            f" 1.0 - size(array_distinct({bi})) / cast({n} - 1 as double)"
            f" ELSE 0.0 END, 6)",
        ),
        (
            "top_word_fraction",
            f"round({top} / cast({n} as double), 6)",
        ),
    ]


def repetition_metrics(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, dup_word_fraction, dup_bigram_fraction, top_word_fraction).

    Gopher-style repetition quality filters (see
    :func:`_repetition_exprs`); a document whose mass concentrates in
    few repeated words/bigrams is boilerplate or spam and these are the
    standard drop signals.
    """
    return docs.select(
        F.col(id_col),
        *[F.expr(e).alias(a) for a, e in _repetition_exprs(text_col)],
    )


def quality_score(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    include_repetition: bool = False,
) -> DataFrame:
    """Per-document quality features + combined score in [0, 1].

    Features mirror standard corpus-filtering heuristics: document
    length band, mean word length band, stopword ratio. The combined
    score is a fixed-weight sum, rounded for cross-engine stability.
    With ``include_repetition`` the Gopher repetition features are
    appended in the same single map-side projection (no join).
    """
    exprs = _quality_exprs(text_col, include_repetition)
    return docs.select(
        F.col(id_col), *[F.expr(e).alias(a) for a, e in exprs]
    )


def _quality_exprs(
    text_col: str, include_repetition: bool
) -> list[tuple[str, str]]:
    """(alias, SQL expr) pairs of the quality/repetition features —
    shared by :func:`quality_score` (projection face) and
    ``curation.map_side_curation`` (attach-in-place face, usable on a
    streaming frame with no join)."""
    words = f"split(lower({text_col}), ' ')"
    n_words = f"size({words})"
    stop_ratio = (
        f"{_hit_count(words, LANG_LEXICON['en'])} / cast({n_words} as double)"
    )
    mean_word_len = (
        f"(length(replace({text_col}, ' ', ''))) / cast({n_words} as double)"
    )
    len_ok = f"CASE WHEN {n_words} >= 10 AND {n_words} <= 100000 THEN 1.0 ELSE 0.0 END"
    wlen_ok = f"CASE WHEN {mean_word_len} >= 2 AND {mean_word_len} <= 12 THEN 1.0 ELSE 0.0 END"
    stop_ok = f"CASE WHEN {stop_ratio} >= 0.01 THEN 1.0 ELSE 0.0 END"
    exprs = [
        ("n_words", n_words),
        ("mean_word_len", f"round({mean_word_len}, 6)"),
        ("stopword_ratio", f"round({stop_ratio}, 6)"),
        (
            "quality",
            f"round(cast(0.4 * {len_ok} + 0.3 * {wlen_ok} + 0.3 * {stop_ok}"
            f" as double), 6)",
        ),
    ]
    if include_repetition:
        exprs.extend(_repetition_exprs(text_col))
    return exprs


def token_counts(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_ws_tokens, n_regex_tokens, chars_per_token).

    n_ws_tokens: single-space split arity. n_regex_tokens: BPE-ish
    pre-tokenization — maximal letter runs, digit runs, and individual
    non-alphanumeric marks — the standard proxy for LLM token budgeting.
    """
    return docs.select(
        F.col(id_col),
        F.expr(f"size(split(lower({text_col}), ' '))").alias("n_ws_tokens"),
        F.expr(
            f"size(regexp_extract_all(lower({text_col}), '{_TOKEN_REGEX}', 0))"
        ).alias("n_regex_tokens"),
        F.expr(
            f"round(length({text_col}) / cast(size(split(lower({text_col}),"
            f" ' ')) as double), 6)"
        ).alias("chars_per_token"),
    )


#: PII patterns, ordered: earlier patterns are redacted first, so the
#: SSN pattern wins over the phone pattern on xxx-xx-xxxx strings.
#: Restricted to constructs with identical Java-regex / RE2 semantics
#: (classes, bounded repeats, \\b word boundaries) so any SQL engine
#: with regexp_replace reproduces the output byte-for-byte.
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"),
]


def redact_pii(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, text_redacted, n_email, n_ipv4, n_ssn, n_phone).

    Pre-training PII scrub: each match is replaced by ``<TYPE>`` and
    counted (counts audit scrub coverage per shard). Map-side chained
    ``regexp_replace`` — shuffle-free at any scale. Redaction order
    follows :data:`PII_PATTERNS`; counts are measured on the original
    text, so a string matching several patterns reports under each.
    """
    redacted, counts = _redact_columns(text_col)
    return docs.select(
        F.col(id_col), redacted.alias("text_redacted"), *counts
    )


def _redact_columns(text_col: str):
    """(redacted Column, [count Columns]) — shared by
    :func:`redact_pii` and ``curation.map_side_curation``."""
    redacted = F.col(text_col)
    counts = []
    for name, pat in PII_PATTERNS:
        counts.append(
            F.size(
                F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
            ).alias(f"n_{name}")
        )
        redacted = F.regexp_replace(redacted, pat, f"<{name.upper()}>")
    return redacted, counts


def unigram_logprob_score(
    docs: DataFrame,
    *,
    vocab: DataFrame | None = None,
    alpha: float = 0.5,
    min_count: int = 1,
    max_broadcast_vocab: int = 2_000_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, avg_logprob): mean log10 unigram probability of
    each document's tokens — the LM-perplexity quality signal of
    CCNet-style filtering (documents whose tokens are improbable under
    a reference LM are gibberish/noise; here the LM is unigram, the
    engine-friendly first rung).

    ``vocab`` is an optional (word, count) frame from a reference
    corpus; by default the LM is learned from ``docs`` itself
    (self-scoring: spot outlier documents against their own corpus).
    Probabilities are add-alpha smoothed over V+1 outcomes (the +1 is
    the OOV bucket), so unseen words score finitely:
    P(w) = (count(w) + alpha) / (N + alpha * (V + 1)).

    Scale shape: the LM build is one explode + word-keyed count
    (partially aggregated); the vocab DF is PERSISTED across its two
    consumers — the N/V totals scalar job and the scoring join — so
    the corpus is scanned once for the LM, not twice. Scoring joins
    the exploded token stream to the vocabulary; the join side is
    adaptive on the MEASURED vocabulary size (the ``dedup_clusters``/
    ``assign_ids`` pattern): broadcast when the kept vocabulary is
    under ``max_broadcast_vocab`` entries (stopword-skewed keys land
    on the broadcast side, never concentrating a shuffle partition),
    plain shuffle join above it — a web-scale distinct-token set is
    unbounded and must never be forced into executor memory. Then one
    per-doc mean. Token order never matters, so no window, no sort.

    ``min_count`` prunes the scoring vocabulary: words below it score
    as OOV (count 0 + alpha smoothing — the standard unigram-LM prune;
    rare words score near-OOV anyway). N and V are measured BEFORE the
    prune so probabilities stay those of the full LM; ``min_count=1``
    (default) is exact.
    """
    ws = f"split(lower({text_col}), ' ')"
    if vocab is None:
        vocab = (
            docs.select(F.explode(F.expr(ws)).alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("count"))
        )
    # One materialization serves the totals job AND the scoring join
    # (the r4 regression was this exact DF rebuilt from scratch for
    # each — ~3 corpus scans per call). Stays cached for reuse across
    # calls in a session; eviction is Spark's LRU.
    vocab = vocab.persist()
    totals = vocab.agg(
        F.sum("count").alias("n"),
        F.count(F.lit(1)).alias("v"),
        F.count(F.when(F.col("count") >= min_count, 1)).alias("v_kept"),
    ).first()
    n_total = float(totals["n"] or 0)
    v_size = float(totals["v"] or 0)
    v_kept = int(totals["v_kept"] or 0)
    denom = n_total + alpha * (v_size + 1.0)
    lm = (
        vocab.filter(F.col("count") >= min_count)
        if min_count > 1
        else vocab
    )
    # measured-bound adaptive join: the hint pins the plan either way
    # (a stats-blind estimate must not pick broadcast for an unbounded
    # vocabulary)
    lm = F.broadcast(lm) if v_kept <= max_broadcast_vocab else lm.hint("merge")
    toks = docs.select(
        F.col(id_col), F.explode(F.expr(ws)).alias("word")
    )
    scored = toks.join(lm, on="word", how="left").select(
        F.col(id_col),
        F.log10(
            (F.coalesce(F.col("count"), F.lit(0)).cast("double") + alpha)
            / F.lit(denom)
        ).alias("_lp"),
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("_lp"), 6).alias("avg_logprob"),
    )


#: Accent-fold table for :func:`normalize_text` — an explicit literal
#: mapping (not locale collation) so any engine reproduces it
#: byte-for-byte. Lowercase only: folding runs after lowercasing.
_ACCENT_SRC = "àáâãäåçèéêëìíîïñòóôõöøùúûüýÿ"
_ACCENT_DST = "aaaaaaceeeeiiiinoooooouuuuyy"

#: ASCII punctuation as explicit ranges — identical semantics in Java
#: regex (Spark) and RE2 (DuckDB etc.), unlike \p{Punct}/[[:punct:]]
#: whose class membership differs between engines.
_PUNCT_CLASS = r"[!-/:-@\[-`{-~]"


def normalize_text(
    docs: DataFrame,
    *,
    lowercase: bool = True,
    fold_accents: bool = False,
    strip_punctuation: bool = False,
    fold_digits: bool = False,
    collapse_whitespace: bool = True,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, text_norm): deterministic text normalization — the CCNet
    hashing prelude (lowercase, accent fold, punctuation strip, digit
    fold, whitespace collapse) as one map-side column program.

    Dedup hashes computed on raw text miss case/punctuation variants
    of the same content; the published pipelines normalize BEFORE
    hashing and keep the raw text for training. Compose accordingly:
    ``exact_duplicates(normalize_text(docs).withColumnRenamed(
    "text_norm", "text"))`` finds the variants, the raw corpus stays
    untouched.

    Every rule is an explicit literal (the accent table, ASCII-range
    punctuation class, space-class whitespace) rather than a locale or
    engine-defined character class, so the output is reproducible
    across engines — the property every downstream hash depends on.
    Punctuation is replaced by a space (not deleted: deleting glues
    ``end.Start`` into one token) and the final collapse de-dupes the
    spaces; digits fold to ``0`` so version strings/ids hash alike.
    """
    out = F.col(text_col)
    if lowercase:
        out = F.lower(out)
    if fold_accents:
        out = F.translate(out, _ACCENT_SRC, _ACCENT_DST)
    if strip_punctuation:
        out = F.regexp_replace(out, _PUNCT_CLASS, " ")
    if fold_digits:
        out = F.regexp_replace(out, "[0-9]", "0")
    if collapse_whitespace:
        out = F.trim(F.regexp_replace(out, "[ \\t\\n\\r]+", " "))
    return docs.select(F.col(id_col), out.alias("text_norm"))


def bigram_logprob_score(
    docs: DataFrame,
    *,
    alpha: float = 0.5,
    min_count: int = 1,
    max_broadcast_vocab: int = 2_000_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_bigrams, avg_logprob): mean log10 conditional bigram
    probability — the next rung above :func:`unigram_logprob_score`
    on the CCNet perplexity ladder (real CCNet uses a 5-gram KenLM;
    unigram scores word choice, bigram starts scoring word ORDER, so
    shuffled/templated text that fools the unigram rung scores low
    here).

    P(w2|w1) = (count(w1 w2) + alpha) / (count(w1) + alpha * (V + 1))
    with add-alpha smoothing over V+1 outcomes (the +1 is OOV), V the
    unigram vocabulary size; both LMs are learned from ``docs`` itself
    (self-scoring). Documents with fewer than two tokens have no
    bigrams and return ``n_bigrams = 0`` with a null ``avg_logprob``.

    Scale shape (the unigram operator's charter): bigram extraction is
    a map-side ``transform`` over the token array (no self-join);
    both count tables are persisted across their consumers; scoring
    is two left joins — bigram counts on (w1, w2), unigram counts on
    w1 for the denominator — each adaptive on its MEASURED size
    (broadcast under ``max_broadcast_vocab``, shuffle join above; a
    web-scale bigram table is unbounded and must never be forced into
    executor memory). ``min_count`` prunes the bigram table only
    (pruned bigrams score as unseen); V and the unigram denominators
    stay exact.
    """
    ws = f"split(lower({text_col}), ' ')"
    pairs_expr = (
        f"transform(slice({ws}, 1, greatest(size({ws}) - 1, 0)),"
        f" (x, i) -> struct(x AS w1, element_at({ws}, i + 2) AS w2))"
    )
    bigrams = docs.select(
        F.col(id_col), F.explode(F.expr(pairs_expr)).alias("_bg")
    ).select(id_col, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))

    uni = (
        docs.select(F.explode(F.expr(ws)).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("_c1"))
        .persist()
    )
    bi = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("_c12"))
        .persist()
    )
    v_size = float(uni.count())
    bi_kept = bi.filter(F.col("_c12") >= min_count) if min_count > 1 else bi
    n_bi = bi_kept.count()  # measured bounds for both join sides
    bi_side = (
        F.broadcast(bi_kept)
        if n_bi <= max_broadcast_vocab
        else bi_kept.hint("merge")
    )
    uni_side = (
        F.broadcast(uni)
        if v_size <= max_broadcast_vocab
        else uni.hint("merge")
    )
    denom = F.coalesce(F.col("_c1"), F.lit(0)).cast("double") + F.lit(
        alpha
    ) * F.lit(v_size + 1.0)
    scored = (
        bigrams.join(bi_side, on=["w1", "w2"], how="left")
        .join(uni_side, on="w1", how="left")
        .select(
            F.col(id_col),
            F.log10(
                (
                    F.coalesce(F.col("_c12"), F.lit(0)).cast("double")
                    + F.lit(alpha)
                )
                / denom
            ).alias("_lp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("_lp"), 6).alias("avg_logprob"),
    )
    # docs with < 2 tokens produce no bigram rows; restore them with
    # n_bigrams = 0 so the output covers the corpus
    return (
        docs.select(id_col)
        .join(per_doc, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            "avg_logprob",
        )
    )


def strip_boilerplate_lines(
    docs: DataFrame,
    *,
    min_doc_freq: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_delim: str = "\n",
    max_broadcast_lines: int = 200_000,
) -> DataFrame:
    """(id, text_clean, n_lines, n_removed): cross-document line-level
    dedup — lines appearing in >= ``min_doc_freq`` distinct documents
    are boilerplate (headers, footers, nav bars, license blurbs) and
    are stripped; the remaining lines rejoin in original order.

    The line-granularity counterpart of the document-level dedup
    family (CCNet / RefinedWeb-style curation runs both): document
    dedup drops whole near-copies, this removes the shared scaffolding
    inside otherwise-distinct pages.

    Physical shape for 100 TB: one explode to line granularity feeds
    the document-frequency count (two line-keyed shuffles with
    map-side partial aggregation — only (line, doc) pairs move, never
    text). The hot-line set is then MEASURED (the ``dedup_clusters``/
    ``assign_ids`` adaptive pattern — "boilerplate is tiny" is an
    assumption, not a bound, and ``min_doc_freq=2`` on a web corpus is
    not tiny):

    * ``<= max_broadcast_lines`` hot lines: fold to ONE row holding
      the hot set hash-bucketed into ~``n_hot/64`` power-of-two
      buckets (``array<array<string>>``), broadcast onto the doc
      scan; each line's membership probe is one ``xxhash64`` + an
      O(64) in-bucket scan (a flat array_contains would be an
      O(n_hot) scan per line — 200k string compares at the bound),
      and reconstruction is a per-row ``filter`` over the split —
      document text never crosses a shuffle.
    * larger: explode-and-regroup — per-(doc, position) lines anti-join
      the hot set (shuffle hash/merge join, forced: a mis-estimated
      broadcast of an unbounded set is an OOM, not a slow query), then
      kept lines regroup per document in position order. Text crosses
      the shuffle here; that is the price of a corpus-proportional
      boilerplate set, paid only when measured.

    Both paths return identical rows. Empty documents come back as
    empty strings (never null) so sinks need no null handling.
    """
    ls = F.split(F.col(text_col), line_delim)
    lines = docs.select(
        F.col(id_col),
        F.posexplode(ls).alias("_pos", "_line"),
    )
    hot = (
        lines.select(id_col, "_line")
        .distinct()
        .groupBy("_line")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= min_doc_freq)
        .select("_line")
        .persist()
    )
    n_hot = hot.count()

    if n_hot <= max_broadcast_lines:
        # hash-bucketed broadcast set: a flat collect_list probed with
        # array_contains is an O(n_hot) scan PER LINE (12.8M string
        # compares per 64-line doc at the 200k bound); bucketing by
        # xxhash64 into ~n_hot/64 power-of-two buckets makes each
        # probe one hash + an O(64) in-bucket scan, still exact, still
        # one broadcast row; the bucket groupBy adds one HOT-SET-sized
        # exchange (<= max_broadcast_lines rows), nothing corpus-sized.
        nb = 1 << (n_hot // 64).bit_length()
        hot_arr = (
            hot.groupBy(
                F.pmod(F.xxhash64("_line"), F.lit(nb)).alias("_b")
            )
            .agg(F.collect_list("_line").alias("_bls"))
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct("_b", "_bls"))
                ).alias("_m")
            )
            .select(
                F.expr(
                    # try_element_at: ANSI-mode-neutral missing-key
                    # lookup (plain element_at raises under ANSI)
                    f"transform(sequence(0, {nb - 1}), b ->"
                    f" coalesce(try_element_at(_m, cast(b as bigint)),"
                    f" cast(array() as array<string>)))"
                ).alias("_hot")
            )
        )
        kept = F.filter(
            ls,
            lambda l: ~F.array_contains(
                F.get(
                    F.col("_hot"),
                    F.pmod(F.xxhash64(l), F.lit(nb)).cast("int"),
                ),
                l,
            ),
        )
        return (
            docs.crossJoin(F.broadcast(hot_arr))  # one row: the buckets
            .select(
                F.col(id_col),
                F.array_join(kept, line_delim).alias("text_clean"),
                F.size(ls).alias("n_lines"),
                (F.size(ls) - F.size(kept)).alias("n_removed"),
            )
        )

    rebuilt = (
        lines.join(hot.hint("merge"), on="_line", how="left_anti")
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                    lambda s: s["_line"],
                ),
                line_delim,
            ).alias("_clean"),
            F.count(F.lit(1)).alias("_n_kept"),
        )
    )
    return docs.join(rebuilt, on=id_col, how="left").select(
        F.col(id_col),
        F.coalesce(F.col("_clean"), F.lit("")).alias("text_clean"),
        F.size(ls).alias("n_lines"),
        (F.size(ls) - F.coalesce(F.col("_n_kept"), F.lit(0))).cast(
            "int"
        ).alias("n_removed"),
    )


def doc_fingerprints(
    docs: DataFrame,
    *,
    k: int = 4,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, fingerprint): bottom-k md5 shingle hashes, comma-joined.

    A winnowing-style rolling-hash sketch: the k lexicographically
    smallest shingle hashes summarize the document; sketch equality is a
    strong near-identity signal and the sketch is groupable/joinable.
    """
    from haplorec_spark.operators.dedup import word_shingles

    sh = word_shingles(docs, shingle_n, text_col=text_col, id_col=id_col)
    return (
        sh.select(F.col(id_col), F.md5("shingle").alias("h"))
        .groupBy(id_col)
        .agg(
            F.expr(
                f"concat_ws(',', slice(array_sort(collect_list(h)), 1, {k}))"
            ).alias("fingerprint")
        )
    )


def _literal_score_prob(weights, bias, average, text_col):
    """(score, prob) Columns for a literal-map linear classifier —
    shared by :func:`linear_text_score`'s small-vocabulary path and
    ``curation.map_side_curation``'s streaming-safe gate."""
    ws = f"split(lower({text_col}), ' ')"
    n_tok = F.expr(f"size({ws})")
    if weights:
        entries = ", ".join(
            "'" + w.replace("'", "''") + f"', CAST({float(x)!r} AS DOUBLE)"
            for w, x in sorted(weights.items())
        )
        lookup = f"element_at(map({entries}), w)"
    else:
        lookup = "cast(null as double)"
    total = F.expr(
        f"aggregate({ws}, cast(0.0 as double),"
        f" (acc, w) -> acc + coalesce({lookup}, cast(0.0 as double)))"
    )
    score = F.lit(float(bias)) + (
        total / n_tok.cast("double") if average else total
    )
    score = F.round(score, 6)
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-score)), 6)
    return score, prob


def linear_text_score(
    docs: DataFrame,
    weights,
    *,
    bias: float = 0.0,
    average: bool = True,
    max_literal_vocab: int = 256,
    max_broadcast_vocab: int = 2_000_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, score, prob): apply a PRETRAINED linear text
    classifier — the fastText/DCLM-style quality-filter shape, where a
    small model trained offline (e.g. on curated-vs-crawl labels)
    scores the whole corpus inside the engine.

    ``weights`` is the trained word-weight table: a mapping or a
    (word, weight) DataFrame. ``score`` = bias + Σ weight(token)
    (mean instead of sum when ``average``, the fastText bag shape;
    OOV tokens contribute 0 but count in the denominator);
    ``prob`` = sigmoid(score).

    Scale shape, chosen by the MEASURED vocabulary size (the
    :func:`unigram_logprob_score` pattern): a vocabulary under
    ``max_literal_vocab`` inlines as a literal SQL map — pure
    map-side projection, zero shuffle; larger vocabularies run
    explode → weight join (broadcast under ``max_broadcast_vocab``,
    shuffle join above — a classifier vocabulary is usually small,
    but nothing here OOMs if it isn't) → per-doc aggregate. Both
    paths produce identical scores (test-asserted).
    """
    from collections.abc import Mapping as _Mapping

    ws = f"split(lower({text_col}), ' ')"
    n_tok = F.expr(f"size({ws})")
    if isinstance(weights, _Mapping) and len(weights) <= max_literal_vocab:
        score, prob = _literal_score_prob(weights, bias, average, text_col)
        return docs.select(
            F.col(id_col),
            n_tok.alias("n_tokens"),
            score.alias("score"),
            prob.alias("prob"),
        )
    if isinstance(weights, _Mapping):
        weights = docs.sparkSession.createDataFrame(
            list(weights.items()), "word string, weight double"
        )
    n_vocab = weights.count()  # measured bound, as everywhere else
    w = (
        F.broadcast(weights)
        if n_vocab <= max_broadcast_vocab
        else weights.hint("merge")
    )
    toks = docs.select(
        F.col(id_col), F.explode(F.expr(ws)).alias("word")
    )
    agg = (
        toks.join(w, on="word", how="left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce(F.col("weight"), F.lit(0.0))).alias("_t"),
        )
    )
    score = F.lit(float(bias)) + (
        F.col("_t") / F.col("n_tokens").cast("double")
        if average
        else F.col("_t")
    )
    score = F.round(score, 6)
    return agg.select(
        F.col(id_col),
        "n_tokens",
        score.alias("score"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-score)), 6).alias("prob"),
    )


def chunk_documents(
    docs: DataFrame,
    *,
    chunk_size: int = 128,
    stride: int | None = None,
    min_words: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_ix, chunk_start, n_words, chunk_text): fixed word
    windows over each document.

    Training-prep chunking — the complement of
    :func:`~haplorec_spark.operators.packing.pack_sequences` (which
    concatenates SHORT documents up to a budget, this CUTS long ones
    down to it): windows of ``chunk_size`` whitespace words starting
    every ``stride`` words. ``stride < chunk_size`` yields overlapping
    context windows (the usual sliding-window pretraining shape);
    the default ``stride = chunk_size`` tiles without overlap. Windows
    shorter than ``min_words`` (the final partial window of most
    documents) are dropped when ``min_words > 1``.

    Scale shape: one split per row, window starts from ``sequence``,
    ``posexplode`` — pure map-side row expansion, zero shuffle at any
    corpus size, and each output chunk row is bounded by ``chunk_size``
    words regardless of input document length (the property that makes
    downstream per-row work skew-free).
    """
    if stride is None:
        stride = chunk_size
    if chunk_size < 1 or stride < 1 or min_words < 1:
        raise ValueError("chunk_size, stride, min_words must be >= 1")
    ws = f"split({text_col}, ' ')"
    starts = f"sequence(0, greatest(size({ws}) - 1, 0), {stride})"
    exploded = docs.select(
        F.col(id_col),
        F.expr(ws).alias("_ws"),
        F.posexplode(F.expr(starts)).alias("chunk_ix", "chunk_start"),
    ).select(
        F.col(id_col),
        "chunk_ix",
        "chunk_start",
        F.expr(f"slice(_ws, chunk_start + 1, {chunk_size})").alias("_cw"),
    )
    out = exploded.select(
        F.col(id_col),
        "chunk_ix",
        "chunk_start",
        F.size("_cw").alias("n_words"),
        F.array_join("_cw", " ").alias("chunk_text"),
    )
    if min_words > 1:
        out = out.filter(F.col("n_words") >= min_words)
    return out


def perplexity_buckets(
    docs: DataFrame,
    *,
    n_buckets: int = 3,
    vocab: DataFrame | None = None,
    alpha: float = 0.5,
    min_count: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, avg_logprob, ppl_bucket): CCNet-style quality
    tiers from the unigram-LM score.

    CCNet (Wenzek et al. 2020) splits a crawl into head/middle/tail by
    reference-LM perplexity and trains preferentially on the head.
    Bucket 0 holds the HIGHEST ``avg_logprob`` (lowest perplexity —
    cleanest) documents; cut points are the exact ``i/n_buckets``
    quantiles of the corpus score distribution (linear interpolation,
    the same definition as DuckDB's ``quantile_cont``).

    Scale shape: scoring is :func:`unigram_logprob_score` (one LM
    build + one token join); the cuts are ONE ``percentile`` aggregate
    collecting ``n_buckets - 1`` scalars to the driver (bounded, like
    the k-means codebook), and bucket assignment is a map-side CASE
    against those literals — no global sort, no ``ntile`` window over
    the corpus. A document exactly on a cut joins the better bucket.
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    scored = unigram_logprob_score(
        docs,
        vocab=vocab,
        alpha=alpha,
        min_count=min_count,
        text_col=text_col,
        id_col=id_col,
    ).persist()  # reused by the cuts aggregate and the output projection
    qs = ", ".join(
        repr(1.0 - i / n_buckets) for i in range(1, n_buckets)
    )
    cuts = scored.agg(
        F.expr(f"percentile(avg_logprob, array({qs}))").alias("c")
    ).first()["c"]
    bucket = F.lit(n_buckets - 1)
    for i in range(n_buckets - 2, -1, -1):
        bucket = F.when(
            F.col("avg_logprob") >= F.lit(float(cuts[i])), F.lit(i)
        ).otherwise(bucket)
    return scored.select(
        F.col(id_col),
        "n_tokens",
        "avg_logprob",
        bucket.cast("int").alias("ppl_bucket"),
    )


# ------------------------------------------------------ query registration

from haplorec_spark.queries import register, table  # noqa: E402


def _duck_hits(lex: list[str]) -> str:
    arr = ", ".join(f"'{w}'" for w in lex)
    return (
        f"len(list_filter(string_split(lower(text), ' '),"
        f" w -> list_contains([{arr}], w)))"
    )


def _duck_lang_scores() -> list[tuple[str, str]]:
    return [
        (
            lang,
            f"round({_duck_hits(lex)} / len(string_split(lower(text), ' '))::DOUBLE, 6)",
        )
        for lang, lex in LANG_LEXICON.items()
    ]


@register(
    "q_text_language_id",
    (lambda scores: """
    SELECT doc_id,
           CASE """ + " ".join(
        f"WHEN {s} = greatest({', '.join(x for _, x in scores)}) THEN '{lang}'"
        for lang, s in scores
    ) + """ END AS predicted_lang,
           greatest(""" + ", ".join(s for _, s in scores) + """) AS lang_score
    FROM documents
    """)(_duck_lang_scores()),
    "n-gram lexicon language identification with deterministic argmax",
)
def q_text_language_id(spark, sf_dir):
    return language_id(table(spark, sf_dir, "documents"))


@register(
    "q_text_quality",
    f"""
    SELECT doc_id,
           len(string_split(lower(text), ' ')) AS n_words,
           round(length(replace(text, ' ', ''))
                 / len(string_split(lower(text), ' '))::DOUBLE, 6) AS mean_word_len,
           round({_duck_hits(LANG_LEXICON['en'])}
                 / len(string_split(lower(text), ' '))::DOUBLE, 6) AS stopword_ratio,
           round(0.4 * (CASE WHEN len(string_split(lower(text), ' ')) BETWEEN 10 AND 100000
                        THEN 1.0 ELSE 0.0 END)
                 + 0.3 * (CASE WHEN length(replace(text, ' ', ''))
                                    / len(string_split(lower(text), ' '))::DOUBLE
                                    BETWEEN 2 AND 12 THEN 1.0 ELSE 0.0 END)
                 + 0.3 * (CASE WHEN {_duck_hits(LANG_LEXICON['en'])}
                                    / len(string_split(lower(text), ' '))::DOUBLE
                                    >= 0.01 THEN 1.0 ELSE 0.0 END), 6) AS quality,
           round(1.0 - len(list_distinct(string_split(lower(text), ' ')))
                 / len(string_split(lower(text), ' '))::DOUBLE, 6)
               AS dup_word_fraction,
           round(CASE WHEN len(string_split(lower(text), ' ')) >= 2 THEN
                 1.0 - len(list_distinct(list_transform(
                           generate_series(1, len(string_split(lower(text), ' ')) - 1),
                           i -> string_split(lower(text), ' ')[i] || ' '
                                || string_split(lower(text), ' ')[i + 1])))
                     / (len(string_split(lower(text), ' ')) - 1)::DOUBLE
                 ELSE 0.0 END, 6) AS dup_bigram_fraction,
           round(list_max(list_transform(
                     list_distinct(string_split(lower(text), ' ')),
                     w -> len(list_filter(string_split(lower(text), ' '),
                              x -> x = w))))
                 / len(string_split(lower(text), ' '))::DOUBLE, 6)
               AS top_word_fraction,
           lm.avg_logprob
    FROM documents
    JOIN (
        WITH toks AS (SELECT doc_id,
                             unnest(string_split(lower(text), ' ')) AS word
                      FROM documents),
             vocab AS (SELECT word, count(*) AS c FROM toks GROUP BY word),
             tot AS (SELECT sum(c) AS n, count(*) AS v FROM vocab)
        SELECT doc_id,
               round(avg(log10((coalesce(c, 0) + 0.5)
                               / (tot.n + 0.5 * (tot.v + 1)))), 6)
                   AS avg_logprob
        FROM toks LEFT JOIN vocab USING (word) CROSS JOIN tot
        GROUP BY doc_id
    ) lm USING (doc_id)
    """,
    "corpus-filtering quality features, Gopher repetition filters, "
    "combined score, and self-trained unigram-LM log-probability",
)
def q_text_quality(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    q = quality_score(docs, include_repetition=True)
    lm = unigram_logprob_score(docs).select("doc_id", "avg_logprob")
    return q.join(lm, on="doc_id")


#: Fixed query terms for the gate's BM25 column.
_BM25_GATE_TERMS = ["data", "query"]


@register(
    "q_text_token_counts",
    # Per-document token accounting: raw counts, the BM25 weight for a
    # fixed query, and the document's position on the deterministic
    # packing tape (sequence id at seq_len=256). One gate exercises
    # token_counts, bm25_rank, and pack_sequences against one oracle.
    f"""
    WITH w AS (SELECT doc_id, text,
                      string_split(lower(text), ' ') AS ws
               FROM documents),
         s AS (SELECT count(*)::DOUBLE AS n_docs,
                      avg(len(ws))::DOUBLE AS avgdl,
                      sum(list_contains(ws, 'data')::INT)::DOUBLE AS df0,
                      sum(list_contains(ws, 'query')::INT)::DOUBLE AS df1
               FROM w),
         tape AS (SELECT doc_id,
                         (sum(len(ws)::BIGINT) OVER (
                              ORDER BY md5('pack' || chr(31)
                                           || doc_id::VARCHAR)
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW)
                          - len(ws)::BIGINT)::BIGINT AS global_start
                  FROM w)
    SELECT w.doc_id,
           len(ws)::BIGINT AS n_ws_tokens,
           len(regexp_extract_all(lower(text), '{_TOKEN_REGEX}'))::BIGINT
               AS n_regex_tokens,
           round(length(text) / len(ws)::DOUBLE, 6) AS chars_per_token,
           round(  ln(1 + (n_docs - df0 + 0.5) / (df0 + 0.5))
                 * tf0 * 2.2 / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
                 + ln(1 + (n_docs - df1 + 0.5) / (df1 + 0.5))
                 * tf1 * 2.2 / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl)),
               6) AS bm25,
           tape.global_start,
           (tape.global_start // 256)::BIGINT AS seq_id
    FROM (SELECT doc_id, text, ws, len(ws)::DOUBLE AS dl,
                 len(list_filter(ws, x -> x = 'data'))::DOUBLE AS tf0,
                 len(list_filter(ws, x -> x = 'query'))::DOUBLE AS tf1
          FROM w) w JOIN tape USING (doc_id), s
    """,
    "token accounting: whitespace + BPE-ish regex counts, BM25 weight "
    "for a fixed query, and packing-tape position (seq_len=256)",
)
def q_text_token_counts(spark, sf_dir):
    from haplorec_spark.operators.packing import pack_sequences
    from haplorec_spark.operators.relevance import bm25_rank

    docs = table(spark, sf_dir, "documents")
    counts = token_counts(docs)
    bm25 = bm25_rank(docs, _BM25_GATE_TERMS)
    tape = pack_sequences(docs, 256).select(
        "doc_id", "global_start", "seq_id"
    )
    return counts.join(bm25, "doc_id").join(tape, "doc_id")


@register(
    "q_text_fingerprint",
    """
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
               FROM documents),
         sh AS (SELECT DISTINCT doc_id, shingle FROM (
                    SELECT doc_id,
                           unnest(CASE WHEN len(ws) >= 3
                                  THEN list_transform(
                                           generate_series(1, len(ws) - 2),
                                           i -> ws[i] || ' ' || ws[i+1]
                                                      || ' ' || ws[i+2])
                                  ELSE []::VARCHAR[] END) AS shingle
                    FROM w))
    SELECT doc_id,
           array_to_string(list_sort(list(md5(shingle)))[1:4], ',') AS fingerprint
    FROM sh GROUP BY doc_id
    """,
    "bottom-4 md5 shingle sketch (winnowing-style fingerprint)",
)
def q_text_fingerprint(spark, sf_dir):
    return doc_fingerprints(table(spark, sf_dir, "documents"))


@register(
    "q_text_chunks",
    # chunk_size=24 / stride=16: overlapping windows so the gate proves
    # the sliding (not just tiling) shape, and the clamped final
    # partial window per document.
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
               FROM documents),
         s AS (SELECT doc_id, ws,
                      unnest(range(0, greatest(len(ws), 1), 16))
                          AS chunk_start
               FROM w),
         c AS (SELECT doc_id,
                      (chunk_start // 16)::INT AS chunk_ix,
                      chunk_start::INT AS chunk_start,
                      ws[chunk_start + 1 : chunk_start + 24] AS cw
               FROM s)
    SELECT doc_id, chunk_ix, chunk_start,
           len(cw)::INT AS n_words,
           array_to_string(cw, ' ') AS chunk_text
    FROM c
    """,
    "sliding-window word chunking (24-word windows every 16 words, "
    "clamped tail)",
)
def q_text_chunks(spark, sf_dir):
    return chunk_documents(
        table(spark, sf_dir, "documents"), chunk_size=24, stride=16
    )


_CLF_WEIGHTS = {"the": 0.8, "and": 0.3, "data": -0.5, "of": 0.1}


@register(
    "q_text_linear_score",
    """
    WITH toks AS (SELECT doc_id,
                         unnest(string_split(lower(text), ' ')) AS word
                  FROM documents),
         w(word, wt) AS (VALUES ('the', 0.8), ('and', 0.3),
                                ('data', -0.5), ('of', 0.1))
    SELECT doc_id, count(*) AS n_tokens,
           round(0.2 + sum(coalesce(wt, 0.0)) / count(*), 6) AS score,
           round(1.0 / (1.0 + exp(-round(0.2 + sum(coalesce(wt, 0.0))
                                          / count(*), 6))), 6) AS prob
    FROM toks LEFT JOIN w USING (word)
    GROUP BY doc_id
    """,
    "pretrained linear text classifier (fastText/DCLM quality-filter "
    "shape): literal-map weight lookup, mean score + sigmoid",
)
def q_text_linear_score(spark, sf_dir):
    return linear_text_score(
        table(spark, sf_dir, "documents"), _CLF_WEIGHTS, bias=0.2
    )


@register(
    "q_text_normalize",
    # The oracle replays the literal rules: lowercase, accent table
    # (a no-op on the ASCII synthetic corpus, present for rule parity),
    # ASCII-range punctuation -> space, digit fold, whitespace collapse.
    f"""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(regexp_replace(
               translate(lower(text), '{_ACCENT_SRC}', '{_ACCENT_DST}'),
               '[!-/:-@\\[-`{{-~]', ' ', 'g'),
               '[0-9]', '0', 'g'),
               '[ ' || chr(9) || chr(10) || chr(13) || ']+', ' ', 'g'))
               AS text_norm
    FROM documents
    """,
    "deterministic text normalization (the dedup hashing prelude): "
    "lowercase + literal accent fold + punctuation strip + digit fold "
    "+ whitespace collapse, byte-reproducible across engines",
)
def q_text_normalize(spark, sf_dir):
    return normalize_text(
        table(spark, sf_dir, "documents"),
        fold_accents=True,
        strip_punctuation=True,
        fold_digits=True,
    )


def build_vocab(
    docs: DataFrame,
    *,
    size: int = 32768,
    min_count: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """(rank, token, count, fraction, cum_fraction): the top-``size``
    token vocabulary with cumulative corpus coverage — the artifact a
    WordPiece/BPE trainer starts from, and the coverage curve that
    picks a vocabulary size (read off the rank where ``cum_fraction``
    crosses the OOV budget).

    ``fraction``/``cum_fraction`` are shares of ALL corpus tokens
    (measured before the ``min_count``/``size`` cuts), so truncating
    the vocabulary never inflates the coverage it reports. Rank ties
    break by token for cross-engine determinism.

    Scale shape: one explode + token-keyed count (map-side combined) —
    the unigram-LM build — then an exact top-``size`` cut: per-
    partition ``size``-row heads sorted into one final partition (the
    cut is vocabulary-sized, never corpus-sized), where the rank /
    running-coverage window runs over at most ``size`` rows. The
    corpus total rides along as a one-row crossJoin (no separate
    driver action).
    """
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    # empty-string tokens (leading/trailing/double spaces split to '')
    # are whitespace artifacts, not vocabulary: they neither occupy a
    # top-V slot nor inflate the coverage denominator
    counts = (
        docs.select(
            F.explode(F.expr(f"split(lower({text_col}), ' ')")).alias(
                "token"
            )
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    total = counts.agg(F.sum("count").alias("__total"))
    kept = counts.filter(F.col("count") >= min_count)
    w = Window.orderBy(F.col("count").desc(), F.col("token"))
    top = (
        kept.orderBy(F.col("count").desc(), F.col("token"))
        .limit(size)
        .crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .withColumn(
            "cum_count",
            F.sum("count").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return top.select(
        "rank",
        "token",
        "count",
        F.round(F.col("count") / F.col("__total"), 6).alias("fraction"),
        F.round(F.col("cum_count") / F.col("__total"), 6).alias(
            "cum_fraction"
        ),
    )
