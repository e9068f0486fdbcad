"""Regenerate ``text.PINNED_LANGID_MODEL`` — the distilled literal
language-ID model embedded for the map-side face and the DuckDB
oracle gate.

Provenance: trains ``training.train_language_classifier`` (one-vs-rest
logistic regression over character-trigram features) on a DETERMINISTIC
synthetic corpus derived from ``text.LANG_FUNCTION_WORDS`` (sliding
8-word windows over each language's function-word list — the same
public stopword lists the trigram-profile rung is built from), then
distills to the top 36 features per language via
``training.top_features``. Weights are rounded to 6 decimals by the
distiller, so the printed literal is stable enough to diff.

Run:  PYTHONPATH=/root/repo python scripts/make_pinned_langid.py
then paste the printed dict over ``PINNED_LANGID_MODEL`` in
``haplorec_spark/operators/text.py``.
"""
import pprint
import sys

sys.path.insert(0, "/root/repo")

from haplorec_spark.session import get_spark  # noqa: E402
from haplorec_spark.operators.text import LANG_FUNCTION_WORDS  # noqa: E402
from haplorec_spark.operators.training import (  # noqa: E402
    top_features,
    train_language_classifier,
)

SENTENCE_LEN = 8
SENTENCES_PER_LANG = 60

#: Common content words per language (public high-frequency
#: vocabulary — the kind of list any frequency dictionary publishes),
#: interleaved with the function words so the model sees realistic
#: word-boundary and inflection n-grams (plural/verb endings), which
#: is where it must beat the unweighted trigram profiles.
LANG_COMMON_WORDS: dict[str, list[str]] = {
    "en": ["time", "people", "years", "things", "children", "house",
           "water", "words", "playing", "reading", "living", "called",
           "looked", "wanted", "going", "makes", "comes", "gives",
           "knows", "works"],
    "fr": ["temps", "gens", "annees", "choses", "enfants", "maison",
           "eau", "mots", "jouent", "lisent", "vivent", "appelle",
           "regarde", "voulait", "allons", "faisons", "viennent",
           "donne", "savoir", "travaille"],
    "es": ["tiempo", "gente", "anos", "cosas", "ninos", "casa",
           "agua", "palabras", "juegan", "leen", "viven", "llama",
           "miraba", "queria", "vamos", "hacemos", "vienen", "dando",
           "saber", "trabaja"],
    "de": ["zeit", "leute", "jahre", "dinge", "kinder", "haus",
           "wasser", "worte", "spielen", "lesen", "leben", "heisst",
           "schaute", "wollte", "gehen", "machen", "kommen", "geben",
           "wissen", "arbeitet"],
    "it": ["tempo", "gente", "anni", "cose", "bambini", "casa",
           "acqua", "parole", "giocano", "leggono", "vivono",
           "chiama", "guardava", "voleva", "andiamo", "facciamo",
           "vengono", "dando", "sapere", "lavora"],
    "pt": ["tempo", "pessoas", "anos", "coisas", "criancas", "casa",
           "agua", "palavras", "brincam", "leem", "vivem", "chama",
           "olhava", "queria", "vamos", "fazemos", "chegam", "dando",
           "saber", "trabalha"],
    "nl": ["tijd", "mensen", "jaren", "dingen", "kinderen", "huis",
           "water", "woorden", "spelen", "lezen", "wonen", "heet",
           "keek", "wilde", "gaan", "maken", "komen", "geven",
           "weten", "werkt"],
}


def pinned_training_corpus():
    """[(doc_id, lang, text)] — sliding windows over the interleaved
    function-word + common-word lists; deterministic, no RNG."""
    rows = []
    for li, (lang, fws) in enumerate(LANG_FUNCTION_WORDS.items()):
        words = []
        cws = LANG_COMMON_WORDS[lang]
        for i in range(max(len(fws), len(cws))):
            if i < len(fws):
                words.append(fws[i])
            if i < len(cws):
                words.append(cws[i])
        for i in range(SENTENCES_PER_LANG):
            sent = " ".join(
                words[(i * 3 + j) % len(words)]
                for j in range(SENTENCE_LEN)
            )
            rows.append((li * 1000 + i, lang, sent))
    return rows


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    docs = spark.createDataFrame(
        pinned_training_corpus(), "doc_id long, lang string, text string"
    )
    model = train_language_classifier(
        docs, iterations=60, learning_rate=8.0, min_df=2
    )
    literal = top_features(model, k=36)
    literal = {
        lang: (round(bias, 6), ws) for lang, (bias, ws) in literal.items()
    }
    print("PINNED_LANGID_MODEL = ", end="")
    pprint.pprint(literal, width=72, sort_dicts=True)
    spark.stop()


if __name__ == "__main__":
    main()
