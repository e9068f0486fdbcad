"""F8: the PharmGKB "Phenotype (Genotype)" text grammar.

Re-implements the reference's funcparserlib grammar
(/root/reference/src/python/pharmgkb/parsers/text.py:84-146) as a plain
recursive-descent parser over whitespace tokens:

    phrase      := "an individual carrying" alt ( ["or"] alt )*
    alt         := two_alleles | one_allele "and" one_allele
    two_alleles := ("two" | "only" | "duplications of") DESC* "alleles"
    one_allele  := "one" DESC* "allele"

yielding one (type1, type2) pair per alternative — e.g.
"An individual carrying two gain-of-function alleles or one functional
allele and one gain-of-function allele" parses to
[('gain-of-function', 'gain-of-function'),
 ('functional', 'gain-of-function')].

This is ingestion-side only (U4): it normalizes scraped guideline text
into genotype rows, so the Spark face is a plain UDF applied once per
scraped string — never in a query hot path.
"""

from __future__ import annotations

import re


class GenotypeParseError(ValueError):
    pass


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.strip()) if t]


class _Cursor:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self) -> str:
        t = self.peek()
        if t is None:
            raise GenotypeParseError("unexpected end of input")
        self.i += 1
        return t

    def expect(self, word: str) -> None:
        t = self.take()
        if t.lower() != word:
            raise GenotypeParseError(f"expected {word!r}, got {t!r}")


def _desc_until(cur: _Cursor, keyword: str) -> str:
    """Collect tokens until one starting with ``keyword`` (the
    reference's negative-lookahead many + final skip)."""
    out: list[str] = []
    while True:
        t = cur.peek()
        if t is None:
            raise GenotypeParseError(f"missing {keyword!r} terminator")
        if t.lower().startswith(keyword):
            cur.take()
            return " ".join(out)
        out.append(cur.take())


def _alternative(cur: _Cursor) -> tuple[str, str]:
    t = cur.peek()
    if t is None:
        raise GenotypeParseError("expected an allele clause")
    lead = t.lower()
    if lead in ("two", "only"):
        cur.take()
        desc = _desc_until(cur, "alleles")
        return (desc, desc)
    if lead == "duplications":
        cur.take()
        cur.expect("of")
        desc = _desc_until(cur, "alleles")
        return (desc, desc)
    if lead == "one":
        cur.take()
        first = _desc_until(cur, "allele")
        cur.expect("and")
        cur.expect("one")
        second = _desc_until(cur, "allele")
        return (first, second)
    raise GenotypeParseError(f"unexpected token {t!r}")


def parse_phenotype_genotype(text: str) -> list[tuple[str, str]]:
    """Parse the guideline phrase into (allele_type1, allele_type2)
    pairs, one per "or"-alternative."""
    cur = _Cursor(_tokens(text))
    cur.expect("an")
    cur.expect("individual")
    cur.expect("carrying")
    pairs = [_alternative(cur)]
    while cur.peek() is not None:
        if cur.peek().lower() == "or":
            cur.take()
        pairs.append(_alternative(cur))
    return pairs


def phenotype_genotype_pairs(df, text_col: str, out_col: str = "genotypes"):
    """Spark face: array<struct<type1, type2>> per input string
    (ingestion-time UDF; invalid strings become null)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType, StringType, StructField, StructType,
    )

    schema = ArrayType(StructType([
        StructField("type1", StringType()),
        StructField("type2", StringType()),
    ]))

    @F.udf(returnType=schema)
    def _parse(s):
        if s is None:
            return None
        try:
            return [tuple(p) for p in parse_phenotype_genotype(s)]
        except GenotypeParseError:
            return None

    return df.withColumn(out_col, _parse(F.col(text_col)))
