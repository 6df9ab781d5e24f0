"""Scalar string preprocessors, expressed as Spark Column transforms.

Parity targets: reference ``src/liken/preprocessors.py:30-143`` and the
golden pairs in ``tests/integration/test_matrix_preprocessors.py:35-63``.

Each preprocessor is a tiny object exposing ``apply(Column) -> Column``.
Native ``pyspark.sql.functions`` are used wherever they can reproduce the
Arrow-compute semantics (JVM-side, whole-stage-codegen friendly); only the
Unicode normalizers and the name/company normalizers need a vectorized
pandas UDF (Arrow-batched — never per-row Python over the wire).

Preprocessors run *after* the NA placeholder has been applied, exactly like
the reference (core/deduper.py:111-113), and only on single-column inputs
(compound pa.Table inputs skip preprocessing, core/deduper.py:96-97).
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "Preprocessor",
    "strip",
    "lower",
    "alnum",
    "remove_punctuation",
    "normalize_unicode",
    "ascii_fold",
    "remove_stopwords",
    "normalize_names",
    "normalize_company",
]


class Preprocessor:
    """Base: a named Column -> Column transform."""

    name: str = "preprocessor"

    def apply(self, col: Column) -> Column:  # pragma: no cover - interface
        raise NotImplementedError

    def __repr__(self) -> str:
        return f"{self.name}()"


class _Strip(Preprocessor):
    """Trim leading/trailing whitespace (reference preprocessors.py:30-35).

    The reference uses Arrow's utf8_trim_whitespace (Unicode whitespace);
    Spark's ``trim`` strips spaces only, so we use a regex that covers the
    common Unicode whitespace classes.
    """

    name = "strip"

    def apply(self, col: Column) -> Column:
        return F.regexp_replace(col, r"^[\s   ]+|[\s   ]+$", "")


class _Lower(Preprocessor):
    name = "lower"

    def apply(self, col: Column) -> Column:
        return F.lower(col)


class _Alnum(Preprocessor):
    """Remove everything but [0-9A-Za-z] (reference preprocessors.py:46-51)."""

    name = "alnum"

    def apply(self, col: Column) -> Column:
        return F.regexp_replace(col, "[^0-9A-Za-z]+", "")


class _RemovePunctuation(Preprocessor):
    """Remove ``[^\\w\\s]+`` (reference preprocessors.py:54-59)."""

    name = "remove_punctuation"

    def apply(self, col: Column) -> Column:
        return F.regexp_replace(col, r"[^\w\s]+", "")


class _NormalizeUnicode(Preprocessor):
    """Unicode-normalize to NFC/NFKC/NFD/NFKD (reference 62-73)."""

    name = "normalize_unicode"

    def __init__(self, form: str = "NFKD"):
        if form not in ("NFC", "NFKC", "NFD", "NFKD"):
            raise ValueError(f"invalid unicode form {form!r}")
        self._form = form

    def apply(self, col: Column) -> Column:
        form = self._form

        @pandas_udf("string")
        def _norm(s: pd.Series) -> pd.Series:
            return s.map(lambda x: unicodedata.normalize(form, x) if x is not None else None)

        return _norm(col)


class _AsciiFold(Preprocessor):
    """NFKD then strip combining marks U+0300-U+036F (reference 76-89)."""

    name = "ascii_fold"

    def apply(self, col: Column) -> Column:
        combining = re.compile("[̀-ͯ]")

        @pandas_udf("string")
        def _fold(s: pd.Series) -> pd.Series:
            return s.map(
                lambda x: combining.sub("", unicodedata.normalize("NFKD", x)) if x is not None else None
            )

        return _fold(col)


# The standard NLTK English stopword list (public corpus data), vendored so
# the engine has zero runtime downloads (reference lazily nltk.download()s
# it, preprocessors.py:103-108).
NLTK_ENGLISH_STOPWORDS: tuple[str, ...] = (
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "you're", "you've", "you'll", "you'd", "your", "yours", "yourself",
    "yourselves", "he", "him", "his", "himself", "she", "she's", "her",
    "hers", "herself", "it", "it's", "its", "itself", "they", "them",
    "their", "theirs", "themselves", "what", "which", "who", "whom",
    "this", "that", "that'll", "these", "those", "am", "is", "are", "was",
    "were", "be", "been", "being", "have", "has", "had", "having", "do",
    "does", "did", "doing", "a", "an", "the", "and", "but", "if", "or",
    "because", "as", "until", "while", "of", "at", "by", "for", "with",
    "about", "against", "between", "into", "through", "during", "before",
    "after", "above", "below", "to", "from", "up", "down", "in", "out",
    "on", "off", "over", "under", "again", "further", "then", "once",
    "here", "there", "when", "where", "why", "how", "all", "any", "both",
    "each", "few", "more", "most", "other", "some", "such", "no", "nor",
    "not", "only", "own", "same", "so", "than", "too", "very", "s", "t",
    "can", "will", "just", "don", "don't", "should", "should've", "now",
    "d", "ll", "m", "o", "re", "ve", "y", "ain", "aren", "aren't",
    "couldn", "couldn't", "didn", "didn't", "doesn", "doesn't", "hadn",
    "hadn't", "hasn", "hasn't", "haven", "haven't", "isn", "isn't", "ma",
    "mightn", "mightn't", "mustn", "mustn't", "needn", "needn't", "shan",
    "shan't", "shouldn", "shouldn't", "wasn", "wasn't", "weren", "weren't",
    "won", "won't", "wouldn", "wouldn't",
)


class _RemoveStopwords(Preprocessor):
    """Word-boundary regex removal of a stopword list (reference 95-113)."""

    name = "remove_stopwords"

    def __init__(self, words: list[str] | None = None, language: str = "english"):
        if words is None:
            if language != "english":
                raise ValueError(
                    "only the vendored english stopword list is bundled; pass words= explicitly"
                )
            words = list(NLTK_ENGLISH_STOPWORDS)
        self._words = words

    def apply(self, col: Column) -> Column:
        pattern = r"\b(" + "|".join(re.escape(w) for w in self._words) + r")\b"
        return F.regexp_replace(col, pattern, "")


_NAME_TITLES = {
    "mr", "mrs", "ms", "miss", "dr", "prof", "sir", "madam", "mx", "rev",
    "fr", "capt", "col", "sgt", "lt", "hon",
}
_NAME_SUFFIXES = {"jr", "sr", "ii", "iii", "iv", "v", "phd", "md", "esq"}


def _clean_person_name(name: str | None) -> str | None:
    """Minimal HumanName-style normalization -> "first middle last".

    Covers the reference's nameparser behavior for the golden fixture
    (test_matrix_preprocessors.py: "Mr. John H Doe (Da Legend)" ->
    "John H Doe"): strips parenthesized/quoted nicknames, leading titles,
    trailing suffixes, and resolves "Last, First [Middle]" comma order.
    """
    if name is None:
        return None
    s = re.sub(r"[\(\[\"']([^\)\]\"']*)[\)\]\"']", " ", name)
    if "," in s:
        head, _, tail = s.partition(",")
        s = (tail.strip() + " " + head.strip()).strip()
    tokens = [t for t in re.split(r"\s+", s) if t]
    while tokens and tokens[0].rstrip(".").lower() in _NAME_TITLES:
        tokens.pop(0)
    while tokens and tokens[-1].rstrip(".").lower() in _NAME_SUFFIXES:
        tokens.pop()
    if not tokens:
        return ""
    if len(tokens) == 1:
        return tokens[0]
    first, *middle, last = tokens
    return " ".join([first, *middle, last]).strip()


class _NormalizeName(Preprocessor):
    name = "normalize_names"

    def apply(self, col: Column) -> Column:
        @pandas_udf("string")
        def _norm(s: pd.Series) -> pd.Series:
            return s.map(_clean_person_name)

        return _norm(col)


_COMPANY_TERMS = {
    "llc", "ltd", "inc", "co", "corp", "plc", "llp", "lp", "pllc", "gmbh",
    "ag", "sa", "sarl", "sas", "spa", "srl", "bv", "nv", "oy", "ab", "as",
    "kg", "pte", "pty", "limited", "corporation", "incorporated", "company",
    "companies", "gesellschaft",
}


def _clean_company_name(name: str | None) -> str | None:
    """Strip trailing legal-entity terms (cleanco.basename-style)."""
    if name is None:
        return None
    tokens = [t for t in re.split(r"\s+", name.strip()) if t]
    while tokens and tokens[-1].strip(".,&").lower() in _COMPANY_TERMS:
        tokens.pop()
    return " ".join(tokens).rstrip(" .,")


class _NormalizeCompany(Preprocessor):
    name = "normalize_company"

    def apply(self, col: Column) -> Column:
        @pandas_udf("string")
        def _norm(s: pd.Series) -> pd.Series:
            return s.map(_clean_company_name)

        return _norm(col)


# Public factories (match the reference's function-per-preprocessor API,
# preprocessors.py:149-207)

def strip() -> Preprocessor:
    return _Strip()


def lower() -> Preprocessor:
    return _Lower()


def alnum() -> Preprocessor:
    return _Alnum()


def remove_punctuation() -> Preprocessor:
    return _RemovePunctuation()


def normalize_unicode(form: str = "NFKD") -> Preprocessor:
    return _NormalizeUnicode(form=form)


def ascii_fold() -> Preprocessor:
    return _AsciiFold()


def remove_stopwords(words: list[str] | None = None, language: str = "english") -> Preprocessor:
    return _RemoveStopwords(words=words, language=language)


def normalize_names() -> Preprocessor:
    return _NormalizeName()


def normalize_company() -> Preprocessor:
    return _NormalizeCompany()


def apply_all(col: Column, preprocessors: list[Preprocessor]) -> Column:
    for p in preprocessors:
        col = p.apply(col)
    return col
