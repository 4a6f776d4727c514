"""Text-analysis column expressions for large-scale corpus pipelines.

Generalizes the reference's tokenize/normalize idioms (WordCount.java:80-84
lowercase+split, TwitterJson.java:87-95) into the text operations a
training-data pipeline needs: token counting, quality scoring, language-ID
heuristics, and document fingerprinting. Everything here is a pure
built-in column expression — JVM-side, whole-stage-codegen'd, no Python
in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny embedded stopword list used by the ratio heuristics. Kept as an
# inline expression (not a UDF/broadcast) so the filter stays codegen'd.
EN_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it")


def tokens(text: Column | str) -> Column:
    """Whitespace tokens, empties dropped (WordCount.java:80-84 contract)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(col), " "), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def char_count_no_spaces(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    return F.length(F.replace(col, F.lit(" "), F.lit("")))


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    toks = tokens(text)
    stops = F.filter(toks, lambda t: t.isin(*stopwords))
    return F.size(stops) / F.size(toks)


def avg_token_length(text: Column | str) -> Column:
    return char_count_no_spaces(text) / token_count(text)


def quality_score(text: Column | str) -> Column:
    """Length-saturating quality heuristic in [0, 1].

    ``min(1, n_tokens/50) * (1 - stopword_ratio)`` — long-enough docs with
    low boilerplate score high. Deliberately simple integer/double
    arithmetic so the SQL-oracle formulation is bit-identical.
    """
    n = token_count(text)
    return F.least(F.lit(1.0), n / F.lit(50.0)) * (1.0 - stopword_ratio(text))


def lang_id_en(text: Column | str, threshold: float = 0.03) -> Column:
    """N-gram-free language ID: English iff stopword density clears the bar.

    A real pipeline would use char-n-gram profiles per language; the
    engine surface (a codegen'd expression producing a label column) is
    the same, so the heuristic is intentionally minimal and
    deterministic.
    """
    return F.when(stopword_ratio(text) > threshold, F.lit("en")).otherwise(
        F.lit("other")
    )


def fingerprint_md5(text: Column | str) -> Column:
    """Canonical document fingerprint: md5 over the normalized text.

    Normalization: lowercase + trim. Used as the exact-dedup key; md5 is
    available in every SQL engine, so the oracle matches byte-for-byte.
    """
    col = F.col(text) if isinstance(text, str) else text
    return F.md5(F.trim(F.lower(col)))


def hash60(col: Column) -> Column:
    """Deterministic 60-bit integer hash from md5 hex (engine-portable).

    Takes the first 15 hex chars of md5 → fits a signed 64-bit int, so
    DuckDB (``('0x'||substr(md5(x),1,15))::BIGINT``) computes the same
    value. Used by MinHash/SimHash where cross-engine determinism
    matters more than hash speed.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
