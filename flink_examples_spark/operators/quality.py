"""Repetition-based quality signals (Gopher-style) for corpus filtering.

Rae et al. (Gopher, 2021) filter documents whose content is dominated by
repeated fragments — measured as the fraction of tokens in duplicated
n-grams and the share of the most frequent n-gram. Two signals here:

  dup_token_fraction — 1 - |distinct tokens| / |tokens|. Pure array
      codegen inside the scan (array_distinct + size): zero shuffle,
      runs at I/O speed on 100 TB.
  top-bigram share — count of the modal bigram / total bigrams. Needs a
      per-(doc, bigram) count, i.e. one keyed shuffle — but both
      aggregations are map-side combinable and keyed by doc_id, so the
      pass stays linear and skew-free (doc_id is unique).

The thresholds are data-dependent knobs, not constants; callers pick
them per corpus (the registry query documents the ones chosen for the
synthetic fixtures).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from flink_examples_spark.functions.text import tokens


def dup_token_fraction(tokens_col: Column) -> Column:
    """Fraction of tokens that are repeats of an earlier token —
    1 - distinct/total over an already-tokenized array column.
    NULL-free for non-empty token lists."""
    return 1 - F.size(F.array_distinct(tokens_col)) / F.size(tokens_col)


def repetition_signals(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_bigram_max: float = 0.06,
    dup_token_max: float = 0.65,
) -> DataFrame:
    """Per-document repetition report:
    ``doc_id, dup_token_frac, top_bigram_frac, verdict``.

    ``verdict`` is ``'repetitive'`` when either signal exceeds its
    threshold, else ``'ok'``. Fractions are rounded to 6 dp (exact for
    the small-integer ratios involved) so results hash-compare across
    engines.

    Plan shape: one explode of bigrams, a (doc_id, bigram) hash
    aggregate, then a doc_id hash aggregate — two shuffles total, both
    partial-aggregated map-side. The dup-token signal rides along as a
    first() over the already-grouped doc so the text is scanned once.
    """
    # No repartition here — small single-file inputs should be fanned
    # out at the call site (queries._fan_out) where input size is
    # known; the operator itself stays scan-parallelism-neutral.
    base = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(text_col).alias("t"),
    ).filter(F.size("t") >= 2)
    dup = dup_token_fraction(F.col("t")).alias("dup_f")
    bigram = F.expr("transform(sequence(0, size(t) - 2), i -> t[i] || ' ' || t[i + 1])")
    counts = (
        base.select("doc_id", dup, F.explode(bigram).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"), F.first("dup_f").alias("dup_f"))
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.first("dup_f").alias("dup_f"),
        (F.max("c") / F.sum("c")).alias("top_f"),
    )
    return per_doc.select(
        "doc_id",
        F.round("dup_f", 6).alias("dup_token_frac"),
        F.round("top_f", 6).alias("top_bigram_frac"),
        F.when(
            (F.col("top_f") > top_bigram_max) | (F.col("dup_f") > dup_token_max),
            "repetitive",
        )
        .otherwise("ok")
        .alias("verdict"),
    )
