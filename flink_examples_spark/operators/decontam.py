"""Benchmark decontamination: flag training documents that share token
n-grams with an evaluation/benchmark set.

The standard LLM-training hygiene step (see GPT-3 / PaLM appendices):
any train document containing a long-enough token n-gram that also
appears in an eval benchmark is "contaminated" and must be dropped or
audited before training. At 100 TB the asymmetry is the whole design:

  - the TRAIN side is huge — its shingle set is computed streaming
    through the scan (explode + distinct, one shuffle keyed by shingle);
  - the EVAL side is tiny (benchmarks are MBs) — its distinct shingle
    set is **broadcast**, so the contamination join is map-side and the
    train corpus is never shuffled by shingle at all.

Reuses the dedup shingle machinery (operators/dedup.py:48) so train and
eval tokenize identically; hashes/buckets are md5-derived, so the
decision is replayable in any engine (same contract as
operators/sampling.py).

Reference parity: the reference has no decontamination operator — this
is part of the SURVEY §7 north-star "training-data pipeline" extension
alongside dedup and sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flink_examples_spark.operators.dedup import shingles


def ngram_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-train-document contamination report against an eval corpus.

    Output: ``doc_id, n_grams, n_hits, verdict`` — one row per train
    document with at least one ``n``-token shingle; ``n_hits`` counts
    its distinct shingles that appear anywhere in the eval set, and
    ``verdict`` is ``'contaminated'`` iff ``n_hits > 0``.

    ``n=8`` is a realistic production default (long enough that shared
    grams imply copying, short enough to catch partial overlap); tests
    and the registry use smaller ``n`` so the synthetic small-vocab
    corpus produces non-trivial hits.

    ``broadcast_eval=True`` is the scale path: eval benchmarks are
    small by construction, so the join is a broadcast-hash semi-join
    and the 100 TB train side is never shuffled. Set False only if the
    "eval" side is itself corpus-sized (then it's a shingle-keyed
    shuffle join, same shape as dedup's inverted index).
    """
    # No repartition here: the operator honors its zero-train-shuffle
    # contract and leaves parallelism to the caller's scan. Small
    # single-file inputs (whose 1-2 scan partitions serialize the
    # CPU-bound shingling) should be fanned out AT THE CALL SITE
    # (queries._fan_out precedent) where the input size is known.
    sh_train = shingles(train, id_col, text_col, n)
    sh_eval = shingles(eval_df, id_col, text_col, n) \
        .select("shingle").distinct()
    if broadcast_eval:
        sh_eval = F.broadcast(sh_eval)
    # One pass: a left broadcast join marks each train shingle as a hit
    # or not, and a single doc_id aggregation counts both totals — the
    # train side is scanned once and shuffled once (by doc_id), never
    # by shingle.
    marked = sh_train.join(
        sh_eval.withColumn("hit", F.lit(1)), "shingle", "left"
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("hit").alias("n_hits"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_hits",
            F.when(F.col("n_hits") > 0, "contaminated")
            .otherwise("clean")
            .alias("verdict"),
        )
    )
