"""Full-text relevance search: BM25 scoring entirely in codegen.

The retrieval primitive a corpus platform runs next to its dedup and
quality passes (find the documents most relevant to a probe query —
contamination triage, eval-set curation, nearest-neighbor-by-keyword).
Okapi BM25 (Robertson & Spärck Jones lineage; the robust
``ln(1 + (N-df+0.5)/(df+0.5))`` idf variant that never goes negative).

Scale shape — the part worth copying: for a FIXED query (a handful of
literal terms) there is no inverted index, no explode, and no shuffle
of anything token-sized:

  - per-term term-frequencies are ``size(filter(tokens, x -> x = t))``
    column expressions — one scan, whole-stage codegen;
  - the corpus statistics BM25 needs (N, avgdl, per-term df) are ONE
    single-row aggregate over those same expressions, broadcast back
    via a literal cross-join (the scalar-subquery shape of
    [[top_supplier_revenue]]);
  - scoring + top-k is then a second scan pass ending in
    TakeOrderedAndProject.

Two passes over the corpus, zero wide exchanges. An index-backed
engine beats this for high-QPS serving; for ad-hoc corpus triage at
100 TB the scan IS the right plan (the index would cost a full pass to
build anyway).

Scores are rounded to 6 decimals with a doc-id tiebreak so rank
membership is deterministic and cross-engine stable (ln() may differ
in the last ulp between libm builds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_examples_spark.functions.text import tokens


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 20,
) -> DataFrame:
    """Top-``topk`` documents by BM25 for the literal ``terms``.

    Output: ``(id, dl, score)`` ordered by (score DESC, id) — callers
    relying on membership get a total order.
    """
    if not terms:
        raise ValueError("bm25_topk: need at least one query term")
    # tokens() lowercases the corpus — normalize the query the same way
    # (an uppercase term would silently match nothing), and drop
    # duplicate terms (they would double-count their score component)
    seen: dict[str, None] = {}
    for t in terms:
        seen.setdefault(t.lower())
    terms = list(seen)
    def _tf(term: str):
        # NOTE: a two-arg lambda here would be taken as Spark's
        # (element, index) filter form — close over the term instead
        return F.size(F.filter("_t", lambda x: x == F.lit(term)))

    base = df.select(
        F.col(id_col).alias("_id"), tokens(text_col).alias("_t")
    ).select(
        "_id",
        F.size("_t").alias("dl"),
        *[_tf(t).alias(f"tf_{i}") for i, t in enumerate(terms)],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.join(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
        )
        tf = F.col(f"tf_{i}").cast("double")
        part = idf * (
            tf
            * (k1 + 1)
            / (tf + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
        )
        score = part if score is None else score + part
    return (
        scored.select(
            F.col("_id").alias(id_col),
            "dl",
            F.round(score, 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(topk)
    )
