"""Sequence assembly for training pipelines: packing short documents
into fixed-token bins and chunking long documents into context windows.

The two inverse operations every LLM data pipeline runs between "corpus
of documents" and "batches of fixed-length sequences":

  sequence_pack — greedy in-order packing: within each partition key
      (source/shard), documents in id order accumulate into a bin until
      the token budget would overflow; bin assignment is
      ``floor(exclusive_prefix_tokens / target)``. A pure window
      prefix-sum: deterministic, replayable, and expressible in any SQL
      engine. Order-dependent packing fundamentally serializes per
      partition key, so at 100 TB you pack within shards (source ×
      hash-bucket) — thousands of independent keys, each a single
      window partition — never one global ordering.
  chunk_documents — split each document's token stream into
      non-overlapping windows of ``chunk_tokens`` (the map side of
      context-window chunking). Embarrassingly parallel: one codegen'd
      transform + posexplode per row, no shuffle at all.

Note ``sequence_pack``'s bins may overflow ``target`` by one document
(the classic streaming-pack semantics: a doc belongs to the bin its
prefix starts in); callers wanting strict caps chunk oversized docs
first — the composition ``chunk_documents |> sequence_pack`` yields
bins that never exceed ``target + chunk_tokens - 1``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from flink_examples_spark.functions.text import token_count, tokens


def sequence_pack(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: int,
    partition_col: str,
) -> DataFrame:
    """Assign every document a pack id within its partition key.

    Output: one row per document — ``<partition_col>, <id_col>,
    n_tokens, pack_id`` where ``pack_id = floor(exclusive-prefix-sum of
    n_tokens / target)`` in ``id_col`` order. Integer-only arithmetic:
    hash-exact across engines.
    """
    w = (
        Window.partitionBy(partition_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n = token_count(text_col)
    return df.select(
        F.col(partition_col),
        F.col(id_col),
        n.alias("n_tokens"),
    ).withColumn(
        "pack_id",
        F.floor(F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / target),
    )


def pack_stats(packed: DataFrame, partition_col: str) -> DataFrame:
    """Per-bin accounting over ``sequence_pack`` output:
    ``<partition_col>, pack_id, n_docs, pack_tokens``."""
    return packed.groupBy(partition_col, "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int,
) -> DataFrame:
    """Explode each document into fixed-size token chunks.

    Output: ``<id_col>, chunk_idx, n_chunk_tokens, chunk_hash`` — one
    row per chunk, ``chunk_idx`` 0-based, the final chunk possibly
    short. ``chunk_hash`` (md5 of the space-joined chunk text)
    fingerprints content without materializing wide rows through the
    shuffle-free plan.
    """
    c = int(chunk_tokens)
    chunks = F.expr(
        f"transform(sequence(0, cast((size(t) + {c} - 1) / {c} as int) - 1),"
        f" j -> slice(t, j * {c} + 1, {c}))"
    )
    return (
        df.select(F.col(id_col), tokens(text_col).alias("t"))
        .filter(F.size("t") > 0)
        .select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk"))
        .select(
            id_col,
            "chunk_idx",
            F.size("chunk").alias("n_chunk_tokens"),
            F.md5(F.array_join("chunk", " ")).alias("chunk_hash"),
        )
    )
