"""BPE tokenizer training + distributed corpus encoding.

The production shape for tokenizer training at 100 TB: train the merge
table on a BOUNDED word-frequency sample (the frequency table, not the
corpus, bounds driver memory — Zipf makes a 10k-word cap cover ~all
occurrences), then broadcast the merges and encode the corpus in one
Arrow-batched pass. Pretokenization happens in the JVM everywhere
(``functions.text.bpe_tokens``, the RE2-safe GPT-2-family regex) so the
trainer and encoder can never disagree with the SQL-side pretoken
counts — Python regex lacks ``\\p{L}`` and is kept out of it entirely.

Merging is GPT-2-style: per step, the globally most frequent adjacent
symbol pair (ties broken lexicographically — deterministic, no dict
order dependence) is merged at ALL its occurrences, scanning
left-to-right.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_examples_spark.functions.text import bpe_tokens


def _merge_word(parts: list[str], pair: tuple[str, str]) -> list[str]:
    """Merge every left-to-right occurrence of ``pair`` in ``parts``."""
    out, i = [], 0
    while i < len(parts):
        if (
            i + 1 < len(parts)
            and parts[i] == pair[0]
            and parts[i + 1] == pair[1]
        ):
            out.append(parts[i] + parts[i + 1])
            i += 2
        else:
            out.append(parts[i])
            i += 1
    return out


def train_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    max_words: int = 10_000,
) -> list[tuple[str, str]]:
    """Train an ordered BPE merge list on the corpus word-frequency
    table (JVM pretokenize → explode → count → top-``max_words`` by
    frequency, tie-broken by word so the sample is deterministic).
    Driver cost is O(max_words · n_merges), independent of corpus size.
    """
    wc = (
        docs.select(F.explode(bpe_tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(max_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["w"]): r["n"] for r in wc if len(r["w"]) > 0
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for word, freq in vocab.items():
            for i in range(len(word) - 1):
                pairs[(word[i], word[i + 1])] += freq
        if not pairs:
            break
        # most frequent pair; lexicographic tie-break for determinism
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {
            tuple(_merge_word(list(w), best)): f for w, f in vocab.items()
        }
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply trained merges to one word: repeatedly merge the
    earliest-learned (lowest-rank) pair present until none applies —
    the standard BPE inference loop."""
    parts = list(word)
    while len(parts) > 1:
        best_rank, best_pair = None, None
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (parts[i], parts[i + 1])
        if best_pair is None:
            break
        parts = _merge_word(parts, best_pair)
    return parts


def bpe_encode_stats(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Encode the corpus with a trained merge table and emit per-doc
    accounting: ``<id_col>, [keep_cols...], n_pretokens, n_bpe_tokens``.

    Pretokens are split in the JVM; the merge table ships in the
    closure; encoding is one narrow ``mapInPandas`` pass with a
    per-batch memo on distinct pretokens (Zipf: a batch of docs shares
    almost all its words), so per-batch cost is ~distinct-words, not
    total words. No shuffle at any corpus size.

    The output schema carries the INPUT types through: the id and every
    keep_col keep their ``docs`` schema type (string ids, numeric
    metadata — not hard-coded). NULL-text docs survive with ZERO counts
    (the row is visible, pinned by tests) — note this deliberately
    differs from ``token_count``'s NULL-propagating column semantics:
    an accounting pass that must treat NULL as "uncounted" rather than
    "zero-length" should filter on ``text IS NOT NULL`` first.
    """
    keep_cols = keep_cols or []
    ranks = {p: i for i, p in enumerate(merges)}

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}

        def n_tokens(w: str) -> int:
            if w not in memo:
                memo[w] = len(_encode_word(w, ranks))
            return memo[w]

        for pdf in batches:
            if pdf.empty:
                continue
            pre = pdf["_pre"].map(
                lambda ws: list(ws) if ws is not None else []
            )
            yield pd.DataFrame(
                {
                    "_id": pdf["_id"].to_numpy(),
                    **{c: pdf[c].to_numpy() for c in keep_cols},
                    "n_pretokens": pre.map(len).to_numpy(),
                    "n_bpe_tokens": pre.map(
                        lambda ws: sum(n_tokens(w) for w in ws)
                    ).to_numpy(),
                }
            )

    fields = {f.name: f.dataType.simpleString() for f in docs.schema.fields}
    keep_schema = "".join(f", {c} {fields[c]}" for c in keep_cols)
    out = docs.select(
        F.col(id_col).alias("_id"),
        *keep_cols,
        bpe_tokens(F.col(text_col)).alias("_pre"),
    ).mapInPandas(
        enc,
        f"_id {fields[id_col]}{keep_schema}, "
        "n_pretokens long, n_bpe_tokens long",
    )
    return out.withColumnRenamed("_id", id_col)
