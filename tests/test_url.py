"""URL normalization / synthesis edge cases (functions/url.py) the
registry oracle can't isolate: each noise class individually, the
Spark/DuckDB mirror identity, and host extraction."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from flink_examples_spark.functions.url import (
    NORMALIZE_URL_SQL,
    SYNTH_URL_SQL,
    normalize_url,
    synthetic_crawl_url,
    url_host,
)


def test_normalize_url_strips_each_noise_class(spark):
    cases = {
        "https://Host.example.com/A/b": "host.example.com/a/b",
        "http://www.h.com/p": "h.com/p",
        "https://h.com/p?utm_source=x&y=1": "h.com/p",
        "https://h.com/p#frag": "h.com/p",
        "https://h.com/p/?q=1#f": "h.com/p",
        "http://www.h.com/p//": "h.com/p",
        # www only strips as a HOST prefix, never mid-path
        "https://h.com/www.keep": "h.com/www.keep",
        # root URL collapses to bare host
        "https://www.h.com/": "h.com",
        # uppercase scheme/WWW canonicalize too (lowercase runs FIRST;
        # r9 s5 review — these never stripped when lower() ran last)
        "HTTP://WWW.H.com/p": "h.com/p",
        "HtTpS://Example.com/A?Q=1": "example.com/a",
    }
    df = spark.createDataFrame([(k,) for k in cases], "raw string")
    got = {
        r.raw: r.norm
        for r in df.select("raw", normalize_url("raw").alias("norm")).collect()
    }
    assert got == cases


def test_normalize_and_synth_sql_mirrors_match_spark(spark):
    """The DuckDB mirror strings must compute byte-identical raw and
    canonical URLs for every (doc_id, source) — the oracle-parity
    contract of the url queries, pinned without the full registry."""
    rows = [(i, f"src{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    spark_out = {
        r.doc_id: (r.raw, r.norm)
        for r in df.select(
            "doc_id",
            synthetic_crawl_url("doc_id", "source").alias("raw"),
            normalize_url(
                synthetic_crawl_url("doc_id", "source")
            ).alias("norm"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, 'src{i % 3}')" for i in range(60))
        + ") AS v(doc_id, source)"
    )
    synth = SYNTH_URL_SQL.format(d="doc_id", s="source")
    norm = NORMALIZE_URL_SQL.format(u=synth)
    duck_out = {
        int(d): (r, n)
        for d, r, n in con.execute(
            f"SELECT doc_id, {synth}, {norm} FROM t"
        ).fetchall()
    }
    assert spark_out == duck_out
    # non-vacuous: the synthesis actually exercises every noise class
    raws = [v[0] for v in spark_out.values()]
    assert any("www." in r for r in raws)
    assert any("?utm_source" in r for r in raws)
    assert any("#sec-" in r for r in raws)
    assert any(r.rstrip("0123456789#sec-").endswith("/") for r in raws)


def test_url_host(spark):
    df = spark.createDataFrame(
        [("h.com/a/b",), ("solo-host",)], "u string"
    )
    got = [r.h for r in df.select(url_host("u").alias("h")).collect()]
    assert got == ["h.com", "solo-host"]


def _mini_docs(tmp_path, rows):
    """Single-file documents table in the testdata layout."""
    import pandas as pd

    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[2] for r in rows],
            "lang": ["en"] * len(rows),
            "source": [r[1] for r in rows],
            "n_chars": [len(r[2] or "") for r in rows],
        }
    ).to_parquet(str(tmp_path / "documents.parquet"), index=False)
    return str(tmp_path)


def _toks(text):
    return [t for t in (text or "").lower().split(" ") if t != ""]


def test_host_token_budget_cap_matches_pandas_reference(spark, tmp_path):
    """Greedy budget-cap semantics on a seeded random tape: within each
    host (== source in the synthetic URL space) docs admit in doc_id
    order while the admitted token mass is under half the host total;
    the kept set is a doc_id prefix and the first doc CROSSING the cap
    is still admitted. Includes a 1-token host (cap = 0 -> nothing
    kept, host row still present) and empty texts."""
    import random

    from flink_examples_spark.queries import registry

    rng = random.Random(907)
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    rows = []
    for doc_id in range(120):
        src = f"s{rng.randrange(5)}"
        n = rng.randrange(0, 9)
        rows.append((doc_id, src, " ".join(rng.choice(words) for _ in range(n))))
    rows.append((200, "tiny", "solo"))  # total 1 -> cap 0 -> keeps none
    sf = _mini_docs(tmp_path, rows)

    # pandas reference
    ref = {}
    by_host = {}
    for doc_id, src, text in sorted(rows):
        by_host.setdefault(f"{src}.example.com", []).append(len(_toks(text)))
    for host, toks in by_host.items():
        tot = sum(toks)
        if tot == 0:
            continue
        cap = tot // 2
        pfx = 0
        n_kept = kept_tokens = 0
        for n in toks:
            if pfx < cap:
                n_kept += 1
                kept_tokens += n
            pfx += n
        ref[host] = (len(toks), n_kept, tot, kept_tokens,
                     kept_tokens * 1_000_000 // tot)

    got = {
        r.host: (r.n_docs, r.n_kept, r.total_tokens, r.kept_tokens,
                 r.kept_ppm)
        for r in registry()["host_token_budget_cap"]
        .spark_fn(spark, sf)
        .collect()
    }
    assert got == ref
    assert got["tiny.example.com"][1] == 0  # cap 0 admits nothing


def test_host_line_dedup_census_matches_pandas_reference(spark, tmp_path):
    """Host-scoped line-dedup census on a corpus engineered so one
    host has a clear >=3x boilerplate line, another host repeats the
    SAME line only twice (stays, host scope matters), and a third host
    is all-unique."""
    from collections import Counter

    from flink_examples_spark.queries import registry

    rows = [
        # host a: the 5-doc lead synthesis makes the LATER lines recur
        # ("tail" x5, "body three" x4, "body two" x3 -> boilerplate)
        (0, "a", "nav bar"), (1, "a", "body one"), (2, "a", "body two"),
        (3, "a", "body three"), (4, "a", "tail"),
        # host b: only 2 docs, so no line can reach the >=3 threshold
        # even though "other" recurs twice
        (10, "b", "nav bar"), (11, "b", "other"),
        # host c: unique lines
        (20, "c", "unique x"), (21, "c", "unique y"),
    ]
    sf = _mini_docs(tmp_path, rows)

    # pandas reference replicating _host_span_synth + the census
    by_src = {}
    for doc_id, src, text in sorted(rows):
        by_src.setdefault(src, []).append(text)
    ref = {}
    for src, texts in by_src.items():
        counts = Counter()
        for i in range(len(texts)):
            synth = ". ".join(texts[i:i + 5])
            for line in synth.split(". "):
                counts[line] += 1
        total = sum(len(ln) * c for ln, c in counts.items())
        removed = sum(len(ln) * c for ln, c in counts.items() if c >= 3)
        ref[f"{src}.example.com"] = (
            len(counts),
            sum(counts.values()),
            sum(1 for c in counts.values() if c >= 3),
            total,
            removed,
            removed * 1_000_000 // total,
        )

    got = {
        r.host: (r.n_lines, r.n_line_instances, r.n_boiler_lines,
                 r.total_chars, r.removed_chars, r.removed_ppm)
        for r in registry()["host_line_dedup_census"]
        .spark_fn(spark, sf)
        .collect()
    }
    assert got == ref
    # the engineered semantics actually held: host a struck its nav
    # bar, host b (2 occurrences) and host c (unique) struck nothing
    assert got["a.example.com"][2] >= 1
    assert got["b.example.com"][2] == 0 and got["b.example.com"][4] == 0
    assert got["c.example.com"][2] == 0


def test_spark_length_matches_duckdb_len_off_bmp(spark):
    """ADVICE r9 flagged host_line_dedup_census's F.length (Spark) vs
    len (DuckDB) as UTF-16-units-vs-codepoints divergent on non-BMP
    text. Measured, the premise is false: BOTH count CODEPOINTS — an
    emoji is 1 on each side (Spark's UTF8String.numChars walks code
    points, not UTF-16 units). Pin that agreement on every plane class
    so a future engine/oracle default flip surfaces here instead of as
    a census hash mismatch on the first non-ASCII corpus."""
    import duckdb

    samples = ["ascii", "aéb", "中文", "a\U0001F600b",
               "\U0001F600\U0001F680", ""]
    got_spark = [
        r.n
        for r in spark.createDataFrame([(s,) for s in samples], "s string")
        .select(F.length("s").alias("n"))
        .collect()
    ]
    got_duck = [
        duckdb.sql("select len(?::VARCHAR)", params=[s]).fetchone()[0]
        for s in samples
    ]
    assert got_spark == got_duck == [5, 3, 2, 3, 2, 0]


def test_host_line_dedup_strip_matches_pandas_reference(tmp_path, spark):
    """Strip semantics on an engineered mini-corpus: a >=3-occurrence
    line dies in EVERY document of its host (kill-all, not keep-first),
    <3-occurrence and cross-host recurrences survive, and kept lines
    reassemble in original order."""
    from flink_examples_spark.queries import registry

    rows = [
        # host a: "nav bar" recurs via the 5-doc span synthesis
        (0, "a", "nav bar"), (1, "a", "body one"), (2, "a", "body two"),
        (3, "a", "body three"), (4, "a", "body four"),
        # host b: only 2 occurrences of its repeated line
        (10, "b", "twice line"), (11, "b", "other"),
        # host c: unique lines
        (20, "c", "unique x"),
    ]
    sf = _mini_docs(tmp_path, rows)

    # pandas reference: _host_span_synth + kill-all strip
    from collections import Counter

    by_src = {}
    for doc_id, src, text in sorted(rows):
        by_src.setdefault(src, []).append((doc_id, text))
    ref = {}
    for src, docs in by_src.items():
        texts = [t for _, t in docs]
        counts = Counter()
        synths = []
        for i in range(len(texts)):
            synths.append(". ".join(texts[i:i + 5]))
        for s in synths:
            for line in s.split(". "):
                counts[line] += 1
        for (doc_id, _), s in zip(docs, synths):
            lines = s.split(". ")
            kept = [ln for ln in lines if counts[ln] < 3]
            removed = [ln for ln in lines if counts[ln] >= 3]
            ref[doc_id] = (
                f"{src}.example.com", len(lines), len(removed),
                sum(len(ln) for ln in removed), ". ".join(kept),
            )

    got = {
        r.doc_id: (r.host, r.n_lines, r.n_removed, r.removed_chars,
                   r.kept_text)
        for r in registry()["host_line_dedup_strip"]
        .spark_fn(spark, sf)
        .collect()
    }
    assert got == ref
    # the kill-all actually bit on host a and ONLY host a
    assert any(v[2] > 0 for k, v in got.items()
               if v[0] == "a.example.com")
    assert all(v[2] == 0 for k, v in got.items()
               if v[0] != "a.example.com")


def test_host_line_dedup_strip_consistent_with_census(spark):
    """VERDICT r9 #2's closing condition: the strip's per-host struck
    char mass equals the census's removed_chars, and its per-host line
    instances equal the census's n_line_instances — the two stages
    describe ONE rewrite."""
    from flink_examples_spark.queries import registry

    sf = "/root/testdata/sf0.001"
    reg = registry()
    census = {
        r.host: (r.n_line_instances, r.removed_chars)
        for r in reg["host_line_dedup_census"].spark_fn(spark, sf).collect()
    }
    strip_rows = reg["host_line_dedup_strip"].spark_fn(spark, sf).collect()
    agg = {}
    for r in strip_rows:
        n, c = agg.get(r.host, (0, 0))
        agg[r.host] = (n + r.n_lines, c + r.removed_chars)
    assert agg == census


def test_incremental_url_dedup_semantics_on_hand_built_frames(spark):
    """Corpus-precedence + group algebra of the incremental probe
    (operators/crawl.py): a delta URL hitting a corpus SINGLETON forms
    a brand-new group of 2 (why the staged index keeps singletons); the
    survivor is the global min doc_id whichever side holds it; a
    delta-only URL needs >= 2 delta docs to appear; untouched corpus
    groups never appear (delta-sized output)."""
    from flink_examples_spark.operators.crawl import incremental_url_dedup

    index = spark.createDataFrame(
        [("a", 1, 5), ("b", 3, 2), ("e", 2, 1)],
        "url_norm string, n_docs long, keep_doc_id long",
    )
    delta = spark.createDataFrame(
        [(10, "a"), (11, "a"),          # corpus singleton -> group of 3
         (12, "c"), (13, "c"),          # delta-only duplicate pair
         (14, "d"),                     # delta-only singleton: no group
         (1, "b")],                     # corpus group, delta holds the min
        "doc_id long, url_norm string",
    )
    got = {
        r.url_norm: (r.n_docs, r.keep_doc_id)
        for r in incremental_url_dedup(index, delta).collect()
    }
    assert got == {
        "a": (3, 5),    # min doc_id lives in the corpus
        "b": (4, 1),    # min doc_id arrives with the delta
        "c": (2, 12),   # new group formed entirely in the delta
    }
    # 'd' (delta singleton) and 'e' (untouched corpus group) are absent
    assert "d" not in got and "e" not in got


def test_url_dedup_incremental_matches_batch_over_union(spark):
    """VERDICT r9 #3's closing condition, engine-side (the oracle pins
    it cross-engine): the incremental output equals a full batch
    url-dedup over corpus+delta RESTRICTED to delta-touched URLs."""
    from flink_examples_spark.catalog import load_table
    from flink_examples_spark.operators.crawl import url_dedup_index
    from flink_examples_spark.operators.sampling import hash_split
    from flink_examples_spark.queries import registry

    sf = "/root/testdata/sf0.001"
    docs = hash_split(
        load_table(spark, "documents", sf), "doc_id",
        weights=(("corpus", 0.9), ("delta", 0.1)), salt="uincr",
    )
    from flink_examples_spark.functions.url import (
        normalize_url, synthetic_crawl_url,
    )

    delta_urls = (
        docs.filter(F.col("split") == "delta")
        .select(
            normalize_url(
                synthetic_crawl_url("doc_id", "source")
            ).alias("url_norm")
        )
        .distinct()
    )
    batch = {
        r.url_norm: (r.n_docs, r.keep_doc_id)
        for r in url_dedup_index(docs)
        .where(F.col("n_docs") >= 2)
        .join(delta_urls, "url_norm")
        .collect()
    }
    got = {
        r.url_norm: (r.n_docs, r.keep_doc_id)
        for r in registry()["url_dedup_incremental"]
        .spark_fn(spark, sf)
        .collect()
    }
    assert got == batch and len(got) > 0


def test_url_partials_ingest_fold_equals_batch_and_replay_idempotent(
    spark, tmp_path
):
    """VERDICT r9 #4: the crawl ingest twin — per-batch per-URL
    partials — assembles the EXACT host census AND url-dedup ledger of
    the registered batch queries (one staged partial, two readers,
    shared assembly bodies via operators/crawl.py), survives a
    replayed in-flight batch without double-counting, and compaction
    (spare-newest, the additive-sums rule) changes nothing."""
    import os

    from flink_examples_spark.catalog import load_table
    from flink_examples_spark.queries import registry
    from flink_examples_spark.streaming.sinks import (
        compact_url_partials,
        read_host_boilerplate_census,
        read_url_dedup_canonical,
        url_partials_ingest_foreach_batch,
    )

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, "documents", sf).select(
        "doc_id", "source", "n_chars"
    )
    batches = [
        docs.where(F.pmod(F.col("doc_id"), F.lit(3)) == i).localCheckpoint()
        for i in range(3)
    ]

    root = str(tmp_path / "url_partials")
    apply = url_partials_ingest_foreach_batch(root)

    def census():
        return {
            r.host: (r.n_docs, r.n_pages, r.dup_page_ppm, r.chars_per_doc)
            for r in read_host_boilerplate_census(spark, root).collect()
        }

    def dedup():
        return {
            r.url_norm: (r.n_docs, r.keep_doc_id)
            for r in read_url_dedup_canonical(spark, root).collect()
        }

    apply(batches[0], 0)
    apply(batches[1], 1)
    apply(batches[2], 2)
    reg = registry()
    batch_census = {
        r.host: (r.n_docs, r.n_pages, r.dup_page_ppm, r.chars_per_doc)
        for r in reg["host_boilerplate_census"].spark_fn(spark, sf).collect()
    }
    batch_dedup = {
        r.url_norm: (r.n_docs, r.keep_doc_id)
        for r in reg["url_dedup_canonical"].spark_fn(spark, sf).collect()
    }
    assert census() == batch_census
    assert dedup() == batch_dedup

    # replay of the in-flight batch overwrites, never double-counts
    apply(batches[2], 2)
    assert census() == batch_census and dedup() == batch_dedup

    # compaction folds committed partials, spares the newest, readers
    # unchanged
    n = compact_url_partials(spark, root)
    assert n > 0
    subs = sorted(os.listdir(root))
    assert "batch=compacted" in subs and "batch=2" in subs
    assert "batch=0" not in subs and "batch=1" not in subs
    assert census() == batch_census and dedup() == batch_dedup
    # replaying the spared newest batch after compaction stays correct
    apply(batches[2], 2)
    assert census() == batch_census and dedup() == batch_dedup


def test_read_url_partials_missing_path_is_empty(spark, tmp_path):
    from flink_examples_spark.streaming.sinks import (
        read_host_boilerplate_census,
        read_url_dedup_canonical,
        read_url_partials,
    )

    out = read_url_partials(spark, str(tmp_path / "never_written"))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "url_norm", "n_docs_u", "chars_u", "min_doc_id",
    ]
    # both readers over the empty table are empty, not a crash
    assert read_host_boilerplate_census(
        spark, str(tmp_path / "never_written")
    ).count() == 0
    assert read_url_dedup_canonical(
        spark, str(tmp_path / "never_written")
    ).count() == 0


def test_host_line_strip_incremental_matches_batch_over_union(spark):
    """The incremental twin's closing condition: delta docs' strip
    verdicts (corpus index counts + within-delta counts reaching the
    threshold) equal a FULL batch host_line_dedup_strip over the whole
    synth corpus, restricted to the delta's documents — while the
    corpus is only ever touched through its staged (host,lfp,count)
    index."""
    from flink_examples_spark.catalog import load_table
    from flink_examples_spark.operators.sampling import _bucket
    from flink_examples_spark.queries import registry

    sf = "/root/testdata/sf0.001"
    reg = registry()
    batch_all = {
        r.doc_id: (r.host, r.n_lines, r.n_removed, r.removed_chars,
                   r.kept_text)
        for r in reg["host_line_dedup_strip"].spark_fn(spark, sf).collect()
    }
    got = {
        r.doc_id: (r.host, r.n_lines, r.n_removed, r.removed_chars,
                   r.kept_text)
        for r in reg["host_line_dedup_strip_incremental"]
        .spark_fn(spark, sf)
        .collect()
    }
    # delta membership per the query's own hash split
    docs = load_table(spark, "documents", sf)
    delta_ids = {
        r.doc_id
        for r in docs.select("doc_id")
        .where(_bucket("doc_id", "lincr") >= 9000)
        .collect()
    }
    assert set(got) == delta_ids and len(got) > 0
    assert got == {k: v for k, v in batch_all.items() if k in delta_ids}
    # the threshold actually bit inside the delta
    assert any(v[2] > 0 for v in got.values())


def test_host_line_partials_ingest_serves_census_and_strip_index(
    spark, tmp_path
):
    """The line-stage ingest twin: per-batch (host, lfp, n_occ,
    line_chars) partials. ONE staged artifact serves BOTH consumers —
    read_host_line_dedup_census assembles the EXACT registered census,
    and read_host_line_fp_index is a drop-in for the index the
    incremental strip probes (same strip output as the inline index).
    Replay of the in-flight batch never double-counts; spare-newest
    compaction changes nothing."""
    import os

    from flink_examples_spark.operators.crawl import with_doc_host
    from flink_examples_spark.operators.dedup import (
        host_line_fp_index,
        incremental_host_line_strip,
    )
    from flink_examples_spark.queries import _host_span_synth, registry
    from flink_examples_spark.streaming.sinks import (
        compact_host_line_partials,
        host_line_partials_ingest_foreach_batch,
        read_host_line_dedup_census,
        read_host_line_fp_index,
    )

    sf = "/root/testdata/sf0.001"
    tagged = with_doc_host(_host_span_synth(spark, sf))
    batches = [
        tagged.where(F.pmod(F.col("doc_id"), F.lit(3)) == i)
        .localCheckpoint()
        for i in range(3)
    ]

    root = str(tmp_path / "line_partials")
    apply = host_line_partials_ingest_foreach_batch(root)

    def census():
        return {
            r.host: (r.n_lines, r.n_line_instances, r.n_boiler_lines,
                     r.total_chars, r.removed_chars, r.removed_ppm)
            for r in read_host_line_dedup_census(spark, root).collect()
        }

    apply(batches[0], 0)
    apply(batches[1], 1)
    apply(batches[2], 2)
    batch_census = {
        r.host: (r.n_lines, r.n_line_instances, r.n_boiler_lines,
                 r.total_chars, r.removed_chars, r.removed_ppm)
        for r in registry()["host_line_dedup_census"]
        .spark_fn(spark, sf)
        .collect()
    }
    assert census() == batch_census

    # the SAME staged partials are the incremental strip's index: a
    # small delta (the 3 lowest doc_ids of one host) strips identically
    # against the staged index and an inline-built one
    delta = tagged.orderBy("doc_id").limit(3).localCheckpoint()

    def strip_with(index):
        return {
            r.doc_id: (r.n_lines, r.n_removed, r.removed_chars,
                       r.kept_text)
            for r in incremental_host_line_strip(
                index, delta, "doc_id", "host", "text"
            ).collect()
        }

    inline = strip_with(host_line_fp_index(tagged, "doc_id", "host", "text"))
    staged = strip_with(read_host_line_fp_index(spark, root))
    assert staged == inline and len(staged) == 3

    # replay overwrites, never double-counts
    apply(batches[2], 2)
    assert census() == batch_census

    # spare-newest compaction: readers unchanged
    n = compact_host_line_partials(spark, root)
    assert n > 0
    subs = sorted(os.listdir(root))
    assert "batch=compacted" in subs and "batch=2" in subs
    assert "batch=0" not in subs and "batch=1" not in subs
    assert census() == batch_census
    assert strip_with(read_host_line_fp_index(spark, root)) == inline

    # missing path reads empty with the right schema
    from flink_examples_spark.streaming.sinks import (
        read_host_line_partials,
    )
    empty = read_host_line_partials(spark, str(tmp_path / "nowhere"))
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        "host", "lfp", "n_occ", "line_chars",
    ]


def test_line_ingest_to_incremental_strip_e2e(spark, tmp_path):
    """VERDICT r10 #4 — the loop the module docs promise, closed end-
    to-end: ingest CORPUS docs through the line-stage twin in micro-
    batches, compact (spare-newest), then strip a NEW delta (docs the
    staged index has never seen) against the staged index — and the
    verdicts equal a FULL batch host_line_dedup_strip over the union
    (corpus + delta), restricted to the delta's documents. The corpus
    text is touched only at ingest time; the daily strip probes
    kilobyte (host, lfp, n_occ) partials."""
    import os

    from flink_examples_spark.operators.crawl import with_doc_host
    from flink_examples_spark.operators.dedup import (
        host_line_dedup_strip as strip_op,
        incremental_host_line_strip,
    )
    from flink_examples_spark.queries import _host_span_synth
    from flink_examples_spark.streaming.sinks import (
        compact_host_line_partials,
        host_line_partials_ingest_foreach_batch,
        read_host_line_fp_index,
    )

    sf = "/root/testdata/sf0.001"
    tagged = with_doc_host(_host_span_synth(spark, sf))
    corpus = tagged.where(F.pmod(F.col("doc_id"), F.lit(10)) != 0)
    delta = tagged.where(
        F.pmod(F.col("doc_id"), F.lit(10)) == 0
    ).localCheckpoint()

    root = str(tmp_path / "line_partials_e2e")
    apply = host_line_partials_ingest_foreach_batch(root)
    for i in range(3):
        apply(
            corpus.where(F.pmod(F.col("doc_id"), F.lit(3)) == i)
            .localCheckpoint(),
            i,
        )
    n = compact_host_line_partials(spark, root)
    assert n > 0 and "batch=compacted" in sorted(os.listdir(root))

    got = {
        r.doc_id: (r.host, r.n_lines, r.n_removed, r.removed_chars,
                   r.kept_text)
        for r in incremental_host_line_strip(
            read_host_line_fp_index(spark, root), delta,
            "doc_id", "host", "text",
        ).collect()
    }
    delta_ids = {r.doc_id for r in delta.select("doc_id").collect()}
    batch_union = {
        r.doc_id: (r.host, r.n_lines, r.n_removed, r.removed_chars,
                   r.kept_text)
        for r in strip_op(tagged, "doc_id", "host", "text").collect()
        if r.doc_id in delta_ids
    }
    assert got == batch_union and len(got) > 0
    # the threshold actually bit somewhere in the delta
    assert any(v[2] > 0 for v in got.values())


def test_hygiene_pipeline_staged_ingest_e2e(spark, tmp_path):
    """VERDICT r11 #1's e2e face: the composed daily-delta hygiene
    pipeline probing STAGED indexes — url partials AND host-line
    partials driven through their ingest twins in micro-batches, the
    in-flight batch replayed (no double count), spare-newest
    compaction — equals the registered inline pipeline doc-for-doc.
    The line partials are ingested over the url-KEPT corpus survivors
    derived from the staged url index (the production stage order);
    the ship-time fingerprint set derives once per snapshot from the
    same survivors."""
    import os

    from flink_examples_spark.operators.crawl import (
        incremental_hygiene_pipeline as op,
    )
    from flink_examples_spark.operators.dedup import host_line_dedup_strip
    from flink_examples_spark.queries import (
        _hygiene_corpus_survivors,
        _hygiene_delta_frames,
        _pii_raw_col,
        registry,
    )
    from flink_examples_spark.streaming.sinks import (
        compact_host_line_partials,
        compact_url_partials,
        host_line_partials_ingest_foreach_batch,
        read_host_line_fp_index,
        read_url_partials,
        url_partials_ingest_foreach_batch,
    )

    sf = "/root/testdata/sf0.001"
    corpus, delta = _hygiene_delta_frames(spark, sf)
    corpus = corpus.withColumn(
        "n_chars", F.length("text")
    ).localCheckpoint()
    delta = delta.localCheckpoint()

    # --- stage-1 index: url partials ingest, replay, compaction
    uroot = str(tmp_path / "url_partials")
    apply_u = url_partials_ingest_foreach_batch(uroot)
    for i in range(3):
        apply_u(
            corpus.where(F.pmod(F.col("doc_id"), F.lit(3)) == i)
            .localCheckpoint(),
            i,
        )
    # replay of the in-flight batch overwrites, never double-counts
    apply_u(
        corpus.where(F.pmod(F.col("doc_id"), F.lit(3)) == 2)
        .localCheckpoint(),
        2,
    )
    assert compact_url_partials(spark, uroot) > 0
    assert "batch=compacted" in sorted(os.listdir(uroot))
    uidx = read_url_partials(spark, uroot)

    # --- stage-2 index: line partials over url-KEPT survivors, where
    # the keep verdicts come from the STAGED url index itself
    c1 = _hygiene_corpus_survivors(
        corpus,
        uidx.select(
            "url_norm",
            F.col("n_docs_u").alias("n_docs"),
            F.col("min_doc_id").alias("keep_doc_id"),
        ),
    ).localCheckpoint()
    lroot = str(tmp_path / "line_partials")
    apply_l = host_line_partials_ingest_foreach_batch(lroot)
    for i in range(3):
        apply_l(
            c1.where(F.pmod(F.col("doc_id"), F.lit(3)) == i)
            .localCheckpoint(),
            i,
        )
    apply_l(
        c1.where(F.pmod(F.col("doc_id"), F.lit(3)) == 2)
        .localCheckpoint(),
        2,
    )
    assert compact_host_line_partials(spark, lroot) > 0
    lidx = read_host_line_fp_index(spark, lroot)

    # --- stage-3 index: ship-time fingerprints (once per snapshot)
    cfps = (
        host_line_dedup_strip(c1, "doc_id", "host", "text")
        .filter(F.length("kept_text") > 0)
        .select(F.md5("kept_text").alias("fp"))
        .distinct()
    )

    staged = op(
        uidx,
        lidx,
        cfps,
        delta.select("doc_id", "url_norm", "host", "text"),
        raw_col=_pii_raw_col(),
    )
    key = lambda r: (r.host, r.n_lines, r.n_removed, r.removed_chars,
                     r.n_redacted, r.scrubbed)
    got = {r.doc_id: key(r) for r in staged.collect()}
    inline = {
        r.doc_id: key(r)
        for r in registry()["incremental_hygiene_pipeline"]
        .spark_fn(spark, sf).collect()
    }
    assert got == inline and len(got) > 0
    # the stages actually bit: lines were struck and PII was redacted
    assert any(v[2] > 0 for v in got.values())
    assert all(v[4] > 0 for v in got.values())


def test_hygiene_delta_ingest_day2_loop(spark, tmp_path):
    """The DAY-2 LOOP, end-to-end: bootstrap the staged state by
    running the unified hygiene ingest face on the corpus itself
    (batch 0 against empty roots), then process two successive delta
    days (batches 1 and 2). Pins: (a) day-2's shipped output equals
    the composed pipeline probing ONE-SHOT inline-built day-2 state
    (all urls seen in batches 0-1, line counts + fingerprints over
    batches 0-1's SHIPPED kept texts) — the index-maintenance algebra
    equals one-shot construction; (b) day-1 state actually matters
    (dropping it changes day-2's output); (c) a day-2 replay is
    idempotent; (d) compacting all three roots changes nothing."""
    import os

    from flink_examples_spark.operators.crawl import (
        incremental_hygiene_pipeline as op,
    )
    from flink_examples_spark.operators.crawl import url_partials
    from flink_examples_spark.operators.dedup import host_line_fp_index
    from flink_examples_spark.queries import (
        _hygiene_delta_frames,
        _pii_raw_col,
    )
    from flink_examples_spark.streaming.sinks import (
        _fold_url_partials,
        compact_host_line_partials,
        compact_paragraph_index,
        compact_url_partials,
        hygiene_delta_ingest_foreach_batch,
    )

    sf = "/root/testdata/sf0.001"
    c, d = _hygiene_delta_frames(spark, sf)
    docs = c.unionByName(d).select(
        "doc_id", "url_norm", "host", "text"
    ).localCheckpoint()
    # hash-based day split: a modular split (doc_id % 10) correlates
    # with the synthetic host (doc_id % 20) and the repost partner
    # (doc_id + 20), making the days host-disjoint — no day could ever
    # see another's urls/lines and pin (b) would be vacuous
    from flink_examples_spark.operators.sampling import _bucket

    day = _bucket("doc_id", "hygday")
    d0 = docs.where(day < 7000).localCheckpoint()      # corpus bootstrap
    d1 = docs.where(
        (day >= 7000) & (day < 9000)
    ).localCheckpoint()                                # day 1
    d2 = docs.where(day >= 9000).localCheckpoint()     # day 2

    uroot = str(tmp_path / "urls")
    lroot = str(tmp_path / "lines")
    fproot = str(tmp_path / "fps")
    outroot = str(tmp_path / "out")
    face = hygiene_delta_ingest_foreach_batch(
        uroot, lroot, fproot, outroot, raw_col=_pii_raw_col()
    )
    for i, b in enumerate((d0, d1, d2)):
        face(b, i)

    def shipped(batch_ids):
        return spark.read.parquet(
            *[os.path.join(outroot, f"batch={i}") for i in batch_ids]
        )

    def as_dict(df):
        return {
            r.doc_id: (r.host, r.n_lines, r.n_removed, r.removed_chars,
                       r.n_redacted, r.scrubbed, r.kept_text)
            for r in df.collect()
        }

    out2 = as_dict(shipped([2]))
    assert len(out2) > 0

    # (a) one-shot reconstruction of the day-2 probe state
    def inline_state(deltas):
        seen = deltas[0]
        for x in deltas[1:]:
            seen = seen.unionByName(x)
        uidx = _fold_url_partials(url_partials(
            seen.withColumn("n_chars", F.length("text")),
            "doc_id", "doc_id", "n_chars", url=F.col("url_norm"),
        ))
        ship = shipped(range(len(deltas))).select(
            "doc_id", "host", F.col("kept_text").alias("text")
        )
        lidx = host_line_fp_index(ship, "doc_id", "host", "text")
        cfps = ship.select(F.md5("text").alias("fp")).distinct()
        return uidx, lidx, cfps

    uidx, lidx, cfps = inline_state([d0, d1])
    expected = as_dict(op(
        uidx, lidx, cfps, d2,
        raw_col=_pii_raw_col(), with_kept_text=True,
    ))
    assert out2 == expected

    # (b) day-1 state matters: day-0-only state gives a different day-2
    u0, l0, f0 = inline_state([d0])
    day0_only = as_dict(op(
        u0, l0, f0, d2, raw_col=_pii_raw_col(), with_kept_text=True,
    ))
    assert day0_only != out2

    # (c) replay of the in-flight day is idempotent
    face(d2, 2)
    assert as_dict(shipped([2])) == out2

    # (d) compaction on all three roots changes nothing
    assert compact_url_partials(spark, uroot) > 0
    assert compact_host_line_partials(spark, lroot) > 0
    assert compact_paragraph_index(spark, fproot, fp_col="fp") > 0
    face(d2, 2)
    assert as_dict(shipped([2])) == out2
    for root in (uroot, lroot, fproot):
        subs = sorted(os.listdir(root))
        assert "batch=compacted" in subs and "batch=0" not in subs


def test_incremental_url_keep_null_url_kept(spark):
    """r12 review: a NULL url_norm (unparseable/missing crawl URL) is
    NO evidence, not a duplicate group — such docs must survive with
    kept=true, not vanish through the url_norm equi-join, and distinct
    url-less docs must never dedup against each other."""
    from flink_examples_spark.operators.crawl import incremental_url_keep

    index = spark.createDataFrame(
        [("a.com/p", 1, 100)], "url_norm string, n_docs long, keep_doc_id long"
    )
    delta = spark.createDataFrame(
        [
            (1, "a.com/p", "t1"),   # corpus hit -> dropped
            (2, "b.com/q", "t2"),   # fresh url, min -> kept
            (3, "b.com/q", "t3"),   # fresh url, not min -> dropped
            (4, None, "t4"),        # no url evidence -> kept
            (5, None, "t5"),        # no url evidence -> kept (NOT deduped vs 4)
        ],
        "doc_id long, url_norm string, text string",
    )
    got = {
        r.doc_id: r.kept
        for r in incremental_url_keep(index, delta).collect()
    }
    assert got == {1: False, 2: True, 3: False, 4: True, 5: True}
