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
