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
