"""Golden-output fixtures ported verbatim from the reference
(SURVEY.md §5.1): the embedded deterministic inputs whose expected
behavior the reference documents in comments.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F


def test_session_window_seven_row_golden(spark):
    """windowing/SessionWindow.java:63-77: keys a/b/c at ms timestamps
    1,1,3,5,6,10,11 with a 3 ms gap -> sessions a@1, b@{1,3,5}, c@6,
    a@10, c@11 (the comments document exactly this split)."""
    from flink_examples_spark.operators.windows import session_window_agg

    rows = [("a", 1, 1), ("b", 1, 1), ("b", 3, 1), ("b", 5, 1),
            ("c", 6, 1), ("a", 10, 1), ("c", 11, 1)]
    df = spark.createDataFrame(rows, "k string, t long, v int").select(
        "k", F.timestamp_millis(F.col("t")).alias("ts"), "v"
    )
    out = session_window_agg(
        df, ts_col="ts", gap="3 milliseconds", keys=["k"],
        aggs=[F.sum("v").alias("total")],
    )
    got = sorted(
        (r["k"], int(r["session_start"].timestamp() * 1000), r["total"])
        for r in out.collect()
    )
    assert got == [
        ("a", 1, 1), ("a", 10, 1),
        ("b", 1, 3),
        ("c", 6, 1), ("c", 11, 1),
    ]


def test_twitter_canned_tweets_golden(spark, tmp_path):
    """json/TwitterJson.java:67-96 over TwitterExampleData.java:5-8:
    3 canned tweets, user.lang == 'en' and has('text') -> tokenize the
    text 'Apache Flink' -> counts apache:3, flink:3."""
    tweet = {
        "id": 0,
        "text": "Apache Flink",
        "user": {"name": "Apache Flink", "lang": "en"},
    }
    p = str(tmp_path / "tweets.json")
    with open(p, "w") as f:
        for i in range(3):
            f.write(json.dumps({**tweet, "id": i}) + "\n")
        # one non-en tweet and one without text: both must be filtered
        f.write(json.dumps({"id": 9, "text": "nope", "user": {"lang": "de"}}) + "\n")
        f.write(json.dumps({"id": 10, "user": {"lang": "en"}}) + "\n")

    from flink_examples_spark.functions.scalar import json_field, json_has
    from flink_examples_spark.sources.readers import read_text_lines

    raw = read_text_lines(spark, p)
    en = raw.filter(
        (json_field("value", "$.user.lang") == "en") & json_has("value", "$.text")
    )
    counts = (
        en.select(
            F.explode(
                F.split(F.lower(json_field("value", "$.text")), "\\W+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert {(r.word, r.n) for r in counts.collect()} == {
        ("apache", 3), ("flink", 3)
    }


def test_query_index_doc_is_current():
    """docs/QUERY_INDEX.md must be regenerated whenever the registry
    changes (tools/gen_query_index.py) — a stale index misstates the
    engine's surface."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "gen_query_index", os.path.join(root, "tools", "gen_query_index.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    text = open(os.path.join(root, "docs", "QUERY_INDEX.md")).read()
    # byte-for-byte against a fresh render (ADVICE r11: the old
    # name-presence check let a stale SUMMARY survive a doc edit)
    fresh = mod.render()
    if text != fresh:
        import difflib

        diff = "".join(
            difflib.unified_diff(
                text.splitlines(keepends=True),
                fresh.splitlines(keepends=True),
                "docs/QUERY_INDEX.md", "registry render", n=0,
            )
        )
        raise AssertionError(
            "stale docs/QUERY_INDEX.md — re-run "
            f"tools/gen_query_index.py:\n{diff[:4000]}"
        )


def test_zorder_key_interleave_golden_and_locality():
    """zorder_key bit-interleave golden: z(q1, q2) places q1's bit i at
    position 2i and q2's at 2i+1 — checked against a pure-Python Morton
    encode on boundary and random values; and sorting a grid by zkey
    gives 4-quadrant locality (each contiguous quarter of the z-range
    is one quadrant of the grid)."""
    from pyspark.sql import SparkSession

    from flink_examples_spark.functions.scalar import zorder_key

    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()

    def morton(x, y, bits=16):
        out = 0
        for i in range(bits):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    vals = [(0, 0), (65535, 65535), (1, 0), (0, 1), (43690, 21845),
            (12345, 54321), (65535, 0), (0, 65535)]
    df = spark.createDataFrame(vals, "q1 long, q2 long")
    got = {(r.q1, r.q2): r.z
           for r in df.withColumn("z", zorder_key("q1", "q2")).collect()}
    assert got == {(x, y): morton(x, y) for x, y in vals}

    # locality: an 8x8 grid scaled to 16-bit corners — the z-order of
    # the grid's top quadrant bit decides before any lower coordinate
    grid = [(x << 13, y << 13) for x in range(8) for y in range(8)]
    gdf = spark.createDataFrame(grid, "q1 long, q2 long")
    rows = sorted(
        gdf.withColumn("z", zorder_key("q1", "q2")).collect(),
        key=lambda r: r.z,
    )
    first_quarter = rows[:16]
    assert all(r.q1 < (4 << 13) and r.q2 < (4 << 13)
               for r in first_quarter)
