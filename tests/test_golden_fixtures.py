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

    from flink_examples_spark.queries import registry

    qs = registry()
    text = open(os.path.join(root, "docs", "QUERY_INDEX.md")).read()
    assert f"{len(qs)} registered queries" in text
    missing = [n for n in qs if f"`{n}`" not in text]
    assert not missing, f"stale QUERY_INDEX.md, missing: {missing}"
