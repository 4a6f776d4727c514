"""Batch reader/writer round-trips (S1-S5, K3/K4) + schema registry."""

from __future__ import annotations

import os

from flink_examples_spark.sources.readers import (
    from_elements,
    read_csv_records,
    read_json_records,
    read_text_lines,
    write_csv,
    write_orc_lz4,
    write_text,
)
from flink_examples_spark.sources.schemas import (
    STUDENT_DDL,
    USER_BEHAVIOR_DDL,
    with_event_time,
)


def test_csv_pojo_roundtrip(spark, tmp_path):
    """S5: schema-ful CSV with explicit field order (HotItems.java:47-55)."""
    p = str(tmp_path / "ub.csv")
    with open(p, "w") as f:
        f.write("543462,1715,1464116,pv,1511658000\n")
        f.write("662867,2244074,1575622,buy,1511658000\n")
    df = read_csv_records(spark, p, USER_BEHAVIOR_DDL)
    rows = df.orderBy("userId").collect()
    assert rows[0]["userId"] == 543462 and rows[0]["behavior"] == "pv"
    assert df.schema.fieldNames() == [
        "userId", "itemId", "categoryId", "behavior", "timestamp"
    ]
    # epoch-seconds -> event_time (HotItems.java:62)
    ts = with_event_time(df, "timestamp", "seconds").select("event_time").first()
    assert ts["event_time"].year == 2017


def test_text_multi_path_union(spark, tmp_path):
    """S2: multi-file union is just a multi-path scan."""
    p1, p2 = str(tmp_path / "a.txt"), str(tmp_path / "b.txt")
    for p, content in [(p1, "to be\n"), (p2, "or not to be\n")]:
        with open(p, "w") as f:
            f.write(content)
    assert read_text_lines(spark, [p1, p2]).count() == 2


def test_json_records_with_renamed_field(spark, tmp_path):
    """Log.java:12 @JsonProperty("user_id") — the JSON key is the column."""
    p = str(tmp_path / "logs.json")
    with open(p, "w") as f:
        f.write('{"plat":"ios","lt":"click","user_id":7,"timestamp":1600000000000}\n')
    df = read_json_records(
        spark, p, "plat string, lt string, user_id int, timestamp long"
    )
    r = df.first()
    assert r["user_id"] == 7 and r["plat"] == "ios"


def test_orc_lz4_roundtrip(spark, tmp_path):
    """K3: ORC + LZ4 (FsBulkFormatSink.java:46-50), vectorization native."""
    out = str(tmp_path / "orc")
    df = from_elements(
        spark, [(1, "alice", 90.5), (2, "bob", 82.0)], STUDENT_DDL
    )
    write_orc_lz4(df, out)
    back = spark.read.orc(out)
    assert back.count() == 2
    assert {r["name"] for r in back.collect()} == {"alice", "bob"}
    assert any(f.endswith(".orc") for f in os.listdir(out))


def test_write_text_and_csv(spark, tmp_path):
    tdir, cdir = str(tmp_path / "t"), str(tmp_path / "c")
    df = from_elements(spark, [("hello",), ("world",)], "value string")
    write_text(df, tdir)
    assert spark.read.text(tdir).count() == 2
    df2 = from_elements(spark, [(1, "a"), (2, "b")], "id int, s string")
    write_csv(df2, cdir)
    assert spark.read.schema("id int, s string").csv(cdir).count() == 2
