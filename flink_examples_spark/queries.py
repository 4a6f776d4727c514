"""Query registry: every SURVEY.md §2 capability as a (Spark, oracle-SQL) pair.

Each entry is a named query. The Spark side is a function
``(spark, sf_dir) -> DataFrame``; the oracle side is ANSI SQL DuckDB runs
on the same parquet tables (views pre-registered by the driver). Column
names are aliased identically on both sides; double aggregations go
through DECIMAL(18,2) casts on both sides so sums are exact (order-
independent) and hash-compare bit-for-bit; every rank/top-N has a total
order (unique tiebreak) so membership is deterministic.

Entries without an oracle (non-SQL-expressible ops) set ``oracle=None``
and get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_examples_spark.catalog import load_table


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = Query(name, fn, oracle, doc)
        return fn

    return deco


def registry() -> dict[str, Query]:
    return dict(_REGISTRY)


def _dec(col, scale: int = 2):
    return F.col(col).cast(f"decimal(18,{scale})")


# ---------------------------------------------------------------------------
# Flagship: HotItems sliding-window top-N (SURVEY §7.2; HotItems.java:55-81)
# ---------------------------------------------------------------------------

@register(
    "hot_items_sliding_topn",
    oracle="""
    WITH pv AS (
        SELECT user_id, ts FROM events WHERE event_type = 'view'
    ), expanded AS (
        SELECT time_bucket(INTERVAL '5 minutes', ts)
                 - g.k * INTERVAL '5 minutes' + INTERVAL '60 minutes' AS window_end,
               user_id
        FROM pv CROSS JOIN generate_series(0, 11) AS g(k)
    ), counts AS (
        SELECT window_end, user_id, count(*) AS view_count
        FROM expanded GROUP BY 1, 2
    )
    SELECT window_end, user_id, view_count, rank FROM (
        SELECT *, row_number() OVER (
            PARTITION BY window_end ORDER BY view_count DESC, user_id ASC
        ) AS rank
        FROM counts
    ) t WHERE rank <= 3
    """,
    doc="W3+T1: sliding window (1h,5m) count per key, top-3 per window end. "
        "Ref: topn/HotItems.java:55-147.",
)
def hot_items_sliding_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_examples_spark.operators.topn import hot_items

    return hot_items(load_table(spark, "events", sf_dir))


# ---------------------------------------------------------------------------
# Relational aggregation core (A1-A5)
# ---------------------------------------------------------------------------

@register(
    "pricing_summary",
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))
                 * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="A1: grouped sums/averages with early filter (TPC-H Q1 shape). "
        "Partial+final hash agg; filter pushed to parquet scan.",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, "lineitem", sf_dir)
    disc_price = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    charge = disc_price * (1 + _dec("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(_dec("l_discount")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "tumbling_hourly_stats",
    oracle="""
    SELECT
        time_bucket(INTERVAL '1 hour', ts) AS window_start,
        time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
        event_type,
        COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    doc="W2+A1: tumbling 1h event-time window per event_type. "
        "Ref: WindowWordCount.java:47-51, SideOutput.java:73.",
)
def tumbling_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_examples_spark.operators.windows import tumbling_window_agg

    return tumbling_window_agg(
        load_table(spark, "events", sf_dir),
        "ts",
        "1 hour",
        ["event_type"],
        [
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        ],
    )


@register(
    "session_windows",
    oracle="""
    WITH marked AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT *, SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING
        ) AS session_id
        FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
    doc="W4: session window, 30 min gap, per user. Ref: SessionWindow.java:52-56.",
)
def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_examples_spark.operators.windows import session_window_agg

    return session_window_agg(
        load_table(spark, "events", sf_dir),
        "ts",
        "30 minutes",
        ["user_id"],
        [
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        ],
    ).select("user_id", "session_start", "session_end", "n_events", "sum_value")


@register(
    "count_windows",
    oracle="""
    SELECT user_id, fire_at_row, window_count, window_sum FROM (
        SELECT user_id,
               row_number() OVER w AS fire_at_row,
               COUNT(*) OVER f AS window_count,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER f AS DOUBLE) AS window_sum
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
               f AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    ) t WHERE fire_at_row % 5 = 0
    """,
    doc="W1: count window (size 10, slide 5) per key — batch formulation. "
        "Ref: WindowWordCount.java:57 countWindow(10,5).",
)
def count_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_examples_spark.operators.windows import count_window_agg

    return count_window_agg(
        load_table(spark, "events", sf_dir),
        "ts",
        ["user_id"],
        size=10,
        slide=5,
        value_col="value",
        order_tiebreak="event_id",
    )


@register(
    "count_distinct_daily",
    oracle="""
    SELECT date_trunc('day', ts) AS day,
           event_type,
           COUNT(DISTINCT user_id) AS uniq_users
    FROM events GROUP BY 1, 2
    """,
    doc="A5: COUNT(DISTINCT) per window. Ref: flink-sql/sql/ddl/Time.md:16-18.",
)
def count_distinct_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, "events", sf_dir)
        .groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"),
            "event_type",
        )
        .agg(F.count_distinct("user_id").alias("uniq_users"))
    )


@register(
    "max_by_event",
    oracle="""
    SELECT event_type, event_id, user_id, value FROM (
        SELECT event_type, event_id, user_id, value,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY value DESC, event_id DESC
               ) AS rn
        FROM events
    ) t WHERE rn = 1
    """,
    doc="A2: maxBy — record with max value per key, deterministic tiebreak. "
        "Ref: CustomizeEvictorAndTrigger.java:61.",
)
def max_by_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_examples_spark.operators.topn import top_n_per_group

    return top_n_per_group(
        load_table(spark, "events", sf_dir).select(
            "event_type", "event_id", "user_id", "value"
        ),
        ["event_type"],
        [F.desc("value"), F.desc("event_id")],
        1,
        rank_col="rn",
    ).drop("rn")


# ---------------------------------------------------------------------------
# Word count family (P2 flatMap; WordCount.java:73-88, SideOutput.java:89-103)
# ---------------------------------------------------------------------------

@register(
    "wordcount",
    oracle="""
    SELECT word, COUNT(*) AS cnt FROM (
        SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents
    ) t WHERE word <> '' GROUP BY word
    """,
    doc="P2+A1: tokenize → count. Ref: wordcount/WordCount.java:73-88.",
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "wordcount_side_output",
    oracle="""
    SELECT CASE WHEN length(word) > 5 THEN 'rejected' ELSE 'main' END AS channel,
           word, COUNT(*) AS cnt
    FROM (
        SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents
    ) t WHERE word <> ''
    GROUP BY 1, 2
    """,
    doc="P7: side-output split — words len>5 routed to 'rejected' channel. "
        "Ref: SideOutput.java:26-27,89-103.",
)
def wordcount_side_output(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    words = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.withColumn(
            "channel",
            F.when(F.length("word") > 5, F.lit("rejected")).otherwise(F.lit("main")),
        )
        .groupBy("channel", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("channel", "word", "cnt")
    )
