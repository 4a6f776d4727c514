"""End-of-input finalize for bounded (``availableNow``) streaming runs
— closing divergence D1 for bounded jobs (SURVEY.md §2.9 E1).

The reference's bounded demos end with an implicit
``Watermark(Long.MAX_VALUE)``: Flink's sources emit it on close, which
fires every open session window (SessionWindow.java:36-44 — the
expected session set exists ONLY because of it), flushes every CEP
partial through the timeout side output (cep/CEPTimeout.java:59-103),
and closes every pending interval-join window. Spark's ``availableNow``
trigger instead stops the watermark at ``max(event time) - delay``, so
state still open at end-of-input stays pending in append mode.

This module supplies the missing final watermark as DATA: when the
caller declares the input complete, :func:`write_finalize_sentinel`
appends one far-future row (or one per key, for operators whose horizon
is tracked per key in GroupState) to the streaming input directory.
The sentinel

- COPIES a template row from the real data, so it satisfies the same
  pre-aggregation predicates real rows do (a filter that Catalyst
  pushes below the watermark node would otherwise hide it from the
  watermark), and
- is self-identifying by its event time alone: ``ts >= FINALIZE_TS``
  (year 2200). Real event times must be below that — the one contract
  this module imposes.

Downstream, :func:`drop_finalize` — placed AFTER ``withWatermark`` —
removes sentinel rows before they reach any window/state/join. The
filter references the event-time column itself, which Spark's
``PushPredicateThroughNonJoin`` explicitly refuses to push below an
``EventTimeWatermark`` node, so the sentinel always reaches the
watermark-tracking operator, advances the query watermark to
~FINALIZE_TS on the next micro-batch, and the final no-data batch
(``spark.sql.streaming.noDataMicroBatches.enabled``, default true)
emits every open window, fires every event-time timeout, and drains
every held match — the exact effect of Flink's final MAX watermark.

Per-key-horizon operators (``streaming_cep``) do not use the query
watermark; they recognize sentinel event times directly: a sentinel
row advances the key's ``max_ts`` horizon without entering the match
buffer, so held greedy matches emit maximal and pending partials flow
through ``timeout_measures`` — again the MAX-watermark semantics.

After this, D1 remains only for genuinely UNBOUNDED runs (where no one
can declare input complete) — the same position Flink is in.
"""

from __future__ import annotations

import os
import time
from collections.abc import Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Event-time ceiling: rows at/after this instant are finalize
#: sentinels, never data. Well inside pandas' datetime64[ns] range.
FINALIZE_TS = pd.Timestamp("2200-01-01 00:00:00")
FINALIZE_TS_MS = int(FINALIZE_TS.value // 1_000_000)


def write_finalize_sentinel(
    directory: str,
    template: pd.DataFrame,
    ts_col: str = "ts",
    key_col: str | None = None,
    keys: Sequence | None = None,
    filename: str = "zzz-finalize.parquet",
) -> str:
    """Append the end-of-input sentinel file to a streaming input dir.

    ``template``: a pandas frame with the input schema; row 0 supplies
    every column value except ``ts_col`` (and ``key_col`` when fanned
    out) — so the sentinel passes the same pre-filters real rows do.

    ``key_col`` + ``keys``: for operators that track their horizon per
    key in GroupState (``streaming_cep``), write one sentinel row PER
    KEY; watermark-driven operators need only the default single row.

    The file's mtime is set to now, after every already-written chunk,
    so mtime-ordered file sources replay it LAST. Returns the path.

    HAZARD: the sentinel persists in the shared directory — batch
    readers of the same path must glob-exclude ``filename`` or apply
    :func:`drop_finalize`; call :func:`remove_finalize_sentinel` once
    the finalized run has drained (ADVICE r7).
    """
    if template.empty:
        raise ValueError("write_finalize_sentinel: empty template frame")
    base = template.iloc[[0]].copy()
    if key_col is not None or keys is not None:
        if key_col is None or keys is None:
            raise ValueError(
                "write_finalize_sentinel: key_col and keys go together"
            )
        keys = list(keys)
        if not keys:
            raise ValueError("write_finalize_sentinel: empty keys")
        pdf = pd.concat([base] * len(keys), ignore_index=True)
        pdf[key_col] = pd.Series(keys).astype(template[key_col].dtype)
    else:
        pdf = base.reset_index(drop=True)
    pdf[ts_col] = FINALIZE_TS
    pdf[ts_col] = pdf[ts_col].astype(template[ts_col].dtype)
    path = os.path.join(directory, filename)
    pdf.to_parquet(path, index=False)
    now = time.time()
    os.utime(path, (now, now))
    return path


def remove_finalize_sentinel(
    directory: str, filename: str = "zzz-finalize.parquet"
) -> bool:
    """Delete the sentinel file after the finalized run completes.

    ``write_finalize_sentinel`` leaves its year-2200 row in the SHARED
    input directory; any other consumer — a batch ``spark.read`` of the
    same directory, or a second streaming query that forgets
    :func:`drop_finalize` — would silently ingest sentinel rows
    (ADVICE r7). Call this once the finalized query has drained, or
    have batch readers glob-exclude the distinctive default filename.
    Returns True if a sentinel was removed, False if none existed."""
    path = os.path.join(directory, filename)
    try:
        os.remove(path)
        return True
    except FileNotFoundError:
        return False


def finalize_filter(ts_col: str = "ts") -> Column:
    """``ts < FINALIZE_TS`` — true for every real row."""
    return F.col(ts_col) < F.lit(FINALIZE_TS.to_pydatetime())


def drop_finalize(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Remove sentinel rows. Place AFTER ``withWatermark(ts_col, ...)``:
    the predicate references the event-time column, so Catalyst keeps it
    above the EventTimeWatermark node — the sentinel advances the
    watermark, then disappears before any window, join, or state op."""
    return df.filter(finalize_filter(ts_col))
