"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (SURVEY §2.8 extension).

The reference has no streaming state at all (batch-incremental monthly
windows, deftunes_api_pipeline.py:30-35); this is the Structured
Streaming face of its sessionization semantics. Batch twin:
``windows.sessionize_batch`` — for any prefix-ordered event stream the
two produce identical closed sessions.

Design for scale: state is one tiny tuple per user (seq, start, last,
count — four longs), Arrow-batched per group; the shuffle key is
``user_col`` so a 1000-executor cluster partitions state horizontally.
A session CLOSES when a later event of the same user arrives more than
``gap`` after the previous one; the open tail session stays in state
until a further event (or a caller-injected flush sentinel) closes it.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_seq", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
    ]
)

# (seq, start_us, last_us, n_events) — epoch micros as longs so the
# state row stays Arrow-friendly and timezone-proof.
STATE_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _session_closer(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def close_sessions(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs))
        # Micro-batch rows for a group arrive unordered; state carries
        # order across batches, sort restores it within the batch.
        ts_us = (
            batch["ts"].astype("datetime64[us]").astype("int64").sort_values()
        )
        if state.exists:
            seq, start_us, last_us, n = state.get
        else:
            seq, start_us, last_us, n = 0, None, None, 0
        closed: list[tuple[Any, int, int, int, int]] = []
        for t in ts_us:
            t = int(t)
            if start_us is None:
                seq, start_us, last_us, n = seq + 1, t, t, 1
            elif t - last_us > gap_us:
                closed.append((key[0], seq, n, start_us, last_us))
                seq, start_us, last_us, n = seq + 1, t, t, 1
            else:
                last_us, n = t, n + 1
        state.update((seq, start_us, last_us, n))
        out = pd.DataFrame(
            closed,
            columns=["user_id", "session_seq", "n_events", "_start", "_end"],
        )
        out["session_start"] = pd.to_datetime(out["_start"], unit="us")
        out["session_end"] = pd.to_datetime(out["_end"], unit="us")
        yield out.drop(columns=["_start", "_end"])

    return close_sessions


def session_stats_stateful(
    stream: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
) -> DataFrame:
    """Streaming per-user session stats via applyInPandasWithState.

    ``stream`` needs (user_col, ts:timestamp). Emits one row per CLOSED
    session; the final open session per user remains in state (inject a
    far-future sentinel event per user to flush, as the driver query
    does). The output's ``user_id`` column carries the INPUT column's
    type (string/UUID keys work — the schema is derived per call, not
    hardcoded to long)."""
    ev = stream.select(stream[user_col].alias("user_id"), "ts")
    # Output schema follows the caller's key type; a hardcoded
    # LongType would make every non-integer user key fail in the
    # Arrow conversion at runtime.
    out_schema = T.StructType(
        [T.StructField("user_id", ev.schema["user_id"].dataType)]
        + [f for f in SESSION_SCHEMA.fields if f.name != "user_id"]
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _session_closer(gap_minutes * 60),
        out_schema,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
