"""Stateful session operator — SURVEY.md §2.11 T5/T6.

The reference's interactive workflow keeps per-workflow durable state:
it accumulates clarification answers and blocks on
``workflow.wait_condition`` until the session is complete or an
``end_workflow_signal`` arrives
(`interactive_research_workflow.py:254-318,417-551`). Signals are late
control messages folded into the same per-key state.

Spark-first re-expression: a keyed stream processed with
``applyInPandasWithState`` — state keyed by ``user_id`` (the
workflow_id analog), rows folded in event-time order, a *control row*
(``event_type == end_signal``) closing the session and emitting one
summary row. Exactly the reference's collect-until-done/interrupt
semantics, but distributed: state partitions by key hash across
executors and is checkpointed by the streaming engine (the Temporal
event-history analog).

The fold body is shared with a pure-SQL batch twin
(``events_until_first_signal``) so the semantics are DuckDB-oracle
checked; the streaming test (tests/test_streaming.py) asserts the
stateful operator reproduces the batch twin row-for-row.

Scale notes: state size is O(one struct per open key), not O(rows) —
the fold keeps only counters. At 100 TB the stream partitions by
user_id hash; a state-store timeout (``GroupStateTimeout``) bounds
abandoned-session state, mirroring the reference's workflow timeouts.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ai_iceberg_demo_spark.registry import Registry
from ai_iceberg_demo_spark.tables import load_table

if TYPE_CHECKING:
    from pyspark.sql.streaming.state import GroupState

REGISTRY = Registry()

#: schema of one completed-session summary row
SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("end_ts", TimestampType()),
    ]
)

#: running per-key state: counters only, O(1) per open session
SESSION_STATE = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("end_us", LongType()),  # event-time of close, µs
        StructField("done", BooleanType()),
    ]
)


def session_collector(end_signal: str = "error"):
    """Build the applyInPandasWithState function: collect per-key rows
    until the end signal, then emit one summary row (update mode).

    The returned closure is deliberately SELF-CONTAINED (no references
    to this module's globals): cloudpickle then serializes it by value,
    so executor Python workers need no importable copy of this package
    on their PYTHONPATH — required because the driver process may run
    with any cwd.
    """
    import pandas as pd  # noqa: F811 — rebind locally for the closure

    def _fold_session(
        rows: pd.DataFrame, n: int, total: float, done: bool
    ) -> tuple[int, float, bool, int]:
        # Fold one key's rows in event-time order; stop at the first
        # end-signal row (inclusive) — the reference's wait_condition +
        # end_workflow_signal semantics.
        end_us = 0
        rows = rows.sort_values(["ts", "event_id"])
        for _, r in rows.iterrows():
            if done:
                break
            n += 1
            total += float(r["value"])
            if r["event_type"] == end_signal:
                done = True
                end_us = int(pd.Timestamp(r["ts"]).value // 1_000)
        return n, total, done, end_us

    def collect(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, total, end_us, done = state.get
        else:
            n, total, end_us, done = 0, 0.0, 0, False
        if done:  # session already closed and emitted
            return
        for pdf in pdfs:
            n, total, done, new_end = _fold_session(pdf, n, total, done)
            end_us = new_end or end_us
        state.update((n, total, end_us, done))
        if done:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                    "end_ts": [pd.Timestamp(end_us * 1_000)],
                }
            )

    return collect


def stateful_sessions(events: DataFrame, end_signal: str = "error") -> DataFrame:
    """T5/T6 as a streaming operator: per-key collect-until-signal.

    ``events`` may be a streaming or batch DataFrame with columns
    (event_id, ts, user_id, event_type, value); streaming input needs
    update output mode.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        session_collector(end_signal),
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


@REGISTRY.register(
    name="t5_stateful_session",
    survey_ref="T5,T6",
    doc="batch twin of the stateful collect-until-signal session "
    "(interactive_research_workflow.py:254-318,548-551): per user, fold "
    "events in time order until the first 'error' control row, emit one "
    "summary. Streaming form: stateful_sessions() via "
    "applyInPandasWithState (asserted equal in tests/test_streaming.py).",
    bench=True,
    oracle="""
        WITH first_sig AS (
            SELECT user_id, MIN(ts) AS end_ts FROM events
            WHERE event_type = 'error' GROUP BY user_id
        )
        SELECT e.user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(e.value AS DECIMAL(14,2))) AS DOUBLE) AS total_value,
               MAX(e.ts) AS end_ts
        FROM events e JOIN first_sig f
          ON e.user_id = f.user_id AND e.ts <= f.end_ts
        GROUP BY e.user_id
    """,
)
def t5_stateful_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_until_first_signal(load_table(spark, "events", sf_dir))


def events_until_first_signal(events: DataFrame, end_signal: str = "error") -> DataFrame:
    """Pure-DataFrame batch twin: all events per user up to and
    including the first end-signal row. Window min + filter — two
    narrow shuffles on user_id, both co-partitioned."""
    first_sig = (
        events.filter(F.col("event_type") == end_signal)
        .groupBy("user_id")
        .agg(F.min("ts").alias("end_ts"))
    )
    return (
        events.join(first_sig, "user_id")
        .filter(F.col("ts") <= F.col("end_ts"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias("total_value"),
            F.max("ts").alias("end_ts"),
        )
    )


# ---------------------------------------------------------------------------
# streaming twin of t30_rate_limit (per-key sliding-window throttle)
# ---------------------------------------------------------------------------

#: one denied event per output row
RATE_OUTPUT = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("n_in_window", LongType()),
    ]
)

#: per-key state: event-time stamps (µs) still inside the window —
#: bounded by the per-user arrival rate × window, NOT stream length
RATE_STATE = StructType([StructField("ts_us", ArrayType(LongType()))])


def rate_limiter(cap: int = 6, window_s: int = 86_400):
    """applyInPandasWithState body for the sliding-window rate limiter:
    per key, fold events in event-time order keeping the timestamps
    inside the trailing window; an event whose inclusive in-window
    count exceeds ``cap`` is emitted as denied — bit-identical to
    t30's batch RANGE-frame window when batches arrive in event-time
    order (the stream≡batch test's harness guarantee, and Kafka's
    per-key ordering guarantee in production). Self-contained closure
    (cloudpickle-by-value, as session_collector documents)."""
    import pandas as pd  # noqa: F811

    win_us = window_s * 1_000_000

    def limit(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        buf = list(state.get[0]) if state.exists else []
        denied_ids, denied_counts = [], []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for _, r in pdf.iterrows():
                t = int(pd.Timestamp(r["ts"]).value // 1_000)
                lo = t - (win_us - 1)
                buf = [x for x in buf if x >= lo]
                buf.append(t)
                if len(buf) > cap:
                    denied_ids.append(int(r["event_id"]))
                    denied_counts.append(len(buf))
        state.update((buf,))
        if denied_ids:
            yield pd.DataFrame(
                {
                    "event_id": denied_ids,
                    "user_id": [key[0]] * len(denied_ids),
                    "n_in_window": denied_counts,
                }
            )

    return limit


def stateful_rate_limit(events: DataFrame, cap: int = 6, window_s: int = 86_400) -> DataFrame:
    """t30's streaming form: denied events from a keyed stateful fold;
    works on streaming (update mode) or batch input."""
    return events.groupBy("user_id").applyInPandasWithState(
        rate_limiter(cap, window_s),
        outputStructType=RATE_OUTPUT,
        stateStructType=RATE_STATE,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


# ---------------------------------------------------------------------------
# event-time TIMEOUT sessions (the reference's workflow-timeout analog)
# ---------------------------------------------------------------------------

#: flushed-session row: how it ended distinguishes signal vs timeout
TIMEOUT_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_us", LongType()),
        StructField("ended_by", StringType()),
    ]
)

TIMEOUT_STATE = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_us", LongType()),
        StructField("done", BooleanType()),
    ]
)


def timeout_session_collector(gap_s: int = 6 * 3600, end_signal: str = "error"):
    """applyInPandasWithState body with EVENT-TIME TIMEOUT: per key,
    fold events; the first end-signal row closes the session
    (ended_by='signal'); a key silent for ``gap_s`` of EVENT time —
    the watermark passing last_event + gap — flushes a partial
    session (ended_by='timeout'). This is the reference's
    workflow-timeout rule (`interactive_research_workflow.py`
    wait_condition deadline) on distributed state: abandoned keys
    can't pin the state store. Self-contained closure (cloudpickle
    by value)."""
    import pandas as pd  # noqa: F811

    gap_us = gap_s * 1_000_000

    def collect(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, total, last_us, done = state.get
            state.remove()
            if not done:  # tombstones never re-emit
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "n_events": [n],
                        "total_value": [round(total, 2)],
                        "last_us": [last_us],
                        "ended_by": ["timeout"],
                    }
                )
            return
        n, total, last_us, done = (
            state.get if state.exists else (0, 0.0, 0, False)
        )
        for pdf in pdfs:
            if done:
                break
            pdf = pdf.sort_values(["ts", "event_id"])
            for _, r in pdf.iterrows():
                if done:  # t5 parity: a closed session stays closed
                    break
                n += 1
                total += float(r["value"])
                last_us = int(pd.Timestamp(r["ts"]).value // 1_000)
                if r["event_type"] == end_signal:
                    done = True
        if done and not (state.exists and state.get[3]):
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                    "last_us": [last_us],
                    "ended_by": ["signal"],
                }
            )
        # keep the tombstone but let it expire with the same timeout so
        # closed keys cannot pin the state store forever
        state.update((n, total, last_us, done))
        state.setTimeoutTimestamp(last_us // 1_000 + gap_s * 1_000)

    return collect


def stateful_sessions_with_timeout(
    events: DataFrame, gap_s: int = 6 * 3600, end_signal: str = "error"
) -> DataFrame:
    """T5/T6 + timeout: collect-until-signal sessions whose abandoned
    keys flush when the watermark passes last_event + gap. Requires a
    watermark on ``ts`` (event-time timeout contract)."""
    return (
        events.withWatermark("ts", "1 second")
        .groupBy("user_id")
        .applyInPandasWithState(
            timeout_session_collector(gap_s, end_signal),
            outputStructType=TIMEOUT_OUTPUT,
            stateStructType=TIMEOUT_STATE,
            outputMode="update",
            timeoutConf="EventTimeTimeout",
        )
    )
