"""Stateful streaming sessionization — the custom-stateful-operator shape
Structured Streaming can't express with built-in windowed aggregation.

``session_window`` covers gap sessions with built-in aggregates only; the
per-user session STATE here (an open session that must merge events across
micro-batches, close on a gap, and flush on event-time timeout) is the
canonical ``applyInPandasWithState`` use case. Semantics match the batch
``sessionize_events`` query exactly on a closed, in-order input: a session
is a maximal run of a user's events with consecutive gaps ≤ ``gap_s``
(epoch-second comparison, the batch query's ``> 1800`` boundary).

Design:
- events arrive via file-source ``readStream`` with a ``ts`` watermark;
  state for a user is the single open session (start/last epoch-second,
  event count) — O(1) per user, NOT the event list, so state size is
  bounded regardless of session length;
- closed sessions emit in the batch that closes them (append mode);
  the final open session emits when the event-time timeout fires, i.e.
  once the watermark passes ``last_event + gap_s`` — the streaming analog
  of "the input ended";
- cross-batch ordering: within a batch events are sorted before folding;
  across batches correctness relies on the watermark (an event older than
  watermark − gap would have been merged into an already-emitted session;
  the file source + chronological landing order used by the ingest keeps
  this exact, and late events inside the watermark still merge because the
  open session only times out past it).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

import pandas as pd
from pyspark.sql import SparkSession, types as T

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.state import GroupState

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

SESSION_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start_s", T.LongType(), False),
        T.StructField("session_end_s", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)

# open-session state: (start_s, last_s, n)
SESSION_STATE = T.StructType(
    [
        T.StructField("start_s", T.LongType(), False),
        T.StructField("last_s", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
    ]
)


def fold_sessions(
    secs: list[int],
    open_s: tuple[int, int, int] | None,
    gap_s: int,
) -> tuple[list[tuple[int, int, int]], tuple[int, int, int] | None]:
    """Fold ascending event seconds into gap sessions: returns (closed
    sessions, open session), each (start_s, last_s, n). Associative over
    chronological chunk splits — folding chunk-by-chunk with the carried
    open session equals one-shot sessionization (hypothesis-tested), which
    is exactly the cross-micro-batch state invariant."""
    closed: list[tuple[int, int, int]] = []
    for s in secs:
        if open_s is None:
            open_s = (s, s, 1)
        elif s - open_s[1] > gap_s:
            closed.append(open_s)
            open_s = (s, s, 1)
        else:
            open_s = (open_s[0], max(open_s[1], s), open_s[2] + 1)
    return closed, open_s


def _make_sessionizer(gap_s: int, session_tz: str | None = None):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: "GroupState",
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # watermark passed last_event + gap: the open session is final
            start_s, last_s, n = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "session_start_s": [start_s],
                 "session_end_s": [last_s], "n_events": [n]}
            )
            return

        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"])
        # Arrow hands timestamps over as tz-NAIVE values localized to the
        # Spark session timezone; the event-time timeout below compares
        # against the (UTC-epoch) watermark, so the epoch extraction must
        # localize back through the session tz — treating the naive value
        # as UTC in a non-UTC session would set timeouts hours off (west
        # of UTC: in the past, killing the query once the stream holds
        # more data than the offset; east: shifting every emitted second)
        ts = batch["ts"].astype("datetime64[ns]")
        if session_tz:
            # DST safety (ADVICE r5 #2): in a session tz that observes DST,
            # a naive value inside the fall-back hour is ambiguous and one
            # inside the spring-forward gap doesn't exist; the default
            # tz_localize raises and kills the streaming query. Resolve
            # deterministically instead: ambiguous → standard time
            # (ambiguous=False), nonexistent → shift forward across the
            # gap. LIMITATION: the true instant of a fall-back-hour event
            # is unrecoverable from a naive timestamp, so gaps spanning
            # that hour can be under-measured by up to 1 h versus the real
            # event times, and batch engines may pick the other offset for
            # the same naive value. Run the sessionizer under a UTC session
            # timezone — the engine default, and what the driver-gate
            # parity row uses — when exact gap semantics matter.
            ts = ts.dt.tz_localize(
                session_tz, ambiguous=False, nonexistent="shift_forward")
        secs = (ts.astype("int64") // 1_000_000_000).tolist()

        open_s = tuple(state.get) if state.exists else None
        closed, open_s = fold_sessions(secs, open_s, gap_s)
        state.update(open_s)
        # fire once the event-time watermark passes the gap horizon
        state.setTimeoutTimestamp((open_s[1] + gap_s) * 1000 + 1)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start_s": [c[0] for c in closed],
                    "session_end_s": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return fn


def stream_sessions(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap_s: int = 1800,
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Start (or resume) the sessionization stream; returns the
    StreamingQuery. The parquet file sink's manifest gives exactly-once
    output; ``available_now`` drains the current input and stops."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    session_tz = spark.conf.get("spark.sql.session.timeZone", None)
    events = (
        spark.readStream.schema(EVENTS)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
        .withWatermark("ts", watermark)
    )
    sessions = events.groupBy("user_id").applyInPandasWithState(
        _make_sessionizer(gap_s, session_tz),
        SESSION_OUT,
        SESSION_STATE,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
    writer = (
        sessions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
