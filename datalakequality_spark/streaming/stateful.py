"""Custom stateful streaming operator: per-key sessionization with
``applyInPandasWithState`` (the Arrow-batched stateful surface —
SURVEY.md §2.11 lists stateful streaming as an engine-added capability
with no reference counterpart).

Semantics match the batch operator ``operators/sessions.sessionize``
(gap > ``gap_seconds`` opens a new session), incrementally:

- events arrive per micro-batch, grouped by the key; the open session
  (start/last/cardinality) lives in GroupState between batches;
- a session is EMITTED when it closes — either a later event exceeds
  the gap in-batch, or the event-time timeout fires once the watermark
  passes ``last_event + gap`` (idle key) — so output is append-only and
  each session is emitted exactly once;
- state per key is four longs (bounded regardless of event volume),
  and the timeout bounds state lifetime, so a 10^12-event stream holds
  state only for keys active within the watermark horizon.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _out_schema(key_field: T.StructField) -> T.StructType:
    return T.StructType(
        [
            key_field,
            T.StructField("session_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("start_ts", T.TimestampType()),
            T.StructField("end_ts", T.TimestampType()),
        ]
    )


_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("next_sid", T.LongType()),
    ]
)


def streaming_sessionize(
    stream_df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str | None = None,
) -> DataFrame:
    """Append-only stream of CLOSED sessions
    (key, session_id, n_events, start_ts, end_ts).

    The watermark (default: the gap itself) drives both late-data
    dropping and the event-time timeout that flushes idle sessions.
    A within-watermark straggler older than the open session's reach
    is emitted as its own closed session (taking the next session_id,
    so per-key ids stay unique but are assigned in EMISSION order, not
    event-time order — the one documented divergence from the batch
    sessionize numbering).
    """
    watermark = watermark or f"{gap_seconds} seconds"
    gap_us = gap_seconds * 1_000_000
    key_field = T.StructField(
        user_col, stream_df.schema[user_col].dataType, True
    )
    out_schema = _out_schema(key_field)
    out_cols = [f.name for f in out_schema.fields]

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        closed: list[tuple[Any, int, int, int, int]] = []
        if state.hasTimedOut:
            start, last, n, sid = state.get
            closed.append((key[0], sid, n, start, last))
            state.remove()
        else:
            if state.exists:
                start, last, n, sid = state.get
            else:
                start = last = None
                n, sid = 0, 0
            chunks = [
                pdf[ts_col].to_numpy(dtype="datetime64[ns]").astype("int64") // 1000
                for pdf in pdfs
                if len(pdf)
            ]
            if chunks:
                import numpy as np

                # straggler builder: late-but-within-watermark events
                # OLDER than the open session's reach (t < start - gap).
                # They cannot merge with the open session directly (the
                # gap between them is > gap by construction), so they
                # form their own closed session(s) — silently dropping
                # them undercounted events vs the batch sessionize
                # result (ADVICE r4). pend = (p_start, p_last, p_n).
                pend: tuple[int, int, int] | None = None
                for t in np.sort(np.concatenate(chunks)):
                    t = int(t)
                    if last is None:
                        start = last = t
                        n = 1
                    elif t - last > gap_us:
                        if pend is not None:
                            closed.append((key[0], sid, pend[2], pend[0], pend[1]))
                            sid += 1
                            pend = None
                        closed.append((key[0], sid, n, start, last))
                        sid += 1
                        start = last = t
                        n = 1
                    elif t < start - gap_us:
                        if pend is not None and t - pend[1] <= gap_us:
                            pend = (pend[0], t, pend[2] + 1)
                        else:
                            if pend is not None:
                                closed.append(
                                    (key[0], sid, pend[2], pend[0], pend[1])
                                )
                                sid += 1
                            pend = (t, t, 1)
                    else:
                        # in-gap event, possibly EARLIER than the stored
                        # state (late arrival): the session extends
                        # downward at start and must never move `last`
                        # backward — a shrinking end_ts made the
                        # event-time timeout fire before last_event+gap
                        if pend is not None:
                            if t - pend[1] <= gap_us:
                                # this event bridges the straggler chain
                                # into the open session: one session
                                n += pend[2]
                                start = pend[0]
                            else:
                                closed.append(
                                    (key[0], sid, pend[2], pend[0], pend[1])
                                )
                                sid += 1
                            pend = None
                        n += 1
                        start = min(start, t)
                        last = max(last, t)
                if pend is not None:
                    closed.append((key[0], sid, pend[2], pend[0], pend[1]))
                    sid += 1
            if last is not None:
                state.update((int(start), int(last), int(n), int(sid)))
                # flush the open session once the watermark passes
                # last_event + gap (timeout timestamps are in epoch ms)
                state.setTimeoutTimestamp(last // 1000 + gap_seconds * 1000)
        out = pd.DataFrame(
            closed, columns=[user_col, "session_id", "n_events", "_s", "_e"]
        )
        out["start_ts"] = pd.to_datetime(out["_s"], unit="us")
        out["end_ts"] = pd.to_datetime(out["_e"], unit="us")
        yield out[out_cols]

    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            out_schema,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
