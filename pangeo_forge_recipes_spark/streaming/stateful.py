"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming engine (SURVEY §2.8); the charter's scale
surface calls for arbitrary per-key streaming state beyond built-in
windowed aggregation. The model operator here is day-gap sessionization —
the streaming face of the ``events_sessions`` batch query, carrying
``(last_date, n_sessions, n_events)`` per user across micro-batches so a
restarted or long-running stream keeps exact counts.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUTPUT_SCHEMA = "user_id long, n_sessions long, n_events long"
_STATE_SCHEMA = "last_date string, n_sessions long, n_events long"


def stateful_sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user session counting with persistent state: a new session starts
    on the first event or when the calendar date changes (identical
    semantics to the LAG-based batch query ``events_sessions``). Events
    must arrive date-ordered per user across micro-batches (file-arrival
    order in the manifest stream), matching the batch query's ordering.

    Emits one updated ``(user_id, n_sessions, n_events)`` row per user per
    micro-batch (output mode ``update``).
    """

    def fold(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs))
        if rows.empty:
            return
        rows = rows.sort_values([ts_col, id_col])
        if state.exists:
            last_date, n_sessions, n_events = state.get
        else:
            last_date, n_sessions, n_events = None, 0, 0
        for d in rows[ts_col].dt.strftime("%Y-%m-%d"):
            if last_date is None or d != last_date:
                n_sessions += 1
            last_date = d
            n_events += 1
        state.update((last_date, n_sessions, n_events))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [n_sessions],
                "n_events": [n_events],
            }
        )

    return events.groupBy(user_col).applyInPandasWithState(
        fold,
        _OUTPUT_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
