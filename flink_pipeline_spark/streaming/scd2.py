"""Streaming SCD Type-2 change-history maintenance — the deployment
form of the batch q_scd2_history (plans/streaming_queries.py): keyed
state holds each key's OPEN validity interval; every arriving change
CLOSES the previous interval and emits it downstream, exactly the
incremental CDC merge a warehouse runs between full reprocessings.

Equivalence contract (pinned by tests/test_streaming.py): feeding a
key's events in event-time order produces precisely the batch query's
closed rows (is_current = false); the still-open interval per key
lives in state, matching the batch query's is_current row. Within a
micro-batch, events are sorted by (es, event_id) — the same total
order the batch windows use — so intra-batch disorder is absorbed;
ACROSS batches the operator assumes per-key event-time monotonicity
(the file/Kafka-partition-per-key layout). A deployment with genuinely
late cross-batch data puts a watermark + event-time sort in front, or
treats emitted rows as a correction log — the standard CDC trade; the
state itself stays a 2-field tuple per key regardless.

Scale: state is (open_type, open_from) per key — bytes, not history;
emitted rows leave the operator immediately. Arrow-batched
applyInPandasWithState, grouped by the same user_id key the batch
windows partition on.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame

OUTPUT_SCHEMA = (
    "user_id LONG, event_type STRING, valid_from LONG, valid_to LONG"
)
STATE_SCHEMA = "open_type STRING, open_from LONG"


def scd2_changes_stream(sdf: DataFrame) -> DataFrame:
    """Streaming face: ``sdf`` must carry (user_id, event_id, es,
    event_type) with ``es`` the BIGINT epoch-second event time (the
    batch query's own convention). Emits one row per CLOSED validity
    interval, in 'update' output mode."""
    from ..catalog import _ensure_session_conf

    _ensure_session_conf(sdf.sparkSession)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        user = key[0]
        open_type, open_from = state.get if state.exists else (None, None)
        rows = pd.concat(list(pdfs), ignore_index=True)
        closed: list[tuple] = []
        if len(rows):
            rows = rows.sort_values(["es", "event_id"])
            for es, et in zip(rows["es"], rows["event_type"]):
                if open_type is None:
                    open_type, open_from = et, int(es)
                elif et != open_type:
                    closed.append((user, open_type, int(open_from), int(es)))
                    open_type, open_from = et, int(es)
            state.update((open_type, int(open_from)))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "event_type", "valid_from", "valid_to"],
            )

    return sdf.groupBy("user_id").applyInPandasWithState(
        fn,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
