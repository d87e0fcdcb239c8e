"""Stateful job tracking (SURVEY.md ST2): the reference's AlignJob /
_wait polling state machine (workflow.py:124-159, 172-192, 435-475)
as a keyed stateful operator.

Per job key the tracker folds a stream of (tick, state, retcode)
observations into the reference's terminal facts: final state, return
code, failure flag (FAILED/KILLED or nonzero retcode — workflow.py:
146-155), and observation span.

Two faces, one fold function:
  * ``track_jobs`` — batch ``groupBy().applyInPandas`` (oracle-checkable:
    the fold is deterministic given the per-job sort, and expressible as
    arg_max SQL).
  * ``track_jobs_stream`` — ``applyInPandasWithState`` with the same fold
    applied incrementally; state is the tiny (state, retcode, n, first,
    last) tuple, evicted on timeout — bounded regardless of stream
    length.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame

VALID_STATES = {
    "NEW",
    "NEW_SAVING",
    "SUBMITTED",
    "ACCEPTED",
    "RUNNING",
    "FINISHED",
    "FAILED",
    "KILLED",
}
TERMINAL_STATES = {"FINISHED", "FAILED", "KILLED"}

OUTPUT_SCHEMA = (
    "job_id STRING, final_state STRING, retcode INT, failed BOOLEAN, "
    "n_events INT, first_tick INT, last_tick INT"
)
STATE_SCHEMA = (
    "state STRING, state_tick INT, retcode INT, n INT, first_tick INT, last_tick INT"
)


def _fold(job_id: str, pdf: pd.DataFrame, prior: tuple | None = None) -> tuple:
    """Fold observations into the job-state tuple. The current state is
    the one with the greatest tick (arg-max), so the fold is insensitive
    to observation order across micro-batches."""
    pdf = pdf.sort_values("tick")
    state, state_tick, retcode, n, first, last = prior or (None, -1, None, 0, None, None)
    for row in pdf.itertuples(index=False):
        if row.state not in VALID_STATES:  # workflow.py:187-190
            raise ValueError(f"unexpected application state {row.state!r} for {job_id}")
        t = int(row.tick)
        if t >= state_tick:
            state, state_tick = row.state, t
        if row.retcode is not None and not pd.isna(row.retcode):
            retcode = int(row.retcode)
        n += 1
        first = t if first is None else min(first, t)
        last = t if last is None else max(last, t)
    return state, state_tick, retcode, n, first, last


def _emit(job_id: str, st: tuple) -> pd.DataFrame:
    state, _state_tick, retcode, n, first, last = st
    failed = state in ("FAILED", "KILLED") or (retcode is not None and retcode != 0)
    return pd.DataFrame(
        [
            {
                "job_id": job_id,
                "final_state": state,
                "retcode": retcode,
                "failed": failed,
                "n_events": n,
                "first_tick": first,
                "last_tick": last,
            }
        ]
    )


def track_jobs(df: DataFrame) -> DataFrame:
    """Batch face: one output row per job_id."""

    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        return _emit(key[0], _fold(key[0], pdf))

    return df.groupBy("job_id").applyInPandas(fn, schema=OUTPUT_SCHEMA)


def track_jobs_stream(sdf: DataFrame, timeout: str = "NoTimeout") -> DataFrame:
    """Streaming face: incremental fold with keyed state; emits the
    current job snapshot on every update (output mode 'update'), like
    the reference's per-poll progress report (workflow.py:456-460)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        prior: tuple | None = tuple(state.get) if state.exists else None
        st: Any = prior
        for pdf in pdfs:
            st = _fold(key[0], pdf, st)
        if st is not None:
            state.update(st)
            yield _emit(key[0], st)

    return sdf.groupBy("job_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )
