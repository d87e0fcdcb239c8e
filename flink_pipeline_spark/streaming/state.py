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
    applied incrementally; state is the tiny 7-field tuple of
    STATE_SCHEMA (state+tick, retcode+tick, count, first/last tick),
    evicted on timeout — bounded regardless of stream length.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame

from ..functions.udfs import VALID_STATES, job_emit as _emit, job_fold as _fold

TERMINAL_STATES = {"FINISHED", "FAILED", "KILLED"}

OUTPUT_SCHEMA = (
    "job_id STRING, final_state STRING, retcode INT, failed BOOLEAN, "
    "n_events INT, first_tick INT, last_tick INT"
)
STATE_SCHEMA = (
    "state STRING, state_tick INT, retcode INT, retcode_tick INT, "
    "n INT, first_tick INT, last_tick INT"
)


def track_jobs(df: DataFrame) -> DataFrame:
    """Batch face: one output row per job_id."""
    from ..catalog import _ensure_session_conf

    _ensure_session_conf(df.sparkSession)

    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        return _emit(key[0], _fold(key[0], pdf))

    return df.groupBy("job_id").applyInPandas(fn, schema=OUTPUT_SCHEMA)


def track_jobs_stream(
    sdf: DataFrame, timeout: str = "NoTimeout", timeout_ms: int = 60_000
) -> DataFrame:
    """Streaming face: incremental fold with keyed state; emits the
    current job snapshot on every update (output mode 'update'), like
    the reference's per-poll progress report (workflow.py:456-460).

    With ``timeout="ProcessingTimeTimeout"`` a job silent for
    ``timeout_ms`` of processing time is EVICTED: its state is removed
    (keyed state stays bounded regardless of stream length) and its
    final snapshot is emitted — the reference's give-up-on-silent-job
    policy (experiment.py:345-357)."""
    from ..catalog import _ensure_session_conf

    _ensure_session_conf(sdf.sparkSession)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if timeout not in ("NoTimeout", "ProcessingTimeTimeout"):
        # EventTimeTimeout needs a caller-supplied watermark column; not
        # part of the reference semantics (its poller is wall-clock).
        raise ValueError(f"unsupported timeout {timeout!r}")

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            # Idle key: emit the last snapshot as the job's final word,
            # then drop the state — NOT update(), which would resurrect
            # the key and leak state forever.
            final: tuple | None = tuple(state.get) if state.exists else None
            state.remove()
            if final is not None:
                yield _emit(key[0], final)
            return
        prior: tuple | None = tuple(state.get) if state.exists else None
        st: Any = prior
        for pdf in pdfs:
            st = _fold(key[0], pdf, st)
        if st is not None:
            state.update(st)
            if timeout == "ProcessingTimeTimeout":
                state.setTimeoutDuration(timeout_ms)
            yield _emit(key[0], st)

    return sdf.groupBy("job_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )
