"""Worker-side pandas functions (pandas-UDF bodies).

LEAF MODULE RULE: nothing here may import pyspark (directly or via the
package), because these functions are unpickled inside Spark's Python
workers — a pyspark import chain there costs seconds of startup per
worker and buys nothing. Keep this module to pandas/stdlib only.
"""

from __future__ import annotations

import hashlib

import pandas as pd

P31 = 2_147_483_647

# --------------------------------------------------------------------------
# Pipeline facade: the per-sample fake aligner (reference
# workflow.py:483-490 seal seqal / baseline_workflow.py:143-147 bwa mem)
# --------------------------------------------------------------------------


def fake_align(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for the aligner: each read pair emits one
    SAM-shaped row per mate; arithmetically identical to the SQL oracle
    in plans/pipeline_queries.py (md5-prefix position hash)."""
    sample = key[0]
    rows = []
    for r in pdf.itertuples(index=False):
        for flag, seq in ((0, r.seq1), (16, r.seq2)):
            h = int(hashlib.md5(seq.encode()).hexdigest()[:14], 16)
            rows.append(
                {
                    "qname": r.read_id,
                    "flag": flag,
                    "rname": sample,
                    "pos": (h % P31) % 100000,
                    "mapq": 60 - (len(seq) % 10),
                    "cigar": f"{len(seq)}M",
                }
            )
    return pd.DataFrame(rows, columns=["qname", "flag", "rname", "pos", "mapq", "cigar"])


# --------------------------------------------------------------------------
# Streaming job tracker (reference AlignJob, workflow.py:124-159)
# --------------------------------------------------------------------------

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


def job_fold(job_id: str, pdf: pd.DataFrame, prior: tuple | None = None) -> tuple:
    """Fold observations into the job-state tuple. Both the current
    state and the retcode are arg-max-by-tick (retcode over non-null
    observations only), so the fold is insensitive to observation order
    across micro-batches and matches the SQL oracle's arg_max."""
    pdf = pdf.sort_values("tick")
    state, state_tick, retcode, retcode_tick, n, first, last = prior or (
        None, -1, None, -1, 0, None, None,
    )
    for row in pdf.itertuples(index=False):
        if row.state not in VALID_STATES:  # workflow.py:187-190
            raise ValueError(f"unexpected application state {row.state!r} for {job_id}")
        t = int(row.tick)
        if t >= state_tick:
            state, state_tick = row.state, t
        if row.retcode is not None and not pd.isna(row.retcode) and t >= retcode_tick:
            retcode, retcode_tick = int(row.retcode), t
        n += 1
        first = t if first is None else min(first, t)
        last = t if last is None else max(last, t)
    return state, state_tick, retcode, retcode_tick, n, first, last


def job_emit(job_id: str, st: tuple) -> pd.DataFrame:
    state, _state_tick, retcode, _retcode_tick, n, first, last = st
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
