"""Verification-evidence ledger: orders the registry so the driver's
fixed per-round correctness window always lands on the queries whose
evidence is weakest.

The driver verifies the first K queries of ``query_fns()`` each round
and records CORRECTNESS_r{N}.json. Round 2's ordering put never-checked
queries first, which accumulates coverage but has a blind spot: a query
REWRITTEN after earning its row keeps stale green evidence forever.
This module closes that hole with per-query fingerprints:

  fingerprint(name) = sha256(source of the query fn, which includes its
                             @register decorator and oracle SQL)

``verified_fingerprints.json`` records, per query, the fingerprint the
code had when its most recent driver row was earned. Ordering classes:

  0. never checked            — no CORRECTNESS row in any round
  1. stale evidence           — checked, but current fingerprint differs
                                from the recorded one (plan or oracle
                                rewritten since verification)
  2. current evidence         — checked and unchanged; stalest round
                                first, so old rows refresh round-robin

``sync()`` must run at ROUND START, before any code is edited: at that
moment the working tree is exactly the snapshot the driver verified, so
recording current fingerprints for the latest round's rows is sound.
(Recording them later would bless post-verification edits.)
Run: ``python -m flink_pipeline_spark.plans.evidence``.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import re
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parents[2]
LEDGER_PATH = Path(__file__).resolve().parent / "verified_fingerprints.json"


FP_VERSION = 2  # v2 adds one-level operator-dependency sources


def _own_source(fn) -> str:
    fn = inspect.unwrap(fn)  # the registry's hygiene wrapper is not
    try:                     # part of any query's identity (r12)
        return inspect.getsource(fn)
    except (OSError, TypeError):  # dynamically defined fn: always "changed"
        return repr(fn)


def _dep_sources(fn) -> list[str]:
    """Sources of the package functions the query body calls directly
    (resolved via co_names against the function's globals). One level
    deep: catches the r6 blind spot where an OPERATOR rewrite (e.g.
    connected_components) changes a query's behavior without touching
    its registered source or oracle, leaving green evidence stale and
    undetected. Not transitive — operator-internal helper churn is
    assumed to surface through the operator's own source."""
    fn = inspect.unwrap(fn)
    try:
        names = sorted(set(fn.__code__.co_names))
    except AttributeError:
        return []
    out = []
    for n in names:
        g = getattr(fn, "__globals__", {}).get(n)
        if callable(g) and getattr(g, "__module__", "").startswith(
            "flink_pipeline_spark"
        ):
            out.append(_own_source(g))
    return out


def fingerprint(fn, oracle: str | None, version: int = FP_VERSION) -> str:
    """Hash of the query's full registered surface: the function source
    (inspect includes the decorator call, hence the oracle literal),
    the resolved oracle string, and — from v2 — the sources of the
    package operators the body calls. Ledger entries record the
    version they were written with, so pre-v2 rows keep comparing
    under v1 (grandfathered) instead of all flooding to 'stale' when
    the algorithm itself changes."""
    h = hashlib.sha256()
    h.update(_own_source(fn).encode())
    h.update(b"\x00")
    h.update((oracle or "").encode())
    if version >= 2:
        for src in _dep_sources(fn):
            h.update(b"\x00")
            h.update(src.encode())
    return h.hexdigest()[:20]


def _row_passed(row: dict) -> bool:
    """A driver row counts as evidence only if it PASSED: no error and
    no explicit False on any recorded match flag (rows-only checks
    leave hash/schema as None). An errored or mismatched row must NOT
    bless a fingerprint — it would push a known-failing query to the
    back of the weakest-evidence-first window (the r3/r4
    q_label_centroids error was exactly such a row)."""
    if not isinstance(row, dict):
        return False
    if row.get("err") is not None:
        return False
    flags = [row.get(k) for k in ("rows_match", "schema_match", "hash_match")]
    # Require at least one affirmative True: a malformed/empty row (all
    # flags absent) must not bless evidence and push the query to the
    # back of the weakest-evidence-first window.
    if not any(f is True for f in flags):
        return False
    return all(f is not False for f in flags)


def correctness_rows() -> dict[str, int]:
    """query name -> most recent round with a PASSING driver row."""
    latest: dict[str, int] = {}
    for p in sorted(_REPO_ROOT.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", p.name)
        rnd = int(m.group(1)) if m else 0
        try:
            rows = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if _row_passed(row):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def load_ledger() -> dict:
    try:
        return json.loads(LEDGER_PATH.read_text())
    except (OSError, ValueError):
        return {"synced_rounds": [], "queries": {}}


def verification_order(queries: dict, oracles: dict) -> list[str]:
    """Registry names, weakest evidence first (see module docstring)."""
    latest = correctness_rows()
    ledger = load_ledger()["queries"]

    def klass(name: str) -> int:
        if name not in latest:
            return 0
        rec = ledger.get(name)
        if rec is None or rec.get("fp") != fingerprint(
            queries[name], oracles.get(name), version=rec.get("v", 1)
        ):
            return 1
        return 2

    # stable sort: load order preserved within (class, round) ties
    return sorted(queries, key=lambda n: (klass(n), latest.get(n, 0)))


def sync(queries: dict, oracles: dict) -> list[str]:
    """Record current fingerprints for rounds not yet synced. ONLY valid
    at round start (working tree == the snapshot the driver verified).
    Returns the query names whose ledger entries were written."""
    ledger = load_ledger()
    latest = correctness_rows()
    synced = set(ledger["synced_rounds"])
    new_rounds = sorted({r for r in latest.values() if r not in synced})
    written: list[str] = []
    for name, rnd in sorted(latest.items()):
        if rnd in new_rounds and name in queries:
            ledger["queries"][name] = {
                "fp": fingerprint(queries[name], oracles.get(name)),
                "round": rnd,
                "v": FP_VERSION,
            }
            written.append(name)
    ledger["synced_rounds"] = sorted(synced | set(new_rounds))
    LEDGER_PATH.write_text(json.dumps(ledger, indent=1, sort_keys=True) + "\n")
    return written


def main() -> None:
    from . import registry

    registry._load_all()
    written = sync(registry.QUERIES, registry.ORACLES)
    print(f"synced {len(written)} fingerprints -> {LEDGER_PATH.name}")


if __name__ == "__main__":
    main()
