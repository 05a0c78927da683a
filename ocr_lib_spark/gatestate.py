"""Gate-rotation state: which registry queries need external
re-verification first.

The external harness verifies a bounded prefix of ``queries()`` (~50
entries; CORRECTNESS_r03 recorded exactly the first 50 of 57 in
iteration order), so iteration order decides which queries get an
external row each round. Round 5 redesign (per ADVICE.md): order is
CHANGED-FIRST, keyed off tracked state —

* ``GATE_STATE.json`` (tracked in git, so the order is deterministic
  across checkouts) records per query the round of its last green
  external CORRECTNESS row and the implementation *fingerprint* that
  row verified (sha256 over the query fn's source and its oracle SQL).
* A query sorts into the priority tier iff its current fingerprint
  differs from the recorded one — i.e. its implementation or oracle
  changed since it was last externally verified — or it was never
  gated. Within each tier, stable registry order.

This never demotes a just-modified query (the r04 LRU scheme's flaw:
it rotated recently-gated queries to the tail, which is exactly where
a query re-gated AND re-edited in the same round would land), and an
unchanged, already-verified query keeps its stable position.

``tools/gate_state.py`` is the CLI that records a round's CORRECTNESS
results into the state file; run it at round START (before editing),
while HEAD still equals the code the driver gated. Queries whose
underlying operator code changed in a module the fingerprint does not
cover (the fn source and oracle are the fingerprint, not the
transitive imports) are marked stale explicitly with ``--touch``.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
from typing import Mapping

STATE_BASENAME = "GATE_STATE.json"


def state_path(repo_root: str | None = None) -> str:
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(root, STATE_BASENAME)


def fingerprint(fn, oracle: str | None) -> str:
    """Fingerprint of a query's semantics as the gate sees them: the
    plan-builder source plus the full oracle SQL. The oracle is a
    complete declarative statement of the query's contract (the gate
    hash-compares against it), so any semantic change must move it;
    the fn source additionally catches plan-only rewrites that keep
    the oracle (e.g. the r04 two-phase top-k)."""
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        # builtins/partials have no retrievable source. Use a stable
        # module-qualified name, NOT repr(fn): repr embeds the object's
        # memory address, which differs every process and would pin the
        # query permanently stale (ADVICE r05).
        src = f"{getattr(fn, '__module__', '?')}.{getattr(fn, '__qualname__', getattr(fn, '__name__', '?'))}"
    h = hashlib.sha256()
    h.update(src.encode())
    h.update(b"\x00")
    h.update((oracle or "").encode())
    return h.hexdigest()[:16]


def current_fingerprints(registry: Mapping) -> dict[str, str]:
    return {name: fingerprint(qd.fn, qd.oracle) for name, qd in registry.items()}


def load_state(path: str | None = None) -> dict:
    p = path or state_path()
    try:
        with open(p) as f:
            data = json.load(f)
        return data if isinstance(data, dict) else {}
    except Exception:
        return {}  # missing/corrupt state -> everything is priority tier


def priority_order(names: list[str], fps: Mapping[str, str], state: Mapping) -> list[str]:
    """Changed-or-never-gated first (registry order), then verified-
    unchanged queries OLDEST GREEN GATE FIRST (round ascending, registry
    order within a round).

    The second tier is the round-6 addition (VERDICT r05 item 3): with a
    changed-first-only rotation, a query untouched since round 2 never
    re-enters the ~50-query externally verified prefix, so oracle or
    environment drift on the unchanged tier would go unseen indefinitely.
    Aging the fp-matched tier by its recorded gate round makes every
    unchanged query cycle back through the prefix over successive rounds.
    """
    pos = {n: i for i, n in enumerate(names)}

    def key(n: str):
        rec = state.get(n)
        stale = not (isinstance(rec, dict) and rec.get("fp") == fps.get(n))
        if stale:
            return (0, 0, pos[n])
        return (1, rec.get("round") or 0, pos[n])

    return sorted(names, key=key)
