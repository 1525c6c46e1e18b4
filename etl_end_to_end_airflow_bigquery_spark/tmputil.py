"""Session-scoped temp-dir registry (VERDICT r06 item 7, ADVICE r6).

Several gated queries materialize bounded intermediate state to local
parquet (time-travel table copies, IVM state, RFM stage tables, variant
shredded roundtrips, streaming checkpoints). The RETURNED frame reads
those paths lazily, so the query function cannot ``rmtree`` before
returning — and ``tempfile.mkdtemp`` alone leaks one directory per
invocation: the driver gate and ``bench.py`` (N_RUNS=3) re-invoke each
query repeatedly, accumulating full table copies on disk across a
long-lived session.

:func:`session_tmpdir` registers every directory it creates;
:func:`sweep_tmpdirs` removes them all once results are consumed. An
``atexit`` hook guarantees process-exit cleanup even when the caller
(gate driver, pytest, ad-hoc session) never sweeps explicitly.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_TMP_ROOTS: list[str] = []


def session_tmpdir(prefix: str) -> str:
    """``tempfile.mkdtemp`` that the session remembers and sweeps."""
    d = tempfile.mkdtemp(prefix=prefix)
    _TMP_ROOTS.append(d)
    return d


def sweep_tmpdirs() -> int:
    """Remove every registered temp dir. Call only after all frames
    returned by temp-materializing queries have been collected — the
    lazy plans read these paths. Returns the number of dirs removed."""
    n = 0
    while _TMP_ROOTS:
        d = _TMP_ROOTS.pop()
        shutil.rmtree(d, ignore_errors=True)
        n += 1
    return n


atexit.register(sweep_tmpdirs)
