"""Background-thread exit discipline.

Daemon threads that are mid-JAX (tracing, compiling, or waiting on the
device) when the interpreter tears down abort the whole process
(`terminate called after throwing an instance of ...` out of the XLA
client's C++ destructors). The reference never hits this because its
helper is a *process* (asr_worker.py), reaped by multiprocessing; our
in-process replacements (background aligner bring-up, generator weight
derivations) must instead be joined before teardown.

`register(thread)` keeps a weak set of such threads and joins whichever
are still alive from a single atexit hook — atexit runs before daemon
threads are killed and before C++ static destructors, so the join is a
clean wait for work that is already in flight (bounded by that work, not
by a watchdog: an engine built moments before exit finishes its aligner
bring-up exactly like the reference waits for its worker handshake).
"""

from __future__ import annotations

import atexit
import threading
import weakref

_threads: "weakref.WeakSet[threading.Thread]" = weakref.WeakSet()
_lock = threading.Lock()
_hook_installed = False


def register(thread: threading.Thread) -> threading.Thread:
    """Track a started background thread for the exit join. Returns it."""
    global _hook_installed
    with _lock:
        _threads.add(thread)
        if not _hook_installed:
            atexit.register(_join_all)
            _hook_installed = True
    return thread


def _join_all() -> None:
    for t in list(_threads):
        if t.is_alive() and t is not threading.current_thread():
            t.join()
