"""Execution-context tuning shared by the library's pipelines.

``unreserved`` disables Ray Data's per-op resource reservation
(``DataContext.op_resource_reservation_enabled``) for the datasets a
pipeline function creates. The reservation allocator splits the CPU
budget evenly across ALL ops of a plan; in short plans that end in an
all-to-all (read → map_batches → groupby/sort), the barrier ops cannot
run a single task until the map stage finishes, yet they hold most of
the budget — measured on the 32-cpu index build: the hot stage capped at
4 concurrent tasks (12.8 of 32 CPUs) with the machine 70-80% idle, and
2x wall-time on several datapipe entries (ngram_jaccard 6.4 → 3.5 s,
fingerprint 4.9 → 2.0 s at sf0.1). Reservation exists so that many
*unrelated* concurrent datasets can't deadlock each other over object
store memory; these pipelines run one plan at a time and their shuffle
payloads are far below the global no-reservation object-store cap (25%
of the store) that still backpressures output.

Datasets capture a copy of the current ``DataContext`` at creation, so
the setting sticks to lazily-returned datasets even after the global
flag is restored (verified against Ray 2.49: ``ExecutionPlan._context``).
"""

from __future__ import annotations

import functools
import threading

# Concurrent-plan safety: the flag is GLOBAL process state, so a naive
# per-call save/restore races when two pipelines overlap in threads
# (thread B saves thread A's already-disabled value and "restores" False
# forever — caught by tests/test_concurrent_plans.py). First entrant
# saves, last exiter restores, under a lock; nesting is the depth
# counter's natural case.
_lock = threading.Lock()
_depth = 0
_saved: bool | None = None


def unreserved(fn):
    """Decorator: run ``fn`` (a pipeline that creates Ray Datasets) with
    per-op resource reservation disabled, restoring the global flag when
    the LAST concurrent/nested entrant exits. Thread-safe; a no-op if
    Ray Data isn't importable yet."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        global _depth, _saved
        try:
            from ray.data import DataContext

            ctx = DataContext.get_current()
        except Exception:
            return fn(*args, **kwargs)
        with _lock:
            if _depth == 0:
                _saved = ctx.op_resource_reservation_enabled
                ctx.op_resource_reservation_enabled = False
            _depth += 1
        try:
            return fn(*args, **kwargs)
        finally:
            with _lock:
                _depth -= 1
                if _depth == 0:
                    ctx.op_resource_reservation_enabled = _saved

    return wrapper
