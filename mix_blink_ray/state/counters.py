"""Stage counters: a tiny named Ray actor accumulating drop/truncation
metrics emitted from inside distributed stage bodies.

The engine's rule is that coverage caps are *counted and reported, never
silent* (``stages/blocking.py``).  Flag columns cover caps whose effect flows
through the data (``add_salt``'s ``salted``); this actor covers caps whose
effect is the ABSENCE of rows (pairs never emitted by a hot-band or
hot-bucket cap) — there is no row to flag, so the dropped count is pushed to
a shared counter instead.  Calls are fire-and-forget (no await in the hot
path) and only happen when a cap actually fires, so steady-state overhead is
zero.  ``num_cpus=0`` keeps the actor off the scheduling budget.
"""

from __future__ import annotations

import ray

_ACTOR_NAME = "mbr_stage_counters"

__all__ = ["incr", "read_counters", "reset_counters"]


@ray.remote(num_cpus=0)
class _CounterActor:
    def __init__(self) -> None:
        self.counts: dict[str, int] = {}

    def add(self, key: str, n: int) -> None:
        self.counts[key] = self.counts.get(key, 0) + int(n)

    def get(self) -> dict[str, int]:
        return dict(self.counts)

    def reset(self) -> None:
        self.counts.clear()


def _actor():
    return _CounterActor.options(
        name=_ACTOR_NAME, get_if_exists=True, lifetime="detached"
    ).remote()


def incr(key: str, n: int) -> None:
    """Add ``n`` to counter ``key`` (no-op for n == 0; never blocks)."""
    if n:
        _actor().add.remote(key, n)


def read_counters() -> dict[str, int]:
    """Snapshot all counters (call after the consuming execution finished —
    counts accumulate as the lazy pipeline actually runs)."""
    return ray.get(_actor().get.remote())


def reset_counters() -> None:
    ray.get(_actor().reset.remote())
