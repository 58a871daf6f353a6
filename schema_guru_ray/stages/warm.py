"""Warm-task execution for cheap-state map_batches kernels.

Ray Data runs a callable CLASS as an actor pool: explicit processes that
must spin up, autoscale, and queue batches. That is the right home for
genuinely expensive per-actor state (real codec libraries, broadcast
sketch stores — see ``ValidationConfig``), but this repo's decode/DSP
kernels hold only a handful of floats, and the pool overhead dominates
short stages: the validator measured tasks-mode 1.55x faster end-to-end
(BASELINE.md round 5), and ``ds.stats()`` on the resample stage showed
~3.5 s of its 4.0 s operator wall was pool spin-up + batch queueing —
the busy time (sum of task walls) was ~8 core-seconds.

:func:`warm_kernel` keeps the class (same kernel runs unchanged under an
actor pool where a caller wants one) but executes it in TASK mode with
once-per-worker-process construction: Ray reuses warm worker processes
across tasks, so the instance cache below amortizes construction exactly
like an actor's ``__init__`` — without the pool's fixed costs. Same
pattern as ``stages/audio.py::validate_batch_task``, generalized.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

_CACHE: Dict[tuple, object] = {}


def warm_kernel(cls: type, **ctor_kwargs) -> Callable:
    """A plain function running ``cls(**ctor_kwargs).__call__`` through a
    per-worker-process instance cache. Pass the result to ``map_batches``
    WITHOUT ``concurrency=`` (task mode). ctor kwargs must be hashable
    (they key the cache)."""
    key = (cls.__module__, cls.__qualname__, tuple(sorted(ctor_kwargs.items())))

    def _run(batch):
        # Resolve the cache through the module at call time. Referencing the
        # module-global ``_CACHE`` directly would make cloudpickle snapshot
        # the driver's cache CONTENTS by value into the serialized UDF
        # (dynamic closures ship referenced globals by value) — shipping
        # whatever kernels the driver happened to have built, and breaking
        # entirely when a cached instance isn't importable on workers.
        from schema_guru_ray.stages.warm import _CACHE as cache

        k = cache.get(key)
        if k is None:
            k = cls(**ctor_kwargs)
            cache[key] = k
        return k(batch)

    _run.__name__ = f"warm_{cls.__name__}"
    _run.__qualname__ = _run.__name__
    return _run
