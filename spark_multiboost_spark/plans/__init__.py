"""Iterative-plan management: cache scoping for per-query persist() frames.

Per-query caches must not outlive their query: in long multi-query sessions
(the driver's registry sweep) leaked CacheManager entries accumulate until
the JVM OOMs — the gotcha the verify recipe works around with clearCache().

:func:`release_with` keeps ``DataFrame.persist()`` (columnar CachedBatch
storage — far more compact than ``localCheckpoint``'s raw-row blocks, which
OOM'd a 1g default heap on the sf0.1 triangle query when tried as the
alternative) and ties the cache's lifetime to the RESULT DataFrame with a
``weakref.finalize``: the moment the caller drops the result, CPython
refcounting fires the finalizer and the input caches are unpersisted.
Recompute-after-release is correctness-neutral — unpersist only drops
blocks; the lineage stays valid.

Belt-and-suspenders: the finalizer path silently degrades to a
session-lifetime leak whenever ANY reference to the result survives (a
registry result cache, an exception traceback, a REPL ``_``).  Every
registered cache is therefore ALSO tracked in :data:`_OUTSTANDING`, and
:func:`release_outstanding` lets a sweep (the driver sim, bench.py between
queries) unpersist explicitly regardless of GC state; :func:`outstanding`
exposes the count as a leak diagnostic.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

#: caches registered via release_with whose finalizer has not fired yet.
#: Maps a per-registration token -> tuple of persisted frames.
_OUTSTANDING: dict[int, tuple[DataFrame, ...]] = {}
_NEXT_TOKEN = [0]


def _unpersist_quietly(token: int, frames: tuple[DataFrame, ...]) -> None:
    _OUTSTANDING.pop(token, None)
    for f in frames:
        try:
            f.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped — nothing left to release


def release_with(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Return ``result``, unpersisting ``cached`` once ``result`` is GC'd.

    The frames are also tracked in :data:`_OUTSTANDING` so a sweep can
    release them explicitly via :func:`release_outstanding` even when a
    retained reference keeps the finalizer from firing.
    """
    _NEXT_TOKEN[0] += 1
    token = _NEXT_TOKEN[0]
    _OUTSTANDING[token] = cached
    weakref.finalize(result, _unpersist_quietly, token, cached)
    return result


def outstanding() -> int:
    """Number of release_with registrations whose caches are still held."""
    return len(_OUTSTANDING)


def release_outstanding() -> int:
    """Explicitly unpersist every still-registered cache (sweep hygiene).

    Safe to call between queries: unpersisting a frame the finalizer later
    touches again is a no-op.  Returns the number of registrations drained.
    """
    drained = 0
    for token in list(_OUTSTANDING):
        frames = _OUTSTANDING.pop(token, ())
        for f in frames:
            try:
                f.unpersist(blocking=False)
            except Exception:
                pass
        drained += 1
    return drained
