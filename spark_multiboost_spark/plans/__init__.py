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
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame


def _unpersist_quietly(frames: tuple[DataFrame, ...]) -> None:
    for f in frames:
        try:
            f.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped — nothing left to release


def release_with(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Return ``result``, unpersisting ``cached`` once ``result`` is GC'd."""
    weakref.finalize(result, _unpersist_quietly, cached)
    return result
