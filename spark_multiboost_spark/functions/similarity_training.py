"""Late registration for the iterative D3 training queries.

These are rows-only (Lloyd's loop is not SQL-expressible), so they register
AFTER the exact-oracle modules in ``registry._QUERY_MODULES``: the driver's
bounded correctness window (~50 queries, registration order) should spend
its slots on hash-checked queries; pytest carries the correctness story for
these two (numpy Lloyd's cross-check + recall floor,
``tests/test_pipeline_ops.py``).
"""

from __future__ import annotations

from ..registry import query
from .similarity import ivf_trained_recall, kmeans_train

query("q_d3_kmeans_train", oracle=None, group="D")(kmeans_train)
query("q_d3_ivf_trained_recall", oracle=None, group="D")(ivf_trained_recall)
