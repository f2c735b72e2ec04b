"""Late registration for the iterative D3 training queries.

Reason this module exists (and cannot be folded into ``similarity.py``,
VERDICT r10 nit c): the ``@query`` decorator registers at IMPORT time, and
the registry's fallback order beyond ``_PRIORITY`` is module import order
(``registry._QUERY_MODULES``).  ``kmeans_train`` / ``ivf_trained_recall``
are rows-only (Lloyd's loop is not SQL-expressible), so decorating them
inside ``similarity.py`` would register them alongside that module's
exact-oracle queries — ahead of whole later modules — letting two rows-only
checks shadow hash-checked queries in any registration-order window.  This
shim re-registers the same callables from a module listed near the END of
``_QUERY_MODULES`` instead.  Pytest carries their correctness story (numpy
Lloyd's cross-check + recall floor, ``tests/test_pipeline_ops.py``).
"""

from __future__ import annotations

from ..registry import query
from .similarity import ivf_trained_recall, kmeans_train

query("q_d3_kmeans_train", oracle=None, group="D")(kmeans_train)
query("q_d3_ivf_trained_recall", oracle=None, group="D")(ivf_trained_recall)
