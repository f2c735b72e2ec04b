"""Registry-window invariants (ADVICE r8): the driver's correctness gate
checks exactly the first WINDOW_SIZE registry entries, so the rotation list
must be exactly that long, duplicate-free, and fully registered — an
overflow entry is a re-check that silently never runs (the r8 list had 54
pre-boundary names and its last 4 were never driver-checked)."""

from __future__ import annotations

from spark_multiboost_spark import registry


def test_priority_window_exact_size():
    assert len(registry._PRIORITY) == registry.WINDOW_SIZE, (
        f"_PRIORITY has {len(registry._PRIORITY)} entries; the driver only "
        f"checks the first {registry.WINDOW_SIZE} — trim or rotate"
    )


def test_priority_window_no_duplicates():
    assert len(set(registry._PRIORITY)) == len(registry._PRIORITY)


def test_priority_window_all_registered():
    names = set(registry.all_queries())
    missing = [n for n in registry._PRIORITY if n not in names]
    assert not missing, f"_PRIORITY names not in registry: {missing}"


def test_window_is_the_priority_list_in_order():
    head = list(registry.all_queries())[: registry.WINDOW_SIZE]
    assert head == registry._PRIORITY
