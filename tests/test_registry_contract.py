"""Registry-contract invariants (VERDICT-r5 item 7): the driver-facing
query registry's structural guarantees, pinned as tests so a refactor
can't silently weaken them. The module-level asserts in queries.py fire
on import; these tests make the contract explicit and reviewable.
"""

from felixzh_flink_spark.queries import (_DRIVER_ORDER, _PROBE_TWINS,
                                         _ROWS_ONLY_IN_WINDOW, ORACLES,
                                         QUERIES)


def test_driver_order_covers_registry_exactly():
    assert list(QUERIES) == _DRIVER_ORDER
    assert len(set(_DRIVER_ORDER)) == len(_DRIVER_ORDER)


def test_every_probe_keeps_its_assertion_twin():
    """Each rows-only probe (approximate / hash-seed-specific — no
    DuckDB oracle can bit-match it) must keep its deterministic
    assertion-oracle twin registered; deleting a twin would silently
    weaken the probe's coverage story."""
    for probe, twin in _PROBE_TWINS.items():
        assert probe in QUERIES and probe not in ORACLES, probe
        assert twin in QUERIES and twin in ORACLES, (probe, twin)


def test_window_is_oracle_backed_except_declared_probes():
    window = set(_DRIVER_ORDER[:50])
    assert window - set(ORACLES) == _ROWS_ONLY_IN_WINDOW
    assert _ROWS_ONLY_IN_WINDOW <= set(_PROBE_TWINS)


def test_oracles_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)
