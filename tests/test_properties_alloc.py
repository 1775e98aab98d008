"""Property-based tests for the wave-22/23 integer kernels: on
arbitrary weights and totals the largest-remainder allocation must sum
exactly, stay within one cent of proportional, and the weighted-median
CDF rule must match a direct reference -- the invariants on arbitrary
inputs, not just the TPC-H-shaped testdata."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

POS = st.integers(min_value=1, max_value=10_000)


def _allocate(total_c: int, weights: list[int]) -> list[int]:
    """Python mirror of the allocate_order_total kernel."""
    sw = sum(weights)
    base = [(total_c * w) // sw for w in weights]
    frac = [(total_c * w) % sw for w in weights]
    leftover = total_c - sum(base)
    order = sorted(range(len(weights)), key=lambda i: (-frac[i], i))
    for i in order[:leftover]:
        base[i] += 1
    return base


@given(st.integers(min_value=0, max_value=10**7), st.lists(POS, min_size=1, max_size=20))
@settings(max_examples=300, deadline=None)
def test_allocation_exact_and_proportional(total_c, weights):
    alloc = _allocate(total_c, weights)
    assert sum(alloc) == total_c
    sw = sum(weights)
    for a, w in zip(alloc, weights):
        assert a >= 0
        assert abs(a - total_c * w / sw) <= 1.0


@given(st.lists(POS, min_size=1, max_size=20))
@settings(max_examples=200, deadline=None)
def test_allocation_of_total_zero_and_full_weights(weights):
    """Degenerate totals behave: zero allocates zero everywhere, and a
    total equal to the weight sum allocates each weight exactly."""
    assert _allocate(0, weights) == [0] * len(weights)
    assert _allocate(sum(weights), weights) == weights


def _weighted_median(pairs: list[tuple[int, int]]) -> int:
    vals = sorted(pairs)
    tot = sum(q for _, q in vals)
    cum = 0
    for price, q in vals:
        cum += q
        if 2 * cum >= tot:
            return price
    raise AssertionError("unreachable")


@given(st.lists(st.tuples(POS, POS), min_size=1, max_size=30))
@settings(max_examples=300, deadline=None)
def test_weighted_median_cdf_rule(pairs):
    med = _weighted_median(pairs)
    tot = sum(q for _, q in pairs)
    below = sum(q for v, q in pairs if v < med)
    at_or_below = sum(q for v, q in pairs if v <= med)
    # the defining property of the weighted median
    assert 2 * below < tot or tot == 0
    assert 2 * at_or_below >= tot
