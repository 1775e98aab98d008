"""Property-based tests for the token_budget_waterfill integer kernel:
on ARBITRARY supplies and budgets the allocation must exhaust the
budget exactly, never exceed any supply, and satisfy max-min fairness
-- the invariants on arbitrary inputs, not just the TPC-H-shaped
testdata (same doctrine as test_properties_alloc)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st


def _waterfill(supplies: dict[str, int], budget: int) -> dict[str, int]:
    """Python mirror of the token_budget_waterfill SQL kernel (the
    prefix-condition formulation, NOT the iterative reference)."""
    k = len(supplies)
    order = sorted(supplies, key=lambda s: (supplies[s], s))
    cum = 0
    m = 0
    cum_m = 0
    for i, s in enumerate(order, start=1):
        n = supplies[s]
        cand = (budget - cum) // (k - i + 1)
        cum += n
        if n <= cand:
            m, cum_m = i, cum
        else:
            break  # the condition is monotone: once false, always false
    alloc = {}
    if k > m:
        level = (budget - cum_m) // (k - m)
        rem = (budget - cum_m) % (k - m)
    else:
        level = rem = 0
    for i, s in enumerate(order, start=1):
        if i <= m:
            alloc[s] = supplies[s]
        else:
            alloc[s] = level + (1 if i - m <= rem else 0)
    return alloc


NAMES = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=4),
    min_size=1,
    max_size=12,
    unique=True,
)


@given(NAMES, st.data())
@settings(max_examples=300, deadline=None)
def test_waterfill_invariants(names, data):
    supplies = {
        s: data.draw(st.integers(min_value=0, max_value=10**6)) for s in names
    }
    total = sum(supplies.values())
    budget = data.draw(st.integers(min_value=0, max_value=total))
    alloc = _waterfill(supplies, budget)
    # budget exhausted exactly, feasibility per source
    assert sum(alloc.values()) == budget
    for s in supplies:
        assert 0 <= alloc[s] <= supplies[s]
    # matches the independent iterative reference
    from conftest import waterfill_reference

    assert alloc == waterfill_reference(supplies, budget)
    # max-min fairness: an unsatisfied source never gets more than one
    # token less than ANY other source's allocation (the +1 remainder
    # spread is the only allowed gap among unsatisfied sources)
    unsat = [s for s in supplies if alloc[s] < supplies[s]]
    if unsat:
        lo = min(alloc[s] for s in unsat)
        assert all(alloc[s] <= lo + 1 for s in unsat)
        # and every satisfied source is below the water level
        for s in supplies:
            if s not in unsat:
                assert supplies[s] <= lo + 1 or alloc[s] == supplies[s]


@given(NAMES)
@settings(max_examples=100, deadline=None)
def test_waterfill_full_budget_serves_everyone(names):
    supplies = {s: (i + 1) * 7 for i, s in enumerate(names)}
    total = sum(supplies.values())
    assert _waterfill(supplies, total) == supplies


# -- Spearman double-rank kernel properties (wave 104) ------------------

import math


def _spearman_micro(pairs):
    """Pure-Python mirror of the spearman_discount_qty kernel."""
    from collections import Counter

    def dr(vals):
        cnt = Counter(vals)
        run, less = 0, {}
        for v in sorted(cnt):
            less[v] = run
            run += cnt[v]
        return {v: 2 * less[v] + cnt[v] + 1 for v in cnt}

    xs, ys = dr([p[0] for p in pairs]), dr([p[1] for p in pairs])
    n = len(pairs)
    sx = sum(xs[a] for a, _ in pairs)
    sy = sum(ys[b] for _, b in pairs)
    sxy = sum(xs[a] * ys[b] for a, b in pairs)
    sxx = sum(xs[a] ** 2 for a, _ in pairs)
    syy = sum(ys[b] ** 2 for _, b in pairs)
    varx, vary = n * sxx - sx * sx, n * syy - sy * sy
    if varx * vary <= 0:
        return 0
    rho = (n * sxy - sx * sy) / math.sqrt(float(varx) * float(vary))
    return math.floor(rho * 1000000 + 0.5)


PAIRS = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),
        st.integers(min_value=-50, max_value=50),
    ),
    min_size=2,
    max_size=60,
)


@given(PAIRS)
@settings(max_examples=300, deadline=None)
def test_spearman_bounded_and_symmetric(pairs):
    s = _spearman_micro(pairs)
    assert -1000000 <= s <= 1000000
    # antisymmetry under y-negation (ranks reverse exactly)
    assert _spearman_micro([(a, -b) for a, b in pairs]) == -s


@given(st.lists(st.integers(min_value=-1000, max_value=1000),
                min_size=2, max_size=60, unique=True))
@settings(max_examples=200, deadline=None)
def test_spearman_perfect_monotone(xs):
    # any strictly monotone transform of distinct values -> rho = 1
    pairs = [(x, x * 3 + 7) for x in xs]
    assert _spearman_micro(pairs) == 1000000
    pairs_rev = [(x, -(x * 3 + 7)) for x in xs]
    assert _spearman_micro(pairs_rev) == -1000000


@given(PAIRS)
@settings(max_examples=200, deadline=None)
def test_spearman_invariant_to_monotone_transform(pairs):
    # rank correlation must not change under strictly increasing maps
    s1 = _spearman_micro(pairs)
    s2 = _spearman_micro([(2 * a + 100, b * 5 - 3) for a, b in pairs])
    assert s1 == s2
