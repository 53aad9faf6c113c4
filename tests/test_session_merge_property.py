"""Round-5: the streaming sessionizer's state transition
(merge_gap_intervals) is order-independent — hypothesis pins that
folding any partition of any event multiset, in any batch order,
equals the batch gap-split of the fully sorted log.  Pure python, no
Spark."""

from hypothesis import given, settings
from hypothesis import strategies as st

from h3ronpy_spark.streaming import merge_gap_intervals


def batch_oracle(ts: list[int], gap: int) -> list[tuple[int, int, int]]:
    """Gap-split over the sorted log: the batch events_sessions rule."""
    out = []
    for t in sorted(ts):
        if out and t - out[-1][1] <= gap:
            out[-1][1] = t if t > out[-1][1] else out[-1][1]
            out[-1][2] += 1
        else:
            out.append([t, t, 1])
    return [tuple(o) for o in out]


@settings(max_examples=300, deadline=None)
@given(
    ts=st.lists(st.integers(0, 500), min_size=0, max_size=40),
    gap=st.integers(1, 60),
    seed=st.integers(0, 2**31 - 1),
    n_batches=st.integers(1, 6),
)
def test_any_partition_any_order_equals_batch(ts, gap, seed, n_batches):
    import random

    rng = random.Random(seed)
    shuffled = list(ts)
    rng.shuffle(shuffled)
    # random partition into n_batches (some possibly empty)
    batches: list[list[int]] = [[] for _ in range(n_batches)]
    for t in shuffled:
        batches[rng.randrange(n_batches)].append(t)
    state: list[list[int]] = []
    for b in batches:
        state = merge_gap_intervals(state, b, gap)
    got = [tuple(p) for p in state]
    assert got == batch_oracle(ts, gap)


@settings(max_examples=100, deadline=None)
@given(
    ts=st.lists(st.integers(0, 300), min_size=1, max_size=30),
    gap=st.integers(1, 50),
)
def test_interval_invariant(ts, gap):
    """Every merged interval is gap-consistent internally and gap-
    separated from its neighbors."""
    state = merge_gap_intervals([], ts, gap)
    for i, (s, e, n) in enumerate(map(tuple, state)):
        assert s <= e and n >= 1
        if i:
            assert s - state[i - 1][1] > gap
