"""Focused tests for the bench contamination predicate (r14 estimator).

The headline artifact's validity rests on `_contaminated` flagging exactly
the runs that measured the environment (hypervisor steal, driver-GC bleed)
and none of the runs that measured the engine.  Cases below are the
observed r14 bench runs (BENCH_DETAIL evidence), not synthetic guesses.
"""

from bench import _contaminated


def _flags(samples, steals):
    mw = min(samples)
    return [_contaminated(w, s, mw) for w, s in zip(samples, steals)]


def test_zero_steal_gc_outlier_flagged():
    # tpch_q01 r14 run 2: 24.2 s against 2.6/2.8 s siblings, steal 1.9 —
    # the GC-bleed mode /proc/stat cannot see
    assert _flags([2.8034, 24.2166, 2.5847], [0.1, 1.9, 0.0]) == [
        False,
        True,
        False,
    ]


def test_steal_inflated_run_cannot_raise_its_own_bound():
    # tpch_q18 r14 run 1: 13.0 s wall / 18.7 CPU-s steal; under the old
    # per-run bound (1.5 × its own wall = 19.5) it evaded the check.
    # min_wall = 1.0 s → steal bound max(5.0, 1.5) = 5.0 → flagged; the
    # 7.8 s zero-steal sibling trips the wall trigger
    assert _flags([13.0095, 1.0084, 7.7805], [18.7, 0.0, 0.0]) == [
        True,
        False,
        True,
    ]


def test_uniform_runs_with_mild_steal_kept():
    # ops_graph_kcore r14: three consistent ~5 s runs, steal ≤ 6.6 —
    # that's the engine (bench-context cost), not contamination
    assert _flags([4.6217, 5.0567, 4.9259], [2.4, 6.6, 1.5]) == [
        False,
        False,
        False,
    ]


def test_subsecond_jitter_not_churned():
    # 2x spread on sub-second entries is scheduler jitter; the +2.0 s
    # absolute term keeps the wall trigger quiet
    assert _flags([0.5, 0.9, 0.6], [0.0, 0.2, 0.1]) == [False, False, False]


def test_moderate_slowdown_below_4x_kept():
    # a 2.7 s run of a 1.0 s entry: real variance band, not replaced
    # (replacing it would bias the median down)
    assert _flags([1.0, 2.7, 1.1], [0.0, 0.3, 0.1]) == [False, False, False]


def test_steal_floor_protects_fast_entries():
    # 4.9 CPU-s of steal on a 0.3 s entry is under the 5.0 floor
    assert not _contaminated(0.35, 4.9, 0.3)
    assert _contaminated(0.35, 5.1, 0.3)
