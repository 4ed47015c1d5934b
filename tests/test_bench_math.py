"""Unit tests for bench.py's warm steady-state reconstruction — the
driver-critical path that turns one trajectory's per-chunk timings into
the round's headline when the relay worker refuses a repeat run."""
import importlib.util
import os
import sys

spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def test_first_chunk_load_cost_excluded():
    # program A: first chunk absorbs a 5 s load, later chunks run 1 s/25
    chunks = [(("A"), 25, 6.0), ("A", 25, 1.0), ("A", 25, 1.0),
              ("B", 25, 3.0), ("B", 25, 2.0)]
    steady, rates = bench.steady_state_from_chunks(chunks, total_runs=1)
    assert abs(rates["A"] - 1.0 / 25) < 1e-9
    assert abs(rates["B"] - 2.0 / 25) < 1e-9
    # A covers 75 steps at 1/25 s/step, B covers 50 at 2/25
    assert abs(steady - (75 * 1.0 / 25 + 50 * 2.0 / 25)) < 1e-9


def test_multiple_runs_normalize_step_count():
    one_run = [("A", 10, 1.0), ("B", 10, 2.0)]
    steady1, _ = bench.steady_state_from_chunks(one_run, total_runs=1)
    steady2, _ = bench.steady_state_from_chunks(one_run * 2, total_runs=2)
    assert abs(steady1 - steady2) < 1e-9


def test_uneven_chunk_lengths_use_per_step_rate():
    # a short tail chunk must not be read as "faster program"
    chunks = [("A", 25, 2.5), ("A", 5, 0.5)]  # both 0.1 s/step
    steady, rates = bench.steady_state_from_chunks(chunks, total_runs=1)
    assert abs(rates["A"] - 0.1) < 1e-9
    assert abs(steady - 3.0) < 1e-9


def test_empty_chunks_returns_inf_not_zero():
    # --no-segmented trajectories record no chunk timings; 0.0 here would
    # clobber the real trajectory time via min() and end in a division
    # by zero when computing images/min
    steady, rates = bench.steady_state_from_chunks([], total_runs=1)
    assert steady == float("inf")
    assert rates == {}


def test_quick_run_is_not_headline():
    """--quick (K-step extrapolation) must never claim the headline metric
    even with every other knob at its default."""
    import argparse

    import bench

    knobs = dict(steps=bench.DEFAULT_STEPS, width=512, height=512, batch=1,
                 cutout_batches=4, clips=bench.DEFAULT_CLIPS)
    assert bench._is_headline(argparse.Namespace(trajectory=True, **knobs))
    assert not bench._is_headline(
        argparse.Namespace(trajectory=False, **knobs))
