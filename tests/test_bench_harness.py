"""Unit tests for bench.py's weather instrumentation.

The official capture quality depends on these small pieces behaving:
the pre-rep WeatherGate must never block rep 0, must pause only after
better weather has been observed in-run, and must be strictly bounded
so a uniformly stormy run degrades to the old behavior.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def make_gate(rates, naps):
    """A WeatherGate whose probe replays ``rates`` and whose sleeps are
    recorded into ``naps`` instead of actually sleeping."""
    gate = bench.WeatherGate(time_budget=900.0)
    it = iter(rates)

    def fake_rate(seconds=0.25, tries=2):
        try:
            fake_rate.last = next(it)
        except StopIteration:
            pass  # keep returning the final rate
        return fake_rate.last

    fake_rate.last = 0.0
    gate._rate = fake_rate

    real_sleep = bench.time.sleep

    def fake_sleep(s):
        naps.append(s)

    return gate, fake_sleep, real_sleep


def test_gate_never_pauses_rep0(monkeypatch):
    naps = []
    gate, fake_sleep, _ = make_gate([1.0], naps)
    monkeypatch.setattr(bench.time, 'sleep', fake_sleep)
    gate.wait_for_window(0)
    assert naps == []
    assert gate.best_rate == 1.0


def test_gate_uniform_weather_never_pauses(monkeypatch):
    naps = []
    gate, fake_sleep, _ = make_gate([10.0, 10.0, 10.0, 10.0], naps)
    monkeypatch.setattr(bench.time, 'sleep', fake_sleep)
    for rep in range(4):
        gate.wait_for_window(rep)
    assert naps == []


def test_gate_pauses_through_storm_then_releases(monkeypatch):
    naps = []
    # good window seen on rep 0 (100), then a storm (10 < 0.6*100),
    # which clears after two naps
    gate, fake_sleep, _ = make_gate([100.0, 10.0, 12.0, 90.0], naps)
    monkeypatch.setattr(bench.time, 'sleep', fake_sleep)
    gate.wait_for_window(0)
    gate.wait_for_window(1)
    assert len(naps) == 2  # slept through the two storm probes
    assert gate.best_rate == 100.0


def test_gate_pause_budget_bounds_total_sleep(monkeypatch):
    naps = []
    # permanent storm after one good window: the gate must give up
    # once the pause budget is spent, never exceeding it
    gate, fake_sleep, _ = make_gate([100.0] + [1.0] * 1000, naps)
    monkeypatch.setattr(bench.time, 'sleep', fake_sleep)
    gate.wait_for_window(0)
    gate.wait_for_window(1)  # exhausts the pause budget
    total = sum(naps)
    assert total <= min(240.0, 0.25 * 900.0) + 1e-9
    assert gate.pause_left <= 0
    n_before = len(naps)
    gate.wait_for_window(2)  # budget spent: proceeds immediately
    assert len(naps) == n_before


def test_gate_budget_scales_with_time_budget():
    assert bench.WeatherGate(900.0).pause_left == 225.0
    assert bench.WeatherGate(10000.0).pause_left == 240.0  # hard cap


def test_gate_real_probe_returns_positive_rate():
    gate = bench.WeatherGate(900.0)
    rate = gate._rate(seconds=0.05, tries=1)
    assert rate > 0.0


def test_paired_score_median_and_iqr():
    # 5 same-window pairs with one lucky and one stormy window: the
    # median must land on the typical ratio, not the extremes
    pairs = [(10.0, 150.0),   # 15x
             (5.0, 140.0),    # 28x (lucky ours window)
             (8.0, 160.0),    # 20x
             (40.0, 400.0),   # 10x (storm on both sides)
             (7.0, 154.0)]    # 22x
    med, (q1, q3), ratios = bench.paired_score(pairs)
    assert ratios == sorted(ratios)
    assert med == 20.0
    assert q1 == 15.0 and q3 == 22.0


def test_paired_score_even_count_interpolates():
    med, (q1, q3), _ = bench.paired_score([(1.0, 10.0), (1.0, 20.0)])
    assert med == 15.0
    assert (q1, q3) == (10.0, 20.0)


def test_paired_score_single_pair():
    med, (q1, q3), ratios = bench.paired_score([(2.0, 30.0)])
    assert med == q1 == q3 == 15.0 and ratios == [15.0]
