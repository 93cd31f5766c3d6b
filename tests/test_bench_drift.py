"""Cross-session drift detection in bench.py: a uniformly slow session
(small within-session spread, every number up together) must trip the
drift detector against committed rolling-best history — the failure mode
that let round 8 publish a phantom 14 s regression with noisy=false."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import bench  # noqa: E402


def test_parse_embedded_report_from_driver_tail():
    tail = ('garbage progress bars\r\r {"metric": "headline_queries_total",'
            ' "value": 1.5, "queries": {"q1": 0.5, "q2": 1.0}}')
    rep = bench._parse_embedded_report(tail)
    assert rep["value"] == 1.5 and rep["queries"]["q2"] == 1.0
    assert bench._parse_embedded_report("no json here") == {}
    # trailing junk after the object is tolerated (raw_decode)
    rep2 = bench._parse_embedded_report(tail + "\ntrailing")
    assert rep2["queries"]["q1"] == 0.5


def test_load_rolling_best_folds_committed_history_at_sf():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    best = bench.load_rolling_best(here, 0.1)
    # every catalog query ever benched at sf0.1 has a rolling best
    assert len(best) >= 100
    assert all(t > 0 for t in best.values())
    # the ledger must be at least as good as any single committed round
    with open(os.path.join(here, "BENCH_DETAIL.json")) as fh:
        r8 = json.load(fh)["queries"]
    assert all(best[q] <= t for q, t in r8.items() if q in best)


def test_drift_detects_uniformly_slow_session():
    best = {f"q{i}": 1.0 for i in range(20)}
    slow = {f"q{i}": 1.3 for i in range(20)}   # +30% across the board
    med, ratios = bench.drift_vs_best(slow, best)
    assert med == 1.3 and len(ratios) == 20
    ok = {f"q{i}": 1.05 for i in range(20)}
    med_ok, _ = bench.drift_vs_best(ok, best)
    assert med_ok is not None and med_ok <= 1.2
    # one real regression among healthy queries must NOT flag the session
    one_bad = dict(ok, q3=5.0)
    med_one, ratios_one = bench.drift_vs_best(one_bad, best)
    assert med_one is not None and med_one <= 1.2
    assert ratios_one["q3"] == 5.0  # ...but the query itself is visible


def test_drift_needs_history():
    med, ratios = bench.drift_vs_best({"a": 1.0, "b": 2.0}, {"a": 1.0})
    assert med is None and ratios == {"a": 1.0}
    # fresh queries without history are excluded, never crash
    med2, _ = bench.drift_vs_best(
        {f"q{i}": 1.0 for i in range(15)},
        {f"q{i}": 1.0 for i in range(10)})
    assert med2 == 1.0


def test_load_rolling_best_is_sf_keyed():
    """History from a different scale factor is ignored — a sf0.01 smoke
    run must never contaminate the sf0.1 drift baseline."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    assert bench.load_rolling_best(here, 0.0042) == {}


def test_per_query_canary_flags_lone_regression():
    """One multi-second query regressing alone is invisible to the
    median drift check — the per-query canary must catch it, while
    leaving sub-second fixed-overhead jitter (2× of 0.3 s) unflagged."""
    best = {"big": 10.0, "small": 0.3, "mid": 2.0, "fresh_no_history": 0}
    timings = {
        "big": 25.0,      # 2.5× of 10 s AND > best+1s: flag
        "small": 0.9,     # 3× of 0.3 s but under best+1s floor: no flag
        "mid": 2.9,       # 1.45×, under 2×: no flag
        "fresh_no_history": 50.0,  # no history: no flag
        "unknown": 1.0,   # absent from best entirely: no flag
    }
    flags = bench.per_query_canaries(timings, best)
    assert set(flags) == {"big"}
    assert flags["big"]["ratio"] == 2.5
    assert flags["big"]["min"] == 25.0 and flags["big"]["best"] == 10.0

    # boundary: exactly 2× and exactly best+1s are NOT flagged (strict >)
    assert bench.per_query_canaries({"q": 20.0}, {"q": 10.0}) == {}
    assert bench.per_query_canaries({"q": 1.3}, {"q": 0.3}) == {}
    # just past both bounds: flagged
    assert set(bench.per_query_canaries({"q": 20.1}, {"q": 10.0})) == {"q"}
    # empty inputs degrade to no flags
    assert bench.per_query_canaries({}, {}) == {}
