"""bench.py regression-noise band (round 12): a query is flagged only
when its median exceeds 2x the baseline AND its whole current spread
sits above the envelope (2x median, widened by the baseline's recorded
spread when present); the 1.3-2x band and envelope-rescued queries are
emitted as noise_excluded with their spreads. No Spark needed — pure
arithmetic over recorded artifacts."""

from __future__ import annotations

from bench import compare_to_baseline

BASE = {
    "calib_sec": 0.7,
    "queries": {
        "fast_noisy": 0.8,     # language_id-shaped: sub-second, wide spread
        "real_regress": 2.0,
        "steady": 3.0,
        "tiny": 0.1,           # under the 0.2s floor: never flagged
        "spread_covered": 1.0,
    },
    "spread": {"spread_covered": [0.6, 2.6]},
}


def test_regression_requires_median_and_envelope():
    out = compare_to_baseline(
        timings={"real_regress": 5.0},
        spread={"real_regress": [4.5, 5.5]},  # even fastest pass > 2x base
        base=BASE, calib_sec=0.7,
    )
    assert out["regressions"] == {"real_regress": 2.5}
    assert out["noise_excluded"] == {}


def test_over_2x_median_inside_spread_is_noise_not_regression():
    # median 1.71x-style case scaled past 2x: the fastest pass still
    # dips under the 2x envelope, so the flag is noise_excluded
    out = compare_to_baseline(
        timings={"fast_noisy": 1.7},
        spread={"fast_noisy": [1.1, 2.4]},  # min 1.1 < 1.6 envelope
        base=BASE, calib_sec=0.7,
    )
    assert out["regressions"] == {}
    ne = out["noise_excluded"]["fast_noisy"]
    assert ne["ratio"] == 2.12 and ne["spread"] == [1.1, 2.4]
    assert ne["base"] == 0.8


def test_baseline_spread_widens_envelope():
    # ratio 2.8 with every pass above 2x the median — but the baseline
    # itself recorded passes up to 2.6s, so the envelope rescues it
    out = compare_to_baseline(
        timings={"spread_covered": 2.8},
        spread={"spread_covered": [2.5, 3.0]},
        base=BASE, calib_sec=0.7,
    )
    assert out["regressions"] == {}
    ne = out["noise_excluded"]["spread_covered"]
    assert ne["base_spread"] == [0.6, 2.6]
    # past the recorded envelope it IS a regression
    out = compare_to_baseline(
        timings={"spread_covered": 2.8},
        spread={"spread_covered": [2.7, 3.0]},
        base=BASE, calib_sec=0.7,
    )
    assert out["regressions"] == {"spread_covered": 2.8}


def test_near_miss_band_and_floors():
    out = compare_to_baseline(
        timings={"steady": 4.2, "tiny": 1.0, "fast_noisy": 0.9},
        spread={"steady": [4.0, 4.4], "tiny": [0.9, 1.1],
                "fast_noisy": [0.7, 1.1]},
        base=BASE, calib_sec=0.7,
    )
    # 1.4x on steady: near-miss, emitted with spread; 10x on a 0.1s
    # query: under the floor, ignored; 1.12x: clean
    assert out["regressions"] == {}
    assert set(out["noise_excluded"]) == {"steady"}
    assert out["noise_excluded"]["steady"]["ratio"] == 1.4


def test_totals_and_normalization_unchanged():
    out = compare_to_baseline(
        timings={"steady": 3.0, "real_regress": 2.0},
        spread={"steady": [2.9, 3.1], "real_regress": [1.9, 2.1]},
        base=BASE, calib_sec=1.4,
    )
    assert out["total_sec"] == 5.0 and out["n_shared"] == 2
    assert out["ratio"] == 1.0
    # current box 2x slower than baseline's calib -> normalized 0.5
    assert out["ratio_normalized"] == 0.5
