"""Metrics parity tests against the reference's oracle values
(reference: tests/test_metrics.py:36-108) plus hand-computed hypervolumes
for the native WFG implementation (the reference delegates HV to pymoo)."""

import numpy as np
import pytest

from zfista_tpu.core.result import SolveResult
from zfista_tpu.metrics import (
    calculate_metrics,
    extract_function_values,
    extract_non_dominated_points,
    hypervolume,
    purity,
    spread_metrics,
)


@pytest.fixture
def res3():
    mk = lambda fun, t, nit, niti: SolveResult(
        fun=np.array(fun), success=True, time=t, nit=nit, nit_internal=niti
    )
    return [
        mk([0.1, 0.2], 1, 10, 5),
        mk([0.2, 0.1], 2, 20, 10),
        mk([0.3, 0.3], 3, 30, 15),
    ]


def test_extract_function_values(res3):
    np.testing.assert_array_equal(
        extract_function_values(res3),
        np.array([[0.1, 0.2], [0.2, 0.1], [0.3, 0.3]]),
    )


def test_extract_non_dominated_points():
    F = np.array([[0.1, 0.2], [0.2, 0.1], [0.3, 0.3]])
    np.testing.assert_array_equal(
        extract_non_dominated_points(F), np.array([[0.1, 0.2], [0.2, 0.1]])
    )


def test_purity_and_spread():
    front = np.array([[0.1, 0.2], [0.2, 0.1]])
    front_true = np.array([[0.1, 0.2], [0.2, 0.1], [0.3, 0.3]])
    assert purity(front, front_true) == pytest.approx(2 / 3)
    gamma, delta = spread_metrics(front, front_true)
    assert gamma == pytest.approx(0.1)
    assert delta == pytest.approx(0.5)


def test_hypervolume_2d_exact():
    # Two points vs ref (1,1): hand computation.
    pts = np.array([[0.25, 0.75], [0.5, 0.5]])
    # Sweep: (1-0.25)*(1-0.75) + (1-0.5)*(0.75-0.5) = 0.1875 + 0.125
    assert hypervolume(pts, ref_point=[1, 1]) == pytest.approx(0.3125)
    # Dominated point adds nothing.
    pts2 = np.vstack([pts, [0.6, 0.6]])
    assert hypervolume(pts2, ref_point=[1, 1]) == pytest.approx(0.3125)


def test_hypervolume_3d_exact():
    # Single point: box volume.
    assert hypervolume(
        np.array([[0.5, 0.5, 0.5]]), ref_point=[1, 1, 1]
    ) == pytest.approx(0.125)
    # Two disjointly-dominating points: inclusion-exclusion by hand.
    pts = np.array([[0.0, 0.5, 0.5], [0.5, 0.0, 0.5]])
    # vol1 = 1*0.5*0.5 = 0.25, vol2 = 0.25, overlap = 0.5*0.5*0.5 = 0.125
    assert hypervolume(pts, ref_point=[1, 1, 1]) == pytest.approx(0.375)


def test_hypervolume_normalized_matches_reference_zero(res3):
    # Reference oracle: HV of the pooled front vs itself is 0
    # (tests/test_metrics.py:88) because normalized corner points touch
    # the reference corner.
    F = extract_function_values(res3)
    front = extract_non_dominated_points(F)
    assert hypervolume(front, front_true=front) == pytest.approx(0.0)


def test_calculate_metrics_single(res3):
    metrics, ratios = calculate_metrics(("result", res3))
    expected = {
        "Hypervolume": 0.0,
        "Gamma": 0.1,
        "Delta": 0.0,
        "Purity": 1.0,
        "Error rate": 0.0,
        "Avg computation time": 2.0,
        "Avg iterations": 20.0,
        "Avg internal iterations": 10.0,
    }
    for key, val in expected.items():
        assert metrics[key]["result"] == pytest.approx(val), key
        assert ratios[key]["result"] == pytest.approx(1.0), key


def test_calculate_metrics_two_algorithms(res3):
    worse = [
        SolveResult(
            fun=np.array([0.4, 0.4]), success=True, time=4, nit=40, nit_internal=20
        ),
        SolveResult(
            fun=np.array([0.5, 0.2]), success=False, time=5, nit=50, nit_internal=25
        ),
    ]
    metrics, ratios = calculate_metrics(("good", res3), ("bad", worse))
    # Pooled front comes entirely from "good".
    assert metrics["Purity"]["good"] == pytest.approx(1.0)
    assert metrics["Purity"]["bad"] == pytest.approx(0.0)
    assert metrics["Error rate"]["bad"] == pytest.approx(0.5)
    assert ratios["Avg computation time"]["good"] == pytest.approx(1.0)
    # bad's only successful run took 4s; good's average is 2s -> ratio 2.
    assert ratios["Avg computation time"]["bad"] == pytest.approx(2.0)
    assert ratios["Hypervolume"]["good"] == pytest.approx(1.0)


def test_ratio_ignores_nan_entries():
    """A NaN metric value (variant with zero successful runs) must not
    poison the other variants' ratios, regardless of dict order (review
    finding: Python min/max over NaN is order-dependent)."""
    from zfista_tpu.metrics import _ratio

    for d in (
        {"Normal": np.nan, "Accelerated": 2.0, "Dep": 4.0},
        {"Accelerated": 2.0, "Dep": 4.0, "Normal": np.nan},
    ):
        r = _ratio(d, maximize=False)
        assert np.isnan(r["Normal"])
        assert r["Accelerated"] == 1.0 and r["Dep"] == 2.0
    assert all(np.isnan(v) for v in _ratio({"a": np.nan}, maximize=True).values())
