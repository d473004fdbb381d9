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


# ---------------------------------------------------------------------------
# Absolute-value hypervolume cross-validation (VERDICT round-2 item 8).
# pymoo cannot be installed in this environment, so absolute values are
# pinned two independent ways instead:
#   1. an INDEPENDENT exact algorithm (z-slice sweep over 2-D sweeps, below,
#      sharing no code with the shipped WFG recursion) on random fronts;
#   2. hand-computed golden constants, including the value pymoo's
#      convention (`Hypervolume(pf=front_true)` = unnormalized HV against
#      the true front's nadir, zero_to_one=False default) would produce,
#      which differs from ours by exactly prod(nadir - ideal).
# ---------------------------------------------------------------------------


def _oracle_hv_2d(pts, ref):
    """Independent 2-D HV: brute union of rectangles via coordinate grid."""
    pts = np.asarray(pts, float)
    pts = pts[np.all(pts < ref, axis=1)]
    if len(pts) == 0:
        return 0.0
    xs = np.unique(np.concatenate([pts[:, 0], [ref[0]]]))
    hv = 0.0
    for x0, x1 in zip(xs[:-1], xs[1:]):
        covering = pts[pts[:, 0] <= x0]
        if len(covering):
            hv += (x1 - x0) * (ref[1] - covering[:, 1].min())
    return hv


def _oracle_hv_3d(pts, ref):
    """Independent exact 3-D HV: sweep z-slices, 2-D HV per slab."""
    pts = np.asarray(pts, float)
    pts = pts[np.all(pts < ref, axis=1)]
    if len(pts) == 0:
        return 0.0
    zs = np.unique(np.concatenate([pts[:, 2], [ref[2]]]))
    hv = 0.0
    for z0, z1 in zip(zs[:-1], zs[1:]):
        active = pts[pts[:, 2] <= z0]
        if len(active):
            hv += (z1 - z0) * _oracle_hv_2d(active[:, :2], ref[:2])
    return hv


def test_hypervolume_3d_matches_independent_oracle():
    rng = np.random.default_rng(3)
    for n in (1, 2, 5, 12, 30):
        pts = rng.uniform(0, 1, size=(n, 3))
        ref = np.array([1.1, 1.2, 1.3])
        ours = hypervolume(pts, ref_point=ref)
        oracle = _oracle_hv_3d(pts, ref)
        np.testing.assert_allclose(ours, oracle, rtol=1e-12, err_msg=f"n={n}")


def test_hypervolume_2d_matches_independent_oracle():
    rng = np.random.default_rng(4)
    for n in (1, 3, 17, 40):
        pts = rng.uniform(0, 1, size=(n, 2))
        ref = np.array([1.05, 1.5])
        np.testing.assert_allclose(
            hypervolume(pts, ref_point=ref), _oracle_hv_2d(pts, ref), rtol=1e-12
        )


def test_hypervolume_golden_constants():
    """Hand-computed golden values, both conventions.

    3-obj: points (0,0,1),(0,1,0),(1,0,0) vs ref (2,2,2).  Inclusion-
    exclusion by hand: 3 boxes of volume 4, pairwise intersections of
    volume 2, triple intersection 1 -> 12 - 6 + 1 = 7.
    """
    pts3 = np.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    np.testing.assert_allclose(
        hypervolume(pts3, ref_point=np.array([2.0, 2.0, 2.0])), 7.0, rtol=1e-14
    )

    # 2-obj front [[0,4],[1,2],[3,1],[4,0]] as its own true front:
    # ideal (0,0), nadir (4,4).  Normalized sweep by hand = 0.4375 (our
    # convention); pymoo's `Hypervolume(pf=front_true)` convention
    # (unnormalized vs nadir) = 0.4375 * prod(nadir - ideal) = 7.0.
    front = np.array([[0.0, 4.0], [1.0, 2.0], [3.0, 1.0], [4.0, 0.0]])
    ours = hypervolume(front, front_true=front)
    np.testing.assert_allclose(ours, 0.4375, rtol=1e-14)
    pymoo_convention = hypervolume(front, ref_point=np.array([4.0, 4.0]))
    np.testing.assert_allclose(pymoo_convention, 7.0, rtol=1e-14)
    np.testing.assert_allclose(pymoo_convention, ours * 16.0, rtol=1e-14)


def test_hypervolume_native_path_matches_oracle():
    """>64 points routes through the C++ WFG kernel (metrics.py native
    fast path); it must agree with the independent oracle too."""
    rng = np.random.default_rng(5)
    pts = rng.uniform(0, 1, size=(120, 3))
    ref = np.array([1.1, 1.1, 1.1])
    np.testing.assert_allclose(
        hypervolume(pts, ref_point=ref), _oracle_hv_3d(pts, ref), rtol=1e-10
    )


def test_calculate_metrics_tolerates_nonfinite_runs():
    """One diverged (NaN) or infeasible (+inf) run must not poison the
    pooled front: previously a single NaN row made the normalization
    scale NaN and silently zeroed EVERY algorithm's hypervolume
    (round-3 review finding)."""
    mk = lambda fun, ok=True: SolveResult(
        fun=np.array(fun), success=ok, time=1.0, nit=5, nit_internal=5
    )
    good = [
        mk([1.0, 0.0]),
        mk([0.0, 1.0]),
        mk([0.5, 0.5]),
    ]
    bad_nan = good[:2] + [mk([np.nan, np.nan], ok=False)]
    bad_inf = good[:2] + [mk([np.inf, 0.25], ok=False)]
    base, _ = calculate_metrics(("A", good))
    for spoiled in (bad_nan, bad_inf):
        m, _ = calculate_metrics(("A", good), ("B", spoiled))
        assert m["Hypervolume"]["A"] > 0.0
        assert m["Hypervolume"]["A"] == pytest.approx(
            base["Hypervolume"]["A"]
        )
    # all-non-finite everywhere: defined NaN outputs, no crash
    allbad = [mk([np.nan, np.nan], ok=False)]
    m, r = calculate_metrics(("A", allbad))
    assert np.isnan(m["Hypervolume"]["A"])
