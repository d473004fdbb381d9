"""Problem-zoo unit tests: analytic values, autodiff-vs-analytic Jacobians,
prox semantics, and small end-to-end solves.

Value oracles follow the reference's test points (tests/test_problems.py),
recomputed independently; Jacobian parity with ``jax.jacfwd`` is a stronger
check the reference lacks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zfista_tpu.models import (
    FDS,
    JOS1,
    SD,
    TOI4,
    TRIDIA,
    ZDT1,
    LinearFunctionRank1,
)

ALL_PROBLEMS = [
    JOS1(),
    JOS1(n_features=10, l1_ratios=[0.2, 0.1], l1_shifts=[0.0, 1.0]),
    SD(),
    FDS(n_features=5),
    FDS(n_features=5, bounds=(0.0, jnp.inf)),
    ZDT1(n_features=8),
    TOI4(),
    TRIDIA(),
    LinearFunctionRank1(n_features=6),
]


def feasible_point(p, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.uniform(0.5, 2.0, p.n_features)
    return jnp.asarray(x)


@pytest.mark.parametrize("p", ALL_PROBLEMS, ids=lambda p: p.name)
def test_jacobian_matches_autodiff(p):
    x = feasible_point(p)
    analytic = np.asarray(p.jac_f(x))
    auto = np.asarray(jax.jacfwd(p.f)(x))
    np.testing.assert_allclose(analytic, auto, rtol=1e-10, atol=1e-12)
    assert analytic.shape == (p.n_objectives, p.n_features)


def test_jos1_values():
    p = JOS1()
    x = jnp.array([1.0, 2.0, 3.0, 4.0, 5.0])
    np.testing.assert_allclose(np.asarray(p.f(x)), [11.0, 3.0])
    np.testing.assert_allclose(np.asarray(p.g(x)), [0.0, 0.0])


def test_jos1_l1_g_and_prox():
    p = JOS1(l1_ratios=[0.2, 0.1], l1_shifts=[0.0, 1.0])
    x = jnp.array([1.0, 2.0, 3.0, 4.0, 5.0])
    # g = [0.2*||x||_1, 0.1*||x-1||_1] = [0.2*15, 0.1*10]
    np.testing.assert_allclose(np.asarray(p.g(x)), [3.0, 1.0])
    # prox semantics: sequential composition (reference problems.py:119-138)
    w = jnp.array([0.5, 0.5])
    xp = jnp.array([3.0, 4.0, 5.0, 6.0, 7.0])
    coef = np.array([0.5 * 0.2, 0.5 * 0.1])
    z = np.asarray(xp) + coef[1]  # + sum(coef[1:])
    z = np.sign(z) * np.maximum(np.abs(z) - coef[0], 0)  # term 0
    z = z - coef[1] - 1.0
    z = np.sign(z) * np.maximum(np.abs(z) - coef[1], 0) + 1.0  # term 1 shifted
    np.testing.assert_allclose(np.asarray(p.prox_wsum_g(w, xp)), z)
    np.testing.assert_allclose(z, [2.85, 3.85, 4.85, 5.85, 6.85])


def test_sd_values():
    p = SD()
    s2 = np.sqrt(2)
    x = jnp.array([1.0, s2, s2, 1.0])
    np.testing.assert_allclose(np.asarray(p.f(x)), [7.0, 8.0], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(p.g(x)), [0.0, 0.0])
    # feasible point projects to itself
    np.testing.assert_allclose(
        np.asarray(p.prox_wsum_g(jnp.array([0.5, 0.5]), x)), np.asarray(x)
    )


def test_fds_values():
    p = FDS(n_features=5)
    x = jnp.array([1.0, 2.0, 3.0, 4.0, 5.0])
    k = np.arange(1, 6)
    f1 = np.dot(k, (np.asarray(x) - k) ** 4) / 25
    f2 = np.exp(3.0) + np.dot(np.asarray(x), np.asarray(x))
    f3 = np.dot(k * k[::-1], np.exp(-np.asarray(x))) / 30
    np.testing.assert_allclose(np.asarray(p.f(x)), [f1, f2, f3], rtol=1e-12)


def test_fds_constrained_g_inf():
    p = FDS(n_features=5, bounds=(0.0, jnp.inf))
    assert np.all(np.asarray(p.g(jnp.ones(5))) == 0)
    assert np.all(np.isinf(np.asarray(p.g(-jnp.ones(5)))))
    w = jnp.full(3, 1 / 3)
    x = jnp.array([-3.0, -1.0, 0.0, 1.0, 3.0])
    np.testing.assert_allclose(
        np.asarray(p.prox_wsum_g(w, x)), [0, 0, 0, 1, 3]
    )


def test_zdt1_values():
    p = ZDT1(n_features=8)
    x = jnp.full(8, 0.5)
    h = 1 + 9 / 7 * 3.5
    np.testing.assert_allclose(
        np.asarray(p.f(x)), [0.5, h * (1 - np.sqrt(0.5 / h))], rtol=1e-12
    )


def test_tridia_and_toi4_values():
    x3 = jnp.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(np.asarray(TRIDIA().f(x3)), [1.0, 0.0, 3.0])
    x4 = jnp.array([1.0, 2.0, 3.0, 5.0])
    np.testing.assert_allclose(np.asarray(TOI4().f(x4)), [6.0, 3.5])


def test_linear_function_rank1_values():
    p = LinearFunctionRank1(n_features=6)
    x = jnp.ones(6)
    s = 21.0
    np.testing.assert_allclose(
        np.asarray(p.f(x)), [(i * s - 1) ** 2 for i in range(1, 5)]
    )


def test_jos1_solve_reaches_pareto_set():
    """JOS1's Pareto set is {x : x_i = c, c in [0, 2]}; a solve from any
    start must land on it."""
    p = JOS1()
    x0 = jnp.array([3.0, -1.0, 0.5, 2.5, 1.0])
    res = p.minimize_proximal_gradient(x0, nesterov=True)
    assert res.success
    x = np.asarray(res.x)
    assert np.all(x >= -1e-6) and np.all(x <= 2 + 1e-6)
    np.testing.assert_allclose(x, x.mean(), atol=1e-4)


def test_sd_solve_feasible():
    p = SD()
    x0 = jnp.array([1.5, 1.5, 1.5, 1.5])
    res = p.minimize_proximal_gradient(x0, nesterov=True, max_iter=20000)
    assert res.success
    assert np.all(np.asarray(res.x) >= 1e-6 - 1e-15)


def test_problem_names():
    assert JOS1().name == "JOS1_n_5"
    assert "l1_ratios_0.2_0.1" in JOS1(l1_ratios=[0.2, 0.1]).name


def test_first_shift_quirk_matches_reference():
    """The reference's prox ignores l1_shifts[0] (a self-cancelling
    '- s0 + s0' in zfista/problems.py:128-130, presumably a latent bug);
    we replicate it bit-for-bit for trajectory parity. This test pins the
    agreement with the reference's literal formula so any future 'fix'
    here is a conscious divergence."""
    from zfista_tpu.ops.prox import make_wsum_shifted_l1_box_prox, soft_threshold

    ratios = jnp.asarray([0.5])
    shifts = jnp.asarray([2.0])  # nonzero FIRST shift: the quirk case
    prox = make_wsum_shifted_l1_box_prox(ratios, shifts, None, None)
    x = jnp.asarray([0.3, -1.4, 2.2])
    w = jnp.asarray([0.4])
    got = prox(w, x)
    # reference formula: prox_lasso(x + sum(coef[1:]) - s0 + s0, coef[0])
    coef = w * ratios
    ref = soft_threshold(x + 0.0 - shifts[0] + shifts[0], coef[0])
    # 1-ulp tolerance: the implementation skips the literal '- s0 + s0'
    # round trip (which perturbs rounding); semantics are identical.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-15)
    # NOT the shifted prox (that is the documented inconsistency):
    shifted = soft_threshold(x - shifts[0], coef[0]) + shifts[0]
    assert not np.allclose(np.asarray(got), np.asarray(shifted))


def test_wsum_prox_none_shifts():
    """make_wsum_shifted_l1_box_prox(l1_ratios, None, ...) means all-zero
    shifts (the signature advertises Array | None; this used to crash
    with a trace-time TypeError)."""
    import jax.numpy as jnp

    from zfista_tpu.ops.prox import make_wsum_shifted_l1_box_prox

    p_none = make_wsum_shifted_l1_box_prox(
        jnp.array([0.1, 0.2]), None, None, None
    )
    p_zero = make_wsum_shifted_l1_box_prox(
        jnp.array([0.1, 0.2]), jnp.array([0.0, 0.0]), None, None
    )
    w = jnp.array([0.5, 0.5])
    x = jnp.array([1.0, -2.0, 0.05])
    np.testing.assert_array_equal(
        np.asarray(p_none(w, x)), np.asarray(p_zero(w, x))
    )


def test_integer_design_matrix_keeps_regularization():
    """An int-dtype A must not truncate the packed lambda scalar to 0
    (round-3 finding: jnp.asarray(0.01, int32) == 0 made solve() run
    silently unregularized)."""
    import jax.numpy as jnp

    from zfista_tpu.models.lasso import Lasso
    from zfista_tpu.models.logistic import SparseLogistic

    A_int = np.array([[1, 0], [0, 1], [1, 1]], dtype=np.int32)
    lp = Lasso(A_int, np.array([1.0, 1.0, 2.0]), l1_ratio=0.5)
    assert jnp.issubdtype(lp.A.dtype, jnp.floating)
    res = lp.solve_fixed_step(np.zeros(2), max_iter=2000)
    # with lambda = 0.5 the solution is visibly shrunk vs least squares
    ls = np.linalg.lstsq(A_int.astype(float), [1.0, 1.0, 2.0], rcond=None)[0]
    assert np.abs(res.x).sum() < np.abs(ls).sum() - 0.05

    sl = SparseLogistic(A_int, [1, -1, 1], l1_ratio=0.3)
    assert jnp.issubdtype(sl.A.dtype, jnp.floating)
    assert float(sl._params[2]) == 0.3


def test_l1_ratios_shape_validation_and_host_constants():
    """(m, 1)-shaped l1_ratios must raise at construction (not corrupt
    g() downstream), and the stored constants are host float64 (immune
    to the construct-before-x64 float32 freeze)."""
    from zfista_tpu.models.zoo import JOS1

    with pytest.raises(ValueError, match="l1_ratios"):
        JOS1(n_features=5, l1_ratios=[[0.1], [0.2]], l1_shifts=[0.0, 0.0])
    p = JOS1(n_features=5, l1_ratios=[0.1, 0.2], l1_shifts=[0.0, -1.0])
    assert isinstance(p.l1_ratios, np.ndarray)
    assert p.l1_ratios.dtype == np.float64
