"""Solver behavior coverage: warm start, verbose trace, line-search failure
path, deprecated accept condition, and bounded-problem (SD/ZDT1) parity
with the reference under plain ISTA (no extrapolation outside the domain).
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from zfista_tpu import minimize_proximal_gradient
from zfista_tpu.models.zoo import JOS1, SD, ZDT1


def test_warm_start_same_answer_fewer_inner_iters():
    prob = JOS1(n_features=10)
    rng = np.random.default_rng(0)
    x0 = rng.uniform(-2, 4, size=10)
    cold = prob.minimize_proximal_gradient(x0, nesterov=True)
    warm = prob.minimize_proximal_gradient(x0, nesterov=True, warm_start=True)
    assert cold.success and warm.success
    np.testing.assert_allclose(warm.x, cold.x, atol=1e-6)
    # carried dual weights must not cost more inner work overall
    assert warm.nit_internal <= cold.nit_internal * 1.5


def test_verbose_prints_five_columns(capfd):
    # The reference's verbose table crashes (5 declared columns, 4 values:
    # proximal_gradient.py:24-32 vs 512-517) — tracked fix: ours prints all 5.
    prob = JOS1(n_features=5)
    prob.minimize_proximal_gradient(
        np.ones(5) * 3, nesterov=True, verbose=True, max_iter=50
    )
    import jax

    jax.effects_barrier()
    out = capfd.readouterr().out
    header = [ln for ln in out.splitlines() if "niter" in ln]
    assert header, out
    assert "nit int" in header[0] and "lr" in header[0]
    rows = [ln for ln in out.splitlines() if ln.startswith("|") and "niter" not in ln]
    data_rows = [r for r in rows if "-" not in r.split("|")[1]]
    assert data_rows, out
    # 5 data fields per row
    assert all(len(r.strip("|").split("|")) == 5 for r in data_rows)


def test_line_search_failure_returns_partial_result():
    # f whose gradient lies: claims descent direction that always increases
    # F, so no step size satisfies the accept test -> status 2, last good x.
    f = lambda x: jnp.reshape(jnp.abs(x[0]), (1,))
    jac = lambda x: jnp.reshape(-jnp.sign(x[0]) * 100.0, (1, 1))  # wrong sign
    g = lambda x: jnp.zeros((1,))
    prox = lambda t, x: x
    res = minimize_proximal_gradient(
        f, g, jac, prox, np.array([1.0]), max_backtrack_iter=5, max_iter=50
    )
    assert not res.success
    assert res.status == 2
    assert "Backtracking" in res.message
    np.testing.assert_allclose(res.x, [1.0])  # frozen at last accepted point


def test_deprecated_condition_matches_reference():
    REF = "/root/reference"
    if not os.path.isdir(os.path.join(REF, "zfista")):
        pytest.skip("reference tree not mounted")
    sys.path.insert(0, REF)
    from zfista import minimize_proximal_gradient as ref_minimize

    prob = JOS1(n_features=5)
    rng = np.random.default_rng(3)
    x0 = rng.uniform(-2, 4, size=5)
    opts = dict(nesterov=True, deprecated=True, max_iter=30, tol=0.0, decay_rate=1, lr=0.5)
    with pytest.warns(UserWarning):
        ours = prob.minimize_proximal_gradient(x0, **opts)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        theirs = ref_minimize(
            lambda x: np.asarray(prob.f(jnp.asarray(x))),
            lambda x: np.asarray(prob.g(jnp.asarray(x))),
            lambda x: np.asarray(prob.jac_f(jnp.asarray(x))),
            lambda w, x: np.asarray(prob.prox_wsum_g(jnp.asarray(w), jnp.asarray(x))),
            x0,
            **opts,
        )
    np.testing.assert_allclose(ours.x, theirs.x, atol=1e-8)


@pytest.mark.parametrize("factory,box", [(SD, (1.0, 2.0)), (ZDT1, (0.01, 1.0))])
def test_bounded_problems_converge_and_stay_feasible(factory, box):
    prob = factory()
    rng = np.random.default_rng(4)
    for x0 in rng.uniform(box[0], box[1], size=(2, prob.n_features)):
        res = prob.minimize_proximal_gradient(x0, max_iter=20000)
        assert res.success, res.message
        # iterates respect the box (prox projects)
        assert np.all(res.x >= 1e-6 - 1e-12)
        assert np.all(np.isfinite(np.asarray(res.fun)))


def test_sd_ista_trajectory_parity_vs_reference():
    REF = "/root/reference"
    if not os.path.isdir(os.path.join(REF, "zfista")):
        pytest.skip("reference tree not mounted")
    sys.path.insert(0, REF)
    from zfista import minimize_proximal_gradient as ref_minimize

    prob = SD()
    rng = np.random.default_rng(5)
    # ISTA only: momentum extrapolation can leave the domain of 1/x, which
    # is equally undefined in both implementations.
    for x0 in rng.uniform(1, 2, size=(2, 4)):
        opts = dict(lr=0.05, decay_rate=1, max_iter=30, tol=0.0, nesterov=False)
        ours = prob.minimize_proximal_gradient(x0, **opts)
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            theirs = ref_minimize(
                lambda x: np.asarray(prob.f(jnp.asarray(x))),
                lambda x: np.asarray(prob.g(jnp.asarray(x))),
                lambda x: np.asarray(prob.jac_f(jnp.asarray(x))),
                lambda w, x: np.asarray(
                    prob.prox_wsum_g(jnp.asarray(w), jnp.asarray(x))
                ),
                x0,
                **opts,
            )
        np.testing.assert_allclose(ours.x, theirs.x, atol=1e-8)


def test_adaptive_restart_converges_and_helps_on_jos1():
    # The easy-JOS1 case where plain FISTA oscillates near tolerance and
    # ends up using MORE iterations than ISTA; restart should fix the
    # ripple without changing the answer.
    prob = JOS1(n_features=5)
    rng = np.random.default_rng(6)
    worse = 0
    for x0 in rng.uniform(-2, 4, size=(5, 5)):
        plain = prob.minimize_proximal_gradient(x0, nesterov=True)
        restarted = prob.minimize_proximal_gradient(
            x0, nesterov=True, adaptive_restart=True
        )
        assert restarted.success
        np.testing.assert_allclose(restarted.x, plain.x, atol=1e-4)
        worse += restarted.nit > plain.nit
    assert worse <= 1  # restart at least ties on nearly every start


def test_project_momentum_fixes_zdt1_fista():
    # The reference fails 100% of accelerated ZDT1 solves (extrapolation
    # leaves the domain of sqrt; verified against /root/reference).  With
    # feasible extrapolation (zero-weight prox = box projection), FISTA
    # works on ZDT1 — capability beyond the reference.
    prob = ZDT1(n_features=30)
    rng = np.random.default_rng(7)
    for x0 in rng.uniform(0.01, 1, size=(3, 30)):
        plain = prob.minimize_proximal_gradient(x0, nesterov=True, max_iter=20000)
        assert not plain.success  # reference-identical failure
        fixed = prob.minimize_proximal_gradient(
            x0, nesterov=True, max_iter=20000, project_momentum=True
        )
        assert fixed.success, fixed.message
        assert np.all(np.asarray(fixed.x) >= 1e-6 - 1e-12)


def test_tol_rel_scaled_convergence():
    """Opt-in iterate-scaled tolerance (deliberate divergence from the
    reference's absolute-only criterion, proximal_gradient.py:525-529):
    with tol=0 the absolute test ``err < 0`` can never fire, but
    tol_rel converges once ``err < tol_rel * ||x||_inf``.  Closes the
    FDS-class f32 floor on TPU (DESIGN.md "f32 limitations")."""
    f = lambda x: jnp.sum((x - 2.0) ** 2)
    g = lambda x: jnp.asarray(0.0, x.dtype)
    prox = lambda w, x: x
    x0 = np.zeros(4)
    kw = dict(lr=0.4, nesterov=True, max_iter=200, decay_rate=1)
    with pytest.warns(UserWarning, match="Maximum number of iterations"):
        base = minimize_proximal_gradient(f, g, None, prox, x0, tol=0.0, **kw)
    assert not base.success  # absolute criterion unreachable
    rel = minimize_proximal_gradient(
        f, g, None, prox, x0, tol=0.0, tol_rel=1e-5, **kw
    )
    assert rel.success
    assert rel.nit < base.nit
    assert rel.error_criterion < 1e-5 * np.max(np.abs(rel.x))
    np.testing.assert_allclose(rel.x, 2.0, rtol=1e-4)
    assert rel.tol_rel == 1e-5


def test_tol_rel_zero_is_reference_criterion():
    """tol_rel=0 (the default) must leave every trajectory exactly the
    reference criterion — same nit, bitwise-same iterate."""
    prob = JOS1(n_features=5)
    x0 = np.asarray(np.linspace(-2, 4, 5))
    a = prob.minimize_proximal_gradient(x0, nesterov=True)
    b = prob.minimize_proximal_gradient(x0, nesterov=True, tol_rel=0.0)
    assert a.nit == b.nit
    np.testing.assert_array_equal(a.x, b.x)
    assert b.tol_rel == 0.0
    with pytest.raises(ValueError, match="tol_rel"):
        prob.minimize_proximal_gradient(x0, tol_rel=-1e-3)


def test_iter_chunk_bitwise_parity_and_history():
    """iter_chunk host-chunked driving must be BITWISE the monolithic
    while driver (frozen states no-op), including nit — and must bound
    the scan chunk under return_all (round-4 review finding: the depth
    fault is width-independent, so the single facade needs the same
    kernel-runtime bound the batch API has)."""
    prob = JOS1(n_features=10)
    rng = np.random.default_rng(3)
    x0 = rng.uniform(-2, 4, size=10)
    mono = prob.minimize_proximal_gradient(x0, nesterov=True)
    assert mono.nit > 10  # the host loop must actually re-dispatch
    chunked = prob.minimize_proximal_gradient(x0, nesterov=True, iter_chunk=7)
    assert chunked.nit == mono.nit
    np.testing.assert_array_equal(chunked.x, mono.x)
    np.testing.assert_array_equal(chunked.fun, mono.fun)
    # return_all: the effective scan chunk is min(history_chunk, iter_chunk)
    hist = prob.minimize_proximal_gradient(
        x0, nesterov=True, iter_chunk=7, return_all=True
    )
    assert hist.nit == mono.nit
    assert len(hist.allvecs) == mono.nit + 1
    np.testing.assert_array_equal(hist.x, mono.x)
    with pytest.raises(ValueError, match="iter_chunk"):
        prob.minimize_proximal_gradient(x0, iter_chunk=0)


def test_m3_tpu_single_solve_auto_guard(monkeypatch):
    """On the TPU backend, m>=3 single solves auto-bound kernel depth
    (the measured device fault is kernel RUNTIME, width-independent:
    the default max_iter=1e6 would otherwise dispatch a monolithic
    minutes-long while_loop).  Explicit iter_chunk is respected; results
    are bitwise the unguarded solve."""
    import warnings as _warnings

    import zfista_tpu.core.solver as sm
    from zfista_tpu.models.zoo import TRIDIA

    prob = TRIDIA()
    rng = np.random.default_rng(0)
    x0 = rng.uniform(-1, 1, prob.n_features)
    base = prob.minimize_proximal_gradient(x0, nesterov=True, max_iter=5000)

    monkeypatch.setattr(sm, "_default_backend", lambda: "tpu")
    monkeypatch.setattr(sm, "_TPU_M3_SINGLE_ITER_CHUNK", 3)
    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        guarded = prob.minimize_proximal_gradient(
            x0, nesterov=True, max_iter=5000
        )
    assert any("auto-applying iter_chunk=3" in str(w.message) for w in rec)
    assert guarded.nit == base.nit
    np.testing.assert_array_equal(guarded.x, base.x)
    # explicit value: no auto-guard warning
    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        explicit = prob.minimize_proximal_gradient(
            x0, nesterov=True, max_iter=5000, iter_chunk=5000
        )
    assert not any("auto-applying" in str(w.message) for w in rec)
    np.testing.assert_array_equal(explicit.x, base.x)
    # m < 3 never triggers the guard
    jos = JOS1(n_features=5)
    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        jos.minimize_proximal_gradient(
            rng.uniform(-2, 4, size=5), nesterov=True
        )
    assert not any("auto-applying" in str(w.message) for w in rec)
