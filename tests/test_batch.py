"""Batched (vmap) driver tests: batch == sequence of single solves, λ-sweep
params, sharded placement on the 8-device CPU mesh.

Mirrors the reference's joblib fan-out semantics (each lane an independent
solve; reference benchmarks/benchmark.py:325-334) with the vmapped driver.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zfista_tpu.models.lasso import Lasso, make_lasso_lambda_sweep
from zfista_tpu.models.zoo import JOS1
from zfista_tpu.parallel.batch import minimize_proximal_gradient_batch
from zfista_tpu.parallel.sharding import batch_sharding, make_mesh


@pytest.fixture(scope="module")
def toy_lasso():
    # 1-D closed-form toy in the spirit of the reference's LASSO tests
    # (tests/test_proximal_gradient.py:70-114): with this A and b,
    # f(x) = ||Ax - b||^2 = (x - 1)^2 + const, so
    # argmin (x-1)^2 + r|x|  =  1 - r/2  (e.g. r=0.1 -> x* = 0.95).
    A = np.array([[1.0], [0.0], [0.0]])
    b = np.array([1.0, 0.0, 0.0])
    return A, b


def test_batch_matches_single(toy_lasso):
    A, b = toy_lasso
    prob = Lasso(A, b, l1_ratio=0.1)
    x0s = jnp.array([[0.0], [2.0], [-3.0], [0.5]])
    res = minimize_proximal_gradient_batch(
        prob.f, prob.g, prob.jac_f, prob.prox_wsum_g, x0s, lr=0.4, nesterov=True
    )
    assert res.x.shape == (4, 1)
    assert bool(np.all(res.success))
    # Closed form (see fixture): x* = 1 - 0.1/2 = 0.95.
    np.testing.assert_allclose(res.x, 0.95, atol=1e-4)
    for i, r in enumerate(res.to_list()):
        single = prob.minimize_proximal_gradient(
            np.asarray(x0s[i]), lr=0.4, nesterov=True
        )
        np.testing.assert_allclose(r.x, single.x, atol=1e-6)
        np.testing.assert_allclose(r.fun, single.fun, atol=1e-8)


@pytest.mark.skipif(
    not jax.config.jax_enable_x64,
    reason="f64-precision parity asserts (1e-12/exact-nit) need x64",
)
def test_batch_multiobjective_jos1():
    prob = JOS1(n_features=5)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-2, 4, size=(6, 5)))
    res = minimize_proximal_gradient_batch(
        prob.f, prob.g, prob.jac_f, prob.prox_wsum_g, x0s, nesterov=True
    )
    assert bool(np.all(res.success))
    # Pareto set of JOS1 is the segment x = c*ones, c in [0, 2]; each
    # converged point must be (approximately) a constant vector in [0,2].
    for x in np.asarray(res.x):
        assert np.ptp(x) < 1e-3
        assert -1e-3 <= x[0] <= 2 + 1e-3
    for r, x0 in zip(res.to_list(), x0s):
        single = prob.minimize_proximal_gradient(np.asarray(x0), nesterov=True)
        np.testing.assert_allclose(r.x, single.x, atol=1e-5)


def test_batch_lambda_sweep(toy_lasso):
    A, b = toy_lasso
    f, g, jac_f, prox = make_lasso_lambda_sweep(A, b)
    lams = jnp.array([1e-8, 0.1, 0.5, 1.0])
    x0s = jnp.zeros((4, 1))
    res = minimize_proximal_gradient_batch(
        f, g, jac_f, prox, x0s, batch_params=lams, lr=0.4, nesterov=True
    )
    # Reference closed forms (tests/test_proximal_gradient.py:106-108):
    # x* = max(1 - lam/2, 0).
    np.testing.assert_allclose(
        res.x[:, 0], [1.0, 0.95, 0.75, 0.5], atol=1e-4
    )


def test_batch_history(toy_lasso):
    A, b = toy_lasso
    prob = Lasso(A, b, l1_ratio=0.1)
    x0s = jnp.array([[0.0], [3.0]])
    res = minimize_proximal_gradient_batch(
        prob.f,
        prob.g,
        prob.jac_f,
        prob.prox_wsum_g,
        x0s,
        lr=0.4,
        nesterov=True,
        history=True,
        history_chunk=32,
    )
    lst = res.to_list()
    for r in lst:
        # allfuns[0] = F(x0) (reference return_all format), so it has one
        # more entry than allerrs — same as the single-solve path.
        assert len(r.allfuns) == len(r.allerrs) + 1
        assert len(r.allfuns) >= 1
        # error criterion decreasing towards tolerance at the end
        assert r.allerrs[-1] < 1e-5


def test_batch_history_matches_single_return_all(toy_lasso):
    """Batched record_vecs history == single-solve return_all, entrywise
    (the reference's allvecs/allfuns/allerrs triple,
    zfista/proximal_gradient.py:432-436, 546-549)."""
    A, b = toy_lasso
    prob = Lasso(A, b, l1_ratio=0.1)
    x0s = jnp.array([[0.0], [3.0]])
    res = minimize_proximal_gradient_batch(
        prob.f,
        prob.g,
        prob.jac_f,
        prob.prox_wsum_g,
        x0s,
        lr=0.4,
        nesterov=True,
        record_vecs=True,  # implies history=True
        history_chunk=32,
    )
    for r, x0 in zip(res.to_list(), x0s):
        single = prob.minimize_proximal_gradient(
            np.asarray(x0), lr=0.4, nesterov=True, return_all=True
        )
        assert len(r.allvecs) == len(single.allvecs)
        assert len(r.allfuns) == len(single.allfuns)
        assert len(r.allerrs) == len(single.allerrs)
        assert len(r.allvecs) == len(r.allfuns) == len(r.allerrs) + 1
        np.testing.assert_allclose(
            np.asarray(r.allvecs), np.asarray(single.allvecs), atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(r.allfuns), np.asarray(single.allfuns), atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(r.allerrs), np.asarray(single.allerrs), atol=1e-7
        )


def test_batch_multiobjective_history_f0_row():
    """Multiobjective batched history also leads with F(x0)."""
    prob = JOS1(n_features=3)
    x0s = jnp.asarray([[1.0, 2.0, 3.0], [0.5, 0.5, 0.5]])
    res = minimize_proximal_gradient_batch(
        prob.f,
        prob.g,
        prob.jac_f,
        prob.prox_wsum_g,
        x0s,
        nesterov=True,
        history=True,
    )
    for r, x0 in zip(res.to_list(), x0s):
        F0 = np.asarray(prob.f(x0)) + np.asarray(prob.g(x0))
        np.testing.assert_allclose(np.asarray(r.allfuns[0]), F0, atol=1e-7)


@pytest.mark.skipif(
    len(jax.devices()) < 2, reason="mesh placement needs >= 2 devices"
)
def test_batch_sharded_placement(toy_lasso):
    A, b = toy_lasso
    prob = Lasso(A, b, l1_ratio=0.1)
    mesh = make_mesh(batch=8, model=1)
    x0s = jax.device_put(
        jnp.linspace(-2, 2, 16).reshape(16, 1), batch_sharding(mesh)
    )
    res = minimize_proximal_gradient_batch(
        prob.f, prob.g, prob.jac_f, prob.prox_wsum_g, x0s, lr=0.4, nesterov=True
    )
    assert bool(np.all(res.success))
    np.testing.assert_allclose(res.x, 0.95, atol=1e-4)


def test_batch_adaptive_restart(toy_lasso):
    A, b = toy_lasso
    prob = Lasso(A, b, l1_ratio=0.1)
    x0s = jnp.array([[0.0], [3.0], [-2.0]])
    res = minimize_proximal_gradient_batch(
        prob.f, prob.g, prob.jac_f, prob.prox_wsum_g, x0s,
        lr=0.4, nesterov=True, adaptive_restart=True,
    )
    assert bool(np.all(res.success))
    np.testing.assert_allclose(res.x, 0.95, atol=1e-4)


def test_iter_chunked_driver_bitwise_identical(toy_lasso):
    A, b = toy_lasso
    prob = Lasso(A, b, l1_ratio=0.1)
    x0s = jnp.array([[0.0], [3.0], [-2.0]])
    base = minimize_proximal_gradient_batch(
        prob.f, prob.g, prob.jac_f, prob.prox_wsum_g, x0s, lr=0.4, nesterov=True
    )
    chunked = minimize_proximal_gradient_batch(
        prob.f, prob.g, prob.jac_f, prob.prox_wsum_g, x0s,
        lr=0.4, nesterov=True, iter_chunk=5,
    )
    np.testing.assert_array_equal(chunked.x, base.x)
    np.testing.assert_array_equal(chunked.nit, base.nit)
    assert bool(np.all(chunked.success))


def test_batch_check_every_bitwise():
    """check_every>1 on the batch driver (masked per-step construction)
    must match check_every=1 bitwise on random problems, mirroring the
    single-solve drivers' property tests."""
    rng = np.random.default_rng(0)
    A = rng.standard_normal((12, 6))
    b = rng.standard_normal(12)
    lam = 0.1
    f = lambda x: jnp.sum((A @ x - b) ** 2)
    jac = lambda x: 2 * (A.T @ (A @ x - b))
    g = lambda x: lam * jnp.sum(jnp.abs(x))
    prox = lambda t, x: jnp.sign(x) * jnp.maximum(jnp.abs(x) - lam * t, 0)
    x0s = jnp.asarray(rng.standard_normal((5, 6)))
    opts = dict(lr=1.0, nesterov=True, tol=1e-6, max_iter=300)
    base = minimize_proximal_gradient_batch(f, g, jac, prox, x0s, **opts)
    fast = minimize_proximal_gradient_batch(
        f, g, jac, prox, x0s, check_every=7, **opts
    )
    for name, fa, ba in zip(base.state._fields, fast.state, base.state):
        np.testing.assert_array_equal(
            np.asarray(fa), np.asarray(ba), err_msg=f"state field {name}"
        )


def test_batch_resume_history_head(toy_lasso):
    """Resumed batched history must head allvecs with the RESUME iterate
    (paired with allfuns[0] = F at that iterate), not the original x0 —
    mirroring the single-solve resume path."""
    A, b = toy_lasso
    prob = Lasso(A, b, l1_ratio=0.1)
    x0s = jnp.array([[0.0], [3.0]])
    kw = dict(lr=0.4, nesterov=True)
    first = minimize_proximal_gradient_batch(
        prob.f, prob.g, prob.jac_f, prob.prox_wsum_g, x0s, max_iter=4, **kw
    )
    states = jax.tree.map(jnp.asarray, first.state)
    resumed = minimize_proximal_gradient_batch(
        prob.f,
        prob.g,
        prob.jac_f,
        prob.prox_wsum_g,
        x0s,
        initial_states=states,
        record_vecs=True,
        history_chunk=16,
        **kw,
    )
    for i, r in enumerate(resumed.to_list()):
        head = np.asarray(r.allvecs[0])
        np.testing.assert_array_equal(head, np.asarray(first.state.x[i]))
        # the head PAIR is consistent: allfuns[0] is F at the head iterate
        F_head = np.asarray(prob.f(head) + prob.g(head)).ravel()[0]
        np.testing.assert_allclose(r.allfuns[0], F_head, rtol=1e-6)
        # x0 after 4 iterations has moved, so the head is NOT x0
        assert not np.array_equal(head, np.asarray(x0s[i]))


def test_batch_cache_differentiates_lr(toy_lasso):
    """Two batched solves identical except for ``lr`` must NOT share a
    compiled program: lr is baked into the init closure (not a program
    argument), so omitting it from the driver-cache key silently reused
    the first call's lr for the second (round-3 review finding)."""
    A, b = toy_lasso
    prob = Lasso(A, b, l1_ratio=0.1)
    x0s = jnp.array([[0.0], [2.0]])
    kw = dict(nesterov=False, tol=0.0, max_iter=3)
    r1 = minimize_proximal_gradient_batch(
        prob.f, prob.g, prob.jac_f, prob.prox_wsum_g, x0s, lr=0.4, **kw
    )
    r2 = minimize_proximal_gradient_batch(
        prob.f, prob.g, prob.jac_f, prob.prox_wsum_g, x0s, lr=0.004, **kw
    )
    np.testing.assert_allclose(np.asarray(r2.lr), 0.004, rtol=1e-6)
    # 3 fixed-lr ISTA steps from x0=2 move very differently at 0.4 vs 0.004
    assert not np.allclose(np.asarray(r1.x), np.asarray(r2.x))


def test_batch_chunk_validation_and_per_lane_ratio(toy_lasso):
    """Round-3 review regressions: (1) iter_chunk/history_chunk < 1 must
    raise (0 made an identity chunk program: host infinite loop / bogus
    never-ran result); (2) per-lane momentum pairs are reported per lane
    by to_list, not as the global default."""
    A, b = toy_lasso
    prob = Lasso(A, b, l1_ratio=0.1)
    x0s = jnp.array([[0.0], [2.0]])
    args = (prob.f, prob.g, prob.jac_f, prob.prox_wsum_g, x0s)
    with pytest.raises(ValueError, match="iter_chunk"):
        minimize_proximal_gradient_batch(*args, lr=0.4, iter_chunk=0)
    with pytest.raises(ValueError, match="history_chunk"):
        minimize_proximal_gradient_batch(
            *args, lr=0.4, history=True, history_chunk=0
        )
    with pytest.warns(UserWarning, match="iter_chunk"):
        minimize_proximal_gradient_batch(
            *args, lr=0.4, iter_chunk=64, check_every=8, max_iter=64
        )
    ab = np.array([[0.0, 0.25], [0.5, 0.25]])
    res = minimize_proximal_gradient_batch(
        *args, lr=0.4, nesterov=True, batch_nesterov_ratio=ab, max_iter=50
    )
    lanes = res.to_list()
    assert lanes[0].nesterov_ratio == (0.0, 0.25)
    assert lanes[1].nesterov_ratio == (0.5, 0.25)


@pytest.mark.skipif(
    not jax.config.jax_enable_x64,
    reason="f64-precision parity asserts (1e-12/exact-nit) need x64",
)
def test_lane_chunked_matches_unchunked():
    """lane_chunk must be a pure capacity knob: chunked (with a padded
    ragged tail) == unchunked, lane-for-lane, across iterates, counters,
    per-lane momentum pairs, histories (different chunk lengths padded +
    masked), and the resumable State."""
    prob = JOS1(n_features=5)
    rng = np.random.default_rng(3)
    B = 10
    x0s = jnp.asarray(rng.uniform(-2, 4, size=(B, 5)))
    ab = np.column_stack(
        [rng.uniform(0.0, 0.9, B), rng.uniform(0.05, 0.25, B)]
    )
    kw = dict(nesterov=True, history=True, record_vecs=True, tol=1e-6)
    full = minimize_proximal_gradient_batch(
        prob.f, prob.g, prob.jac_f, prob.prox_wsum_g, x0s,
        batch_nesterov_ratio=ab, **kw,
    )
    # 10 lanes in chunks of 4: two full chunks + a padded 2-lane tail.
    chunked = minimize_proximal_gradient_batch(
        prob.f, prob.g, prob.jac_f, prob.prox_wsum_g, x0s,
        batch_nesterov_ratio=ab, lane_chunk=4, **kw,
    )
    np.testing.assert_array_equal(chunked.nit, full.nit)
    np.testing.assert_array_equal(chunked.success, full.success)
    np.testing.assert_allclose(chunked.x, full.x, atol=1e-12)
    np.testing.assert_allclose(chunked.fun, full.fun, atol=1e-12)
    np.testing.assert_allclose(
        chunked.nesterov_ratio, full.nesterov_ratio, atol=0
    )
    # Histories: per-lane views must agree (the chunked result pads T
    # internally; to_list masks the filler out).
    for rc, rf in zip(chunked.to_list(), full.to_list()):
        assert len(rc.allfuns) == len(rf.allfuns)
        np.testing.assert_allclose(
            np.asarray(rc.allfuns), np.asarray(rf.allfuns), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(rc.allvecs), np.asarray(rf.allvecs), atol=1e-12
        )
        np.testing.assert_allclose(rc.allerrs, rf.allerrs, atol=1e-12)
    # The merged State must be the full-width carry (resumable).
    assert chunked.state is not None
    np.testing.assert_allclose(chunked.state.x, full.state.x, atol=1e-12)
    np.testing.assert_array_equal(chunked.state.nit, full.state.nit)


def test_lane_chunked_params_and_resume(toy_lasso):
    """lane_chunk composes with batch_params (λ-sweep) and with
    initial_states resume: a chunked resumed run continues exactly."""
    A, b = toy_lasso
    f, g, jac_f, prox = make_lasso_lambda_sweep(A, b)
    lams = jnp.array([1e-8, 0.1, 0.5, 1.0, 0.2])
    x0s = jnp.zeros((5, 1))
    kw = dict(lr=0.4, nesterov=True)
    res = minimize_proximal_gradient_batch(
        f, g, jac_f, prox, x0s, batch_params=lams, lane_chunk=2, **kw
    )
    np.testing.assert_allclose(
        res.x[:, 0], [1.0, 0.95, 0.75, 0.5, 0.9], atol=1e-4
    )
    # Resume path: stop early, continue chunked; must match one full run.
    short = minimize_proximal_gradient_batch(
        f, g, jac_f, prox, x0s, batch_params=lams, max_iter=3, **kw
    )
    cont = minimize_proximal_gradient_batch(
        f, g, jac_f, prox, x0s, batch_params=lams,
        initial_states=short.state, lane_chunk=2, **kw,
    )
    np.testing.assert_allclose(cont.x[:, 0], res.x[:, 0], atol=1e-10)
    # Validation: bad chunk size and sharding+chunking both raise.
    with pytest.raises(ValueError, match="lane_chunk"):
        minimize_proximal_gradient_batch(
            f, g, jac_f, prox, x0s, batch_params=lams, lane_chunk=0, **kw
        )
    mesh = make_mesh()
    with pytest.raises(ValueError, match="in_sharding"):
        minimize_proximal_gradient_batch(
            f, g, jac_f, prox, x0s, batch_params=lams, lane_chunk=2,
            in_sharding=batch_sharding(mesh), **kw,
        )


def _tri_objective_quad():
    """Tiny 3-objective problem (duplicated quadratic): exercises the
    m>=3 semismooth-Newton dual path cheaply — the class whose wide
    vmapped batches fault the TPU backend (DESIGN.md known limitations)."""

    def f(x):
        v = jnp.sum((x - 1.0) ** 2)
        return jnp.stack([v, 2.0 * v, 3.0 * v])

    def g(x):
        return jnp.zeros((3,), x.dtype)

    def prox(w, x):
        return x

    return f, g, None, prox


def test_m3_wide_batch_auto_guard(monkeypatch):
    """Round-3 verdict item 1: on the TPU backend an unchunked m>=3 batch
    wider than the measured safe width must auto-apply lane_chunk (with a
    warning naming the knob) instead of hard-faulting the device — and
    the guarded result must be lane-for-lane the unchunked one."""
    import zfista_tpu.parallel.batch as bm

    f, g, jac, prox = _tri_objective_quad()
    rng = np.random.default_rng(11)
    x0s = jnp.asarray(rng.uniform(-1, 3, size=(6, 3)))
    kw = dict(lr=0.3, nesterov=True, decay_rate=1)
    ref = minimize_proximal_gradient_batch(f, g, jac, prox, x0s, **kw)

    monkeypatch.setattr(bm, "_default_backend", lambda: "tpu")
    monkeypatch.setattr(bm, "_TPU_M3_SAFE_LANES", 4)
    with pytest.warns(UserWarning, match="lane_chunk=4 and iter_chunk=50"):
        guarded = minimize_proximal_gradient_batch(f, g, jac, prox, x0s, **kw)
    np.testing.assert_array_equal(guarded.nit, ref.nit)
    np.testing.assert_allclose(guarded.x, ref.x, atol=1e-12)

    # A caller-provided iter_chunk is respected (guard only fills gaps).
    with pytest.warns(UserWarning, match=r"lane_chunk=4: "):
        guarded2 = minimize_proximal_gradient_batch(
            f, g, jac, prox, x0s, iter_chunk=7, **kw
        )
    np.testing.assert_allclose(guarded2.x, ref.x, atol=1e-12)

    # The depth guard fires alone at ANY width under the lane bound: the
    # depth fault mode is pure kernel runtime, width-independent (round-4
    # on-chip: a B=256 batch running to max_iter=3000 faulted where
    # iter_chunk=50 ran clean).
    monkeypatch.setattr(bm, "_TPU_M3_SAFE_LANES", 100)
    with pytest.warns(UserWarning, match=r"auto-applying iter_chunk=50"):
        guarded3 = minimize_proximal_gradient_batch(f, g, jac, prox, x0s, **kw)
    np.testing.assert_allclose(guarded3.x, ref.x, atol=1e-12)

    # ... but not when max_iter already bounds the kernel at or under the
    # safe depth: no knob is needed, so no warning fires.
    import warnings as _w0

    with _w0.catch_warnings():
        _w0.simplefilter("error")
        short = minimize_proximal_gradient_batch(
            f, g, jac, prox, x0s, max_iter=50, **kw
        )
    np.testing.assert_allclose(short.x, ref.x, atol=1e-12)

    # Explicit knobs (any values) override the guard entirely: no warning.
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        forced = minimize_proximal_gradient_batch(
            f, g, jac, prox, x0s, lane_chunk=6, iter_chunk=1000, **kw
        )
    np.testing.assert_allclose(forced.x, ref.x, atol=1e-12)

    # m=2 batches never trigger the guard, however wide.
    prob2 = JOS1(n_features=3)
    with _w.catch_warnings():
        _w.simplefilter("error")
        minimize_proximal_gradient_batch(
            prob2.f, prob2.g, prob2.jac_f, prob2.prox_wsum_g,
            jnp.asarray(rng.uniform(-1, 3, size=(6, 3))), nesterov=True,
        )


def test_iter_chunk_honored_with_history(toy_lasso):
    """Round-3 verdict item 4: iter_chunk must bound the per-kernel step
    count under history=True too (it was silently dropped).  The scan
    driver's chunk length becomes min(history_chunk, iter_chunk), and the
    recorded histories are unchanged."""
    from zfista_tpu.core.solver import _DRIVER_CACHE

    A, b = toy_lasso
    prob = Lasso(A, b, l1_ratio=0.1)
    x0s = jnp.array([[0.0], [3.0]])
    kw = dict(lr=0.4, nesterov=True, history=True, history_chunk=64)
    ref = minimize_proximal_gradient_batch(
        prob.f, prob.g, prob.jac_f, prob.prox_wsum_g, x0s, **kw
    )
    _DRIVER_CACHE.clear()
    res = minimize_proximal_gradient_batch(
        prob.f, prob.g, prob.jac_f, prob.prox_wsum_g, x0s, iter_chunk=2, **kw
    )
    hist_chunks = [
        k[1] for k in _DRIVER_CACHE if isinstance(k, tuple) and k[:1] == ("hist",)
    ]
    assert hist_chunks == [2], hist_chunks
    for r, rr in zip(res.to_list(), ref.to_list()):
        np.testing.assert_array_equal(r.allfuns, rr.allfuns)
        np.testing.assert_array_equal(r.allerrs, rr.allerrs)


def test_lane_chunk_merge_registry(toy_lasso, monkeypatch):
    """An ndarray result field of chunk-width length that is NOT in the
    per-lane registry must fail the merge loudly (round-3 advisor: a
    future global array field could otherwise be silently concatenated)."""
    import zfista_tpu.parallel.batch as bm

    A, b = toy_lasso
    prob = Lasso(A, b, l1_ratio=0.1)
    orig = bm._pack_result

    def patched(*a, **k):
        res = orig(*a, **k)
        res["mystery"] = np.zeros(2)  # global-looking, chunk-width array
        return res

    monkeypatch.setattr(bm, "_pack_result", patched)
    with pytest.raises(RuntimeError, match="mystery"):
        minimize_proximal_gradient_batch(
            prob.f, prob.g, prob.jac_f, prob.prox_wsum_g,
            jnp.array([[0.0], [3.0], [1.0], [-2.0]]),
            lr=0.4, nesterov=True, lane_chunk=2,
        )


def test_batch_tol_rel(toy_lasso):
    """tol_rel flows through the batch driver: tol=0 batches converge by
    the scaled criterion and the result records the knob."""
    A, b = toy_lasso
    prob = Lasso(A, b, l1_ratio=0.1)
    x0s = jnp.array([[0.0], [3.0]])
    res = minimize_proximal_gradient_batch(
        prob.f, prob.g, prob.jac_f, prob.prox_wsum_g, x0s,
        lr=0.4, nesterov=True, tol=0.0, tol_rel=1e-5, max_iter=500,
    )
    assert bool(np.all(res.success))
    assert res.tol_rel == 1e-5
    np.testing.assert_allclose(res.x, 0.95, atol=1e-4)
    assert res.to_list()[0].tol_rel == 1e-5
    with pytest.raises(ValueError, match="tol_rel"):
        minimize_proximal_gradient_batch(
            prob.f, prob.g, prob.jac_f, prob.prox_wsum_g, x0s, tol_rel=-1.0
        )


def test_lane_chunked_device_fault_returns_partial(monkeypatch):
    """A device fault mid-batch (the m>=3 capacity modes are session-
    dependent backend weather, DESIGN.md) must not throw away the chunks
    already solved: the batch analog of the reference's partial-result
    contract (reference zfista/proximal_gradient.py:493-509).  Solved
    lanes keep their results; the faulted chunk and everything after are
    marked status=2 with x = x0 and NaN objective, no further dispatches
    are attempted, and a warning says exactly which lanes failed."""
    import jax
    import zfista_tpu.parallel.batch as bm

    prob = JOS1(n_features=5)
    rng = np.random.default_rng(3)
    B, K = 12, 4
    x0s = np.asarray(rng.uniform(-2, 4, size=(B, 5)))
    kw = dict(nesterov=True, tol=1e-6)
    ref = minimize_proximal_gradient_batch(
        prob.f, prob.g, prob.jac_f, prob.prox_wsum_g, jnp.asarray(x0s), **kw
    )

    orig = bm.minimize_proximal_gradient_batch
    calls = {"n": 0}

    def flaky(f, g, jac_f, prox, x0_arg, **kwargs):
        if np.shape(x0_arg)[0] == K:  # an inner chunk call
            calls["n"] += 1
            if calls["n"] == 2:
                raise jax.errors.JaxRuntimeError("injected device fault")
        return orig(f, g, jac_f, prox, x0_arg, **kwargs)

    monkeypatch.setattr(bm, "minimize_proximal_gradient_batch", flaky)
    with pytest.warns(UserWarning, match=r"device fault at lane chunk \[4:12\]"):
        res = orig(
            prob.f, prob.g, prob.jac_f, prob.prox_wsum_g, jnp.asarray(x0s),
            lane_chunk=K, **kw,
        )
    # Chunk 0 solved and identical to the unchunked reference.
    np.testing.assert_array_equal(res.success[:K], ref.success[:K])
    np.testing.assert_array_equal(res.nit[:K], ref.nit[:K])
    np.testing.assert_allclose(res.x[:K], ref.x[:K], atol=1e-12)
    # Chunks 1-2 (the faulted one and everything after) marked failed.
    assert not res.success[K:].any()
    assert (res.status[K:] == 2).all()
    np.testing.assert_allclose(res.x[K:], x0s[K:], atol=0)
    assert np.isnan(np.asarray(res.fun[K:], float)).all()
    assert (res.nit[K:] == 0).all()
    assert "partial: device fault" in res.message
    # Only 2 inner dispatches happened (chunk 0 + the faulting chunk 1).
    assert calls["n"] == 2
    # No resumable carry after a fault.
    assert res.state is None
    # A first-chunk fault has nothing to salvage: it propagates.
    calls["n"] = 0

    def flaky_first(f, g, jac_f, prox, x0_arg, **kwargs):
        if np.shape(x0_arg)[0] == K:
            raise jax.errors.JaxRuntimeError("injected device fault")
        return orig(f, g, jac_f, prox, x0_arg, **kwargs)

    monkeypatch.setattr(bm, "minimize_proximal_gradient_batch", flaky_first)
    with pytest.raises(jax.errors.JaxRuntimeError):
        orig(
            prob.f, prob.g, prob.jac_f, prob.prox_wsum_g, jnp.asarray(x0s),
            lane_chunk=K, **kw,
        )
