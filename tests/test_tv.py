"""Total-variation prox: exactness, certificates, and the TVDeblur model.

Oracle strategy (no external TV library exists in this environment): the
1-D TV prox dual is a box-constrained least-squares problem
``min ||lam*D z - v||^2, -1 <= z <= 1`` — solved independently by
``scipy.optimize.lsq_linear`` to machine precision on small instances.
A y-constant 2-D image separates row-wise into that 1-D problem (its
y-differences are zero), so the 2-D FGP prox must match the 1-D oracle
exactly, for both the isotropic and anisotropic discretizations (they
coincide when one gradient component vanishes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import lsq_linear

from zfista_tpu.models.deblur import TVDeblur, gaussian_kernel, make_blur
from zfista_tpu.ops.tv import _div2d, _grad2d, prox_tv, tv2d, tv_dual_gap


def tv1d_prox_oracle(v, lam):
    """Exact 1-D TV prox via the dual box-QP (independent scipy solver)."""
    v = np.asarray(v, float)
    n = len(v)
    D = np.zeros((n, n - 1))
    for i in range(n - 1):
        D[i, i] += 1.0
        D[i + 1, i] -= 1.0
    res = lsq_linear(lam * D, v, bounds=(-1, 1), tol=1e-14, max_iter=5000)
    return v - lam * D @ res.x


def test_grad_div_adjoint():
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((7, 5)))
    p = jnp.asarray(rng.standard_normal((7, 5))).at[-1, :].set(0)
    q = jnp.asarray(rng.standard_normal((7, 5))).at[:, -1].set(0)
    gx, gy = _grad2d(u)
    lhs = jnp.sum(gx * p) + jnp.sum(gy * q)
    rhs = -jnp.sum(u * _div2d(p, q))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-12)


def test_tv2d_values():
    u = jnp.asarray([[0.0, 1.0], [0.0, 1.0]])
    # dx = 0 everywhere, dy = 1 in first column of each row.
    assert float(tv2d(u)) == pytest.approx(2.0)
    assert float(tv2d(u, isotropic=False)) == pytest.approx(2.0)
    u2 = jnp.asarray([[0.0, 1.0], [1.0, 2.0]])
    # pixel (0,0) has dx=1 AND dy=1 -> sqrt(2); pixels (0,1)/(1,0) have a
    # single unit difference each.
    assert float(tv2d(u2)) == pytest.approx(np.sqrt(2) + 2)
    assert float(tv2d(u2, isotropic=False)) == pytest.approx(4.0)


def test_prox_identity_cases():
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal((8, 8)))
    np.testing.assert_array_equal(prox_tv(0.0, v, n_iter=10), v)
    c = jnp.full((8, 8), 3.7)
    np.testing.assert_allclose(prox_tv(0.5, c, n_iter=50), c, atol=1e-12)


def test_prox_shift_equivariance():
    rng = np.random.default_rng(2)
    v = jnp.asarray(rng.standard_normal((16, 16)))
    a = prox_tv(0.2, v + 5.0, n_iter=200)
    b = prox_tv(0.2, v, n_iter=200) + 5.0
    np.testing.assert_allclose(a, b, atol=1e-12)


@pytest.mark.parametrize("isotropic", [True, False])
def test_prox_matches_1d_oracle(isotropic):
    rng = np.random.default_rng(3)
    v1 = rng.standard_normal(16)
    lam = 0.3
    exact = tv1d_prox_oracle(v1, lam)
    V = jnp.asarray(np.tile(v1[:, None], (1, 8)))
    u = prox_tv(lam, V, n_iter=4000, isotropic=isotropic)
    np.testing.assert_allclose(
        np.asarray(u), np.tile(exact[:, None], (1, 8)), atol=1e-10
    )


def test_dual_gap_certificate_decreases():
    rng = np.random.default_rng(4)
    img = np.zeros((32, 32))
    img[8:24, 8:24] = 1.0
    v = jnp.asarray(img + 0.1 * rng.standard_normal((32, 32)))
    gaps = []
    for n in (10, 50, 200):
        u, d = prox_tv(0.15, v, n_iter=n, return_dual=True)
        gaps.append(float(tv_dual_gap(0.15, v, u, d)))
    assert gaps[0] > gaps[1] > gaps[2] > 0
    assert gaps[2] < 1e-2


def test_prox_vmaps_over_lambda():
    rng = np.random.default_rng(5)
    v = jnp.asarray(rng.standard_normal((16, 16)))
    lams = jnp.asarray([0.05, 0.2, 0.8])
    us = jax.vmap(lambda l: prox_tv(l, v, n_iter=100))(lams)
    tvs = [float(tv2d(u)) for u in us]
    # TV strictly decreases as the strength grows.
    assert tvs[0] > tvs[1] > tvs[2]
    # Lane 1 equals the unbatched call (vmap must not change numerics
    # beyond the batched-matmul precision policy; here it's elementwise).
    np.testing.assert_allclose(
        np.asarray(us[1]), np.asarray(prox_tv(0.2, v, n_iter=100)), atol=1e-10
    )


def _blurred_scene(size=64, noise=0.01, seed=0):
    rng = np.random.default_rng(seed)
    img = np.zeros((size, size))
    img[size // 4 : 3 * size // 4, size // 4 : 3 * size // 4] = 1.0
    img[size // 2 :, : size // 2] = 0.5
    kernel = gaussian_kernel(9, 2.0)
    blur = make_blur(kernel)
    observed = np.array(blur(jnp.asarray(img)))  # writable host copy
    observed += noise * rng.standard_normal(observed.shape)
    return img, observed, kernel


def test_tv_deblur_end_to_end():
    truth, observed, kernel = _blurred_scene()
    prob = TVDeblur(observed, tv_ratio=1e-3, kernel=kernel, prox_iter=30)
    res = prob.solve(max_iter=300, tol=1e-7)
    restored = np.asarray(res.x).reshape(observed.shape)
    mse_obs = float(np.mean((observed - truth) ** 2))
    mse_rec = float(np.mean((restored - truth) ** 2))
    # Deblurring must substantially beat the observed image.
    assert mse_rec < 0.5 * mse_obs, (mse_rec, mse_obs)
    # Objective decreased from the warm start.
    F0 = float(prob.f(prob.x0())[0] + prob.g(prob.x0())[0])
    assert float(np.ravel(res.fun)[0]) < F0


def test_tv_deblur_objective_monotone_ista():
    """Un-accelerated fixed-step descent is monotone even with the inexact
    prox at this budget (certificate that prox_iter=30 is 'enough')."""
    _, observed, kernel = _blurred_scene(size=32)
    prob = TVDeblur(observed, tv_ratio=1e-3, kernel=kernel, prox_iter=30)
    res = prob.solve(max_iter=60, nesterov=False, return_all=True, tol=0.0)
    funs = np.asarray(res.allfuns)
    assert np.all(np.diff(funs) <= 1e-10), funs[np.argmax(np.diff(funs))]


def test_tv_deblur_params_path_reuses_compiled_program():
    """Two TVDeblur instances with the same shapes/config must share one
    compiled solver program (module-level callables + params), and a
    second observation must give the same answer as a fresh bound-method
    solve would (review finding: closure constants defeated the cache)."""
    from zfista_tpu.core import solver as S

    # Count-based assertions need headroom below the FIFO cap: a full
    # suite run can leave the shared cache at capacity, where inserting
    # evicts and len() no longer moves.
    S._DRIVER_CACHE.clear()
    truth, observed, kernel = _blurred_scene(size=32, seed=1)
    p1 = TVDeblur(observed, tv_ratio=1e-3, kernel=kernel, prox_iter=10)
    n_before = len(S._DRIVER_CACHE)
    r1 = p1.solve(max_iter=30, tol=0.0)
    n_mid = len(S._DRIVER_CACHE)
    _, observed2, _ = _blurred_scene(size=32, seed=2)
    p2 = TVDeblur(observed2, tv_ratio=1e-3, kernel=kernel, prox_iter=10)
    r2 = p2.solve(max_iter=30, tol=0.0)
    n_after = len(S._DRIVER_CACHE)
    assert n_mid > n_before  # first solve compiled something
    assert n_after == n_mid  # second instance reused it
    assert r1.nit == r2.nit == 30
    assert not np.allclose(r1.x, r2.x)  # genuinely different observations


def test_solve_warm_matches_cold_quality():
    """The warm-dual fast path at prox_iter=8 must reach the cold path's
    (prox_iter=30) restoration quality: objective within 0.5% and MSE to
    the ground truth within 10%."""
    truth, observed, kernel = _blurred_scene(size=32)
    prob = TVDeblur(observed, tv_ratio=1e-3, kernel=kernel, prox_iter=30)
    cold = prob.solve(max_iter=200, tol=1e-6)
    warm = prob.solve_warm(max_iter=200, tol=1e-6, prox_iter=8)
    F_cold = float(np.ravel(cold.fun)[0])
    assert abs(warm["fun"] - F_cold) <= 5e-3 * abs(F_cold), (warm["fun"], F_cold)
    mse_c = float(np.mean((np.asarray(cold.x).reshape(truth.shape) - truth) ** 2))
    mse_w = float(np.mean((warm["x"].reshape(truth.shape) - truth) ** 2))
    assert mse_w <= 1.1 * mse_c, (mse_w, mse_c)


def test_solve_warm_requires_separable_kernel():
    rng = np.random.default_rng(0)
    k = rng.random((5, 5))
    k /= k.sum()
    _, observed, _ = _blurred_scene(size=16)
    prob = TVDeblur(observed, tv_ratio=1e-3, kernel=k)
    with pytest.raises(ValueError):
        prob.solve_warm()


def test_prox_tv_dual0_warm_start_converges_faster():
    """A warm dual from a nearby input must give a smaller duality gap
    than a cold start at the same (small) budget."""
    rng = np.random.default_rng(6)
    img = np.zeros((24, 24))
    img[6:18, 6:18] = 1.0
    v1 = jnp.asarray(img + 0.05 * rng.standard_normal((24, 24)))
    v2 = v1 + 0.01 * jnp.asarray(rng.standard_normal((24, 24)))
    _, dual = prox_tv(0.15, v1, n_iter=200, return_dual=True)
    u_cold, d_cold = prox_tv(0.15, v2, n_iter=5, return_dual=True)
    u_warm, d_warm = prox_tv(0.15, v2, n_iter=5, return_dual=True, dual0=dual)
    g_cold = float(tv_dual_gap(0.15, v2, u_cold, d_cold))
    g_warm = float(tv_dual_gap(0.15, v2, u_warm, d_warm))
    assert g_warm < 0.5 * g_cold, (g_warm, g_cold)


def test_prox_tv_pallas_matches_xla():
    """The VMEM-resident Pallas FGP kernel (forced through the Pallas
    interpreter on CPU via method="pallas_interpret") must match the XLA
    fori_loop to float-parity: same formulas, certified by an equal dual
    gap.  Covers isotropic + anisotropic, cold + warm dual, lam<=0
    passthrough, the over-VMEM fallback, and the off-TPU fallback of
    method="pallas" itself (bitwise the XLA loop here)."""
    from zfista_tpu.ops import tv_pallas
    from zfista_tpu.ops.tv import prox_tv, tv_dual_gap

    rng = np.random.default_rng(11)
    v = jnp.asarray(rng.standard_normal((24, 40)), jnp.float32)
    lam = jnp.asarray(0.15, jnp.float32)
    for iso in (True, False):
        u_x, d_x = prox_tv(lam, v, n_iter=25, isotropic=iso, return_dual=True)
        u_p, d_p = prox_tv(
            lam,
            v,
            n_iter=25,
            isotropic=iso,
            return_dual=True,
            method="pallas_interpret",
        )
        np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_x), atol=1e-6)
        g_x = float(tv_dual_gap(lam, v, u_x, d_x, isotropic=iso))
        g_p = float(tv_dual_gap(lam, v, u_p, d_p, isotropic=iso))
        np.testing.assert_allclose(g_p, g_x, rtol=1e-4)
        # warm start from the other method's dual
        u_x2 = prox_tv(lam, v, n_iter=8, isotropic=iso, dual0=d_x)
        u_p2 = prox_tv(
            lam, v, n_iter=8, isotropic=iso, dual0=d_x,
            method="pallas_interpret",
        )
        np.testing.assert_allclose(np.asarray(u_p2), np.asarray(u_x2), atol=1e-6)
    # lam = 0 passthrough
    z = jnp.asarray(0.0, jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(prox_tv(z, v, method="pallas_interpret")), np.asarray(v)
    )
    # method="pallas" (and the default, "auto") on a non-TPU backend
    # falls back to the XLA loop (documented contract) — bitwise
    # identical to method="xla" there.  On a TPU backend both dispatch
    # the REAL Mosaic kernel, whose bitwise identity to the XLA loop is
    # explicitly NOT promised (FMA scheduling); the TPU-gated test below
    # covers that case at tolerance.
    if jax.default_backend() != "tpu":
        u_fb = prox_tv(lam, v, n_iter=25, method="pallas")
        u_ref = prox_tv(lam, v, n_iter=25, method="xla")
        np.testing.assert_array_equal(np.asarray(u_fb), np.asarray(u_ref))
        u_auto = prox_tv(lam, v, n_iter=25)  # default method="auto"
        np.testing.assert_array_equal(np.asarray(u_auto), np.asarray(u_ref))
    # VMEM capacity gate: images over budget report not-fitting (the prox
    # falls back to the XLA loop, so results stay exact there)
    assert tv_pallas.fits_vmem((256, 256), jnp.float32)
    assert not tv_pallas.fits_vmem((2048, 2048), jnp.float32)
    with pytest.raises(ValueError, match="method"):
        prox_tv(lam, v, method="nope")


def test_tv_deblur_pallas_prox_method():
    """TVDeblur(prox_method=...) reaches prox_tv on the main solve path:
    the interpreted kernel end-to-end matches the XLA prox (non-vacuous:
    the kernel is counted, not assumed)."""
    from unittest import mock

    from zfista_tpu.ops import tv_pallas

    truth, observed, kernel = _blurred_scene(size=16, seed=3)
    kw = dict(tv_ratio=1e-3, kernel=kernel, prox_iter=8)
    r_x = TVDeblur(observed, **kw).solve(max_iter=20, tol=0.0)
    real = tv_pallas.fgp_pallas
    with mock.patch.object(
        tv_pallas, "fgp_pallas", side_effect=real
    ) as spy:
        r_p = TVDeblur(observed, prox_method="pallas_interpret", **kw).solve(
            max_iter=20, tol=0.0
        )
    assert spy.call_count > 0, "solve() never reached the Pallas kernel"
    assert r_x.nit == r_p.nit == 20
    np.testing.assert_allclose(r_p.x, r_x.x, atol=1e-5)


def test_pallas_interpret_ignores_vmem_cap():
    """method='pallas_interpret' must run the kernel at ANY size (the VMEM
    budget gates only the real TPU kernel); otherwise large-shape parity
    tests would compare XLA against itself."""
    from unittest import mock

    from zfista_tpu.ops import tv_pallas
    from zfista_tpu.ops.tv import prox_tv

    rng = np.random.default_rng(3)
    # over-budget shape (fits_vmem False), but tiny n_iter keeps it fast
    v = jnp.asarray(rng.standard_normal((600, 600)), jnp.float32)
    assert not tv_pallas.fits_vmem(v.shape, v.dtype)
    real = tv_pallas.fgp_pallas
    with mock.patch.object(tv_pallas, "fgp_pallas", side_effect=real) as spy:
        u = prox_tv(jnp.float32(0.1), v, n_iter=2, method="pallas_interpret")
    assert spy.call_count == 1
    u_x = prox_tv(jnp.float32(0.1), v, n_iter=2)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_x), atol=1e-6)


def test_fgp_strips_matches_xla_bitwise_interpret():
    """The temporally-blocked strip-sweep kernel (past-VMEM path) must
    reproduce the XLA fori_loop BITWISE in interpret mode: temporal
    blocking with a k-row halo is exact, not approximate — after k Jacobi
    iterations the interior rows are the same floats the whole-image
    iteration produces.  Covers a remainder-only sweep (n_iter < k), an
    exact multiple, multi-sweep + remainder, both discretizations, a warm
    dual, and vmap (the Pallas batching rule must not confuse the batch
    grid axis with the strip axis the kernel indexes via program_id)."""
    from zfista_tpu.ops import tv_pallas

    rng = np.random.default_rng(13)
    # H=160 -> strip_rows picks S=32: five strips, both clamped edge
    # windows and interior windows exercised.
    v = jnp.asarray(rng.standard_normal((160, 128)), jnp.float32)
    assert tv_pallas.strip_rows(v.shape, v.dtype) == 32
    lam = jnp.asarray(0.15, jnp.float32)
    p0 = q0 = jnp.zeros_like(v)
    for pipe in (False, True):  # serial sweep and double-buffered sweep
        for iso in (True, False):
            for n_iter in (5, 8, 20):
                u_x = prox_tv(
                    lam, v, n_iter=n_iter, isotropic=iso, method="xla"
                )
                u_s, _, _ = tv_pallas.fgp_pallas_strips(
                    lam, v, p0, q0, n_iter=n_iter, isotropic=iso,
                    interpret=True, pipelined=pipe,
                )
                np.testing.assert_array_equal(
                    np.asarray(u_s), np.asarray(u_x)
                )
        # warm dual
        _, d0 = prox_tv(lam, v, n_iter=30, method="xla", return_dual=True)
        u_x = prox_tv(lam, v, n_iter=8, method="xla", dual0=d0)
        u_s, _, _ = tv_pallas.fgp_pallas_strips(
            lam, v, d0[0], d0[1], n_iter=8, interpret=True, pipelined=pipe
        )
        np.testing.assert_array_equal(np.asarray(u_s), np.asarray(u_x))
        # vmap over (lam, v) lanes == per-lane unbatched
        vs = jnp.asarray(rng.standard_normal((3, 160, 128)), jnp.float32)
        lams = jnp.asarray([0.05, 0.15, 0.4], jnp.float32)
        us = jax.vmap(
            lambda l, vv: tv_pallas.fgp_pallas_strips(
                l, vv, p0, q0, n_iter=8, interpret=True, pipelined=pipe
            )[0]
        )(lams, vs)
        for i in range(3):
            u1, _, _ = tv_pallas.fgp_pallas_strips(
                lams[i], vs[i], p0, q0, n_iter=8,
                interpret=True, pipelined=pipe,
            )
            np.testing.assert_array_equal(np.asarray(us[i]), np.asarray(u1))


def test_strip_rows_capacity_rules():
    """strip_rows: largest admissible height that divides H and fits
    _STRIP_LIVE_BUFFERS haloed tiles in the VMEM cap; None when no
    candidate divides H (e.g. 600 = 8*75 has no 32..512 power-of-two
    divisor) or the image is shorter than one haloed tile."""
    from zfista_tpu.ops import tv_pallas

    assert tv_pallas.strip_rows((1024, 1024), jnp.float32) == 128
    assert tv_pallas.strip_rows((2048, 2048), jnp.float32) == 64
    assert tv_pallas.strip_rows((1024, 512), jnp.float32) == 256
    assert tv_pallas.strip_rows((600, 600), jnp.float32) is None
    assert tv_pallas.strip_rows((16, 128), jnp.float32) is None
    # The double-buffered variant's prefetch slots cost 5 extra tiles but
    # keep the same S at the record sizes ...
    assert tv_pallas.strip_rows((1024, 1024), jnp.float32, pipelined=True) == 128
    assert tv_pallas.strip_rows((2048, 2048), jnp.float32, pipelined=True) == 64
    # ... and shrink it on shapes near the serial budget's edge — there
    # the dispatch keeps the serial kernel (ops/tv.py prox_tv).
    assert tv_pallas.strip_rows((1024, 1664), jnp.float32) == 128
    assert tv_pallas.strip_rows((1024, 1664), jnp.float32, pipelined=True) == 64


def test_prox_tv_dispatches_strips_past_vmem_on_tpu(monkeypatch):
    """On a TPU backend, method='pallas'/'auto' past the all-VMEM wall
    must route to the strip kernel (not silently fall back to XLA).
    Simulated on CPU: backend name patched, the strip kernel spied and
    forced through the interpreter; the result must match the XLA loop."""
    from zfista_tpu.ops import tv_pallas

    rng = np.random.default_rng(17)
    v = jnp.asarray(rng.standard_normal((1024, 512)), jnp.float32)
    assert not tv_pallas.fits_vmem(v.shape, v.dtype)
    lam = jnp.asarray(0.1, jnp.float32)
    u_ref = prox_tv(lam, v, n_iter=2, method="xla")
    real = tv_pallas.fgp_pallas_strips
    calls = []

    def fake(lam, v, p0, q0, n_iter, isotropic, interpret, pipelined=False):
        calls.append((v.shape, pipelined))
        return real(
            lam, v, p0, q0, n_iter=n_iter, isotropic=isotropic, interpret=True
        )

    monkeypatch.setattr(tv_pallas, "fgp_pallas_strips", fake)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    u = prox_tv(lam, v, n_iter=2, method="pallas")
    # At (1024, 512) the pipelined budget keeps the same strip height
    # (S=256), so the dispatch picks the double-buffered kernel.
    assert calls == [((1024, 512), True)]
    np.testing.assert_array_equal(np.asarray(u), np.asarray(u_ref))


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="real Mosaic kernel needs a TPU"
)
def test_prox_tv_pallas_on_tpu_parity():
    """The REAL Mosaic-compiled kernel (not the interpreter) vs the XLA
    loop, on actual TPU hardware.  The CPU suite covers the kernel only
    through the Pallas interpreter, which cannot catch Mosaic
    compile/layout bugs; this test runs wherever a TPU backend is
    attached (skipped on the CPU mesh).  Contract is ~1e-5 tolerance +
    matching dual-gap certificate; on the current toolchain the match is
    observed BITWISE (v5e, round 3) — asserted at tolerance so a benign
    scheduler change does not break the suite."""
    from zfista_tpu.ops.tv import prox_tv, tv_dual_gap

    rng = np.random.default_rng(7)
    # (1024, 1024) is past the all-VMEM wall: method="pallas" dispatches
    # the strip-sweep kernel there — the real-Mosaic gate for BOTH kernels.
    for shape in [(24, 40), (256, 256), (100, 224), (1024, 1024)]:
        v = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        lam = jnp.asarray(0.15, jnp.float32)
        for iso in (True, False):
            u_x, d_x = prox_tv(
                lam, v, n_iter=30, isotropic=iso, return_dual=True,
                method="xla",
            )
            u_p, d_p = prox_tv(
                lam, v, n_iter=30, isotropic=iso, return_dual=True,
                method="pallas",
            )
            np.testing.assert_allclose(
                np.asarray(u_p), np.asarray(u_x), atol=1e-5
            )
            g_x = float(tv_dual_gap(lam, v, u_x, d_x, isotropic=iso))
            g_p = float(tv_dual_gap(lam, v, u_p, d_p, isotropic=iso))
            np.testing.assert_allclose(g_p, g_x, rtol=1e-3, atol=1e-6)
    # Past-VMEM shape: the serial and double-buffered strip kernels must
    # agree BITWISE on real Mosaic (identical per-strip compute; only DMA
    # scheduling differs — observed bitwise on v5e, round 4).
    from zfista_tpu.ops import tv_pallas

    v = jnp.asarray(rng.standard_normal((1024, 1024)), jnp.float32)
    lam = jnp.asarray(0.15, jnp.float32)
    z = jnp.zeros_like(v)
    u_s, p_s, q_s = tv_pallas.fgp_pallas_strips(lam, v, z, z, n_iter=30)
    u_d, p_d, q_d = tv_pallas.fgp_pallas_strips(
        lam, v, z, z, n_iter=30, pipelined=True
    )
    np.testing.assert_array_equal(np.asarray(u_d), np.asarray(u_s))
    np.testing.assert_array_equal(np.asarray(p_d), np.asarray(p_s))
    np.testing.assert_array_equal(np.asarray(q_d), np.asarray(q_s))
