"""Wavelet-deblur workload tests: Haar DWT orthonormality and perfect
reconstruction, analytic adjoint Jacobian vs autodiff, Lipschitz bound, and
an end-to-end fixed-step FISTA solve that deblurs (reference workload:
examples/cameraman.ipynb)."""

import jax
import jax.numpy as jnp
import numpy as np

from zfista_tpu.models.deblur import (
    TVDeblur,
    WaveletDeblur,
    blur_lipschitz,
    dwt2,
    gaussian_kernel,
    idwt2,
    make_blur,
    synthetic_cameraman,
)


def test_haar_roundtrip_and_orthonormality():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((32, 32)))
    for levels in [1, 2, 5]:
        c = dwt2(img, levels)
        # Orthonormal: energy preserved.
        np.testing.assert_allclose(
            float(jnp.sum(c * c)), float(jnp.sum(img * img)), rtol=1e-12
        )
        rec = idwt2(c, levels)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(img), atol=1e-12)


def test_dwt_adjoint_is_inverse():
    # Orthonormal transform: <dwt(a), b> == <a, idwt(b)>.
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((16, 16)))
    b = jnp.asarray(rng.standard_normal((16, 16)))
    lhs = float(jnp.sum(dwt2(a, 3) * b))
    rhs = float(jnp.sum(a * idwt2(b, 3)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_jac_f_matches_autodiff():
    rng = np.random.default_rng(2)
    img = synthetic_cameraman(16)
    prob = WaveletDeblur(img, l1_ratio=1e-4)
    x = jnp.asarray(rng.standard_normal(16 * 16))
    analytic = np.asarray(prob.jac_f(x))
    auto = np.asarray(jax.jacrev(lambda z: prob.f(z)[0])(x))[None, :]
    np.testing.assert_allclose(analytic, auto, atol=1e-9)


def test_blur_lipschitz_bounds_operator():
    rng = np.random.default_rng(3)
    k = gaussian_kernel(5, 1.5)
    blur = make_blur(k)
    L = blur_lipschitz(k, (16, 16))
    # Power iteration on the actual (SAME-padded) operator must not exceed
    # the circular-symbol bound.
    v = jnp.asarray(rng.standard_normal((16, 16)))
    for _ in range(50):
        w = blur(blur(v))  # blur is self-adjoint
        v = w / jnp.linalg.norm(w)
    lam = float(jnp.sum(v * blur(blur(v))))
    assert 2 * lam <= L * (1 + 1e-10)


def test_deblur_solve_improves_image():
    img = synthetic_cameraman(32)
    blur = make_blur(gaussian_kernel(5, 1.0))
    observed = blur(img)
    prob = WaveletDeblur(observed, l1_ratio=1e-6, kernel=gaussian_kernel(5, 1.0))
    res = prob.solve(max_iter=300, tol=1e-7)
    rec = idwt2(jnp.reshape(jnp.asarray(res.x), (32, 32)), prob.levels)
    err_rec = float(jnp.linalg.norm(rec - img))
    err_obs = float(jnp.linalg.norm(observed - img))
    assert err_rec < 0.5 * err_obs
    # Objective must have decreased from the warm start.
    F0 = float(prob.f(prob.x0())[0] + prob.g(prob.x0())[0])
    assert float(np.atleast_1d(res.fun)[0]) < F0


def test_separable_blur_matches_conv():
    """The Gaussian kernel is rank-1 symmetric, so make_blur dispatches to
    the banded-matmul path; it must match the explicit SAME conv (and be
    self-adjoint) to f32 precision, including non-square images."""
    from jax import lax

    k = gaussian_kernel()
    blur = make_blur(k)
    rng = np.random.default_rng(0)

    def conv_ref(img):
        x = jnp.asarray(img)[None, None, :, :]
        w = jnp.asarray(k)[None, None, :, :].astype(x.dtype)
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME", precision=lax.Precision.HIGHEST
        )[0, 0]

    for shape in [(32, 32), (16, 48)]:
        img = jnp.asarray(rng.standard_normal(shape))
        np.testing.assert_allclose(
            np.asarray(blur(img)), np.asarray(conv_ref(img)), atol=1e-5
        )
        # self-adjoint: <blur(X), Y> == <X, blur(Y)>
        Y = jnp.asarray(rng.standard_normal(shape))
        lhs = float(jnp.sum(blur(img) * Y))
        rhs = float(jnp.sum(img * blur(Y)))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-6)


def test_nonseparable_kernel_falls_back_to_conv():
    from jax import lax

    rng = np.random.default_rng(1)
    k = rng.random((5, 5))
    k /= k.sum()  # generic kernel: full rank, not symmetric
    blur = make_blur(k)
    img = jnp.asarray(rng.standard_normal((16, 16)))
    out = blur(img)
    # value parity with an independent explicit SAME conv, not just shape
    # (a mis-dispatch down the banded path would keep the shape)
    ref = lax.conv_general_dilated(
        img[None, None], jnp.asarray(k)[None, None].astype(img.dtype),
        (1, 1), "SAME",
        precision=lax.Precision.HIGHEST,
    )[0, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_even_kernel_falls_back_to_conv():
    """Even-length separable kernels cannot be expressed by the
    odd-centered band matrix (SAME offsets differ); they must take the
    conv path and still match the explicit conv (review finding)."""
    from jax import lax

    g1 = np.exp(-((np.arange(8) - 3.5) ** 2) / 8.0)
    k = np.outer(g1, g1)
    k /= k.sum()
    blur = make_blur(k)
    img = jnp.ones((16, 16))
    x4 = img[None, None]
    w = jnp.asarray(k)[None, None].astype(img.dtype)
    ref = lax.conv_general_dilated(
        x4, w, (1, 1), "SAME", precision=lax.Precision.HIGHEST
    )[0, 0]
    np.testing.assert_allclose(np.asarray(blur(img)), np.asarray(ref), atol=1e-6)


def test_negative_rank1_kernel_not_sign_flipped():
    """K = -a a^T is rank-1 symmetric but NOT expressible as taps taps^T;
    the matmul path would silently negate the output (review finding) —
    must fall back to conv."""
    a = np.array([0.25, 0.5, 0.25])
    k = -np.outer(a, a)
    blur = make_blur(k)
    img = jnp.ones((8, 8))
    out = np.asarray(blur(img))
    assert out[4, 4] < 0  # interior: sum of negative taps


def test_tiny_image_smaller_than_kernel():
    """Images smaller than the kernel half-width must not crash the band
    construction (review finding) and must match the conv."""
    from jax import lax

    k = gaussian_kernel()  # 9x9, half-width 4
    blur = make_blur(k)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((3, 3)))
    x4 = img[None, None]
    w = jnp.asarray(k)[None, None].astype(img.dtype)
    ref = lax.conv_general_dilated(
        x4, w, (1, 1), "SAME", precision=lax.Precision.HIGHEST
    )[0, 0]
    np.testing.assert_allclose(np.asarray(blur(img)), np.asarray(ref), atol=1e-6)


def test_jacobians_exact_for_nonsymmetric_kernels():
    """jac_f must be the TRUE adjoint gradient for kernels where the blur
    is NOT self-adjoint (round-3 review finding: non-palindromic rank-1
    taps pass the separable dispatch, and the conv path accepts arbitrary
    kernels — using the forward blur in the gradient silently converges
    to the wrong image).  Oracle: autodiff of f."""
    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.random((16, 16)))
    # non-palindromic separable kernel (matmul path)
    taps = np.array([0.2, 0.3, 0.5])
    k_sep = np.outer(taps, taps)
    # asymmetric non-separable kernel (conv path), e.g. a motion-ish blur
    k_conv = rng.random((3, 3))
    k_conv /= k_conv.sum()
    # EVEN kernel: SAME padding is asymmetric, so the adjoint must swap
    # the (lo, hi) pads with the flipped kernel (round-3 finding: the
    # plain double-flip adjoint was off by one pixel here)
    k_even = rng.random((4, 4))
    k_even /= k_even.sum()
    for kernel in (k_sep, k_conv, k_even):
        observed = make_blur(kernel)(img)
        probs = [TVDeblur(observed, kernel=kernel)]
        if kernel.shape[0] % 2:  # WaveletDeblur needs 2^k images; any kernel
            probs.append(WaveletDeblur(observed, kernel=kernel))
        for prob in probs:
            x = jnp.asarray(rng.standard_normal(prob.n_features))
            jac = np.asarray(prob.jac_f(x)).ravel()
            jac_ad = np.asarray(jax.grad(lambda z: prob.f(z)[0])(x))
            np.testing.assert_allclose(jac, jac_ad, rtol=1e-8, atol=1e-10)


def test_blur_adjoint_inner_product_identity():
    """<blur(X), Y> == <X, blur*(Y)> for odd, even, and rectangular
    kernels (even kernels pin the swapped-padding adjoint)."""
    rng = np.random.default_rng(5)
    X = jnp.asarray(rng.standard_normal((16, 16)))
    Y = jnp.asarray(rng.standard_normal((16, 16)))
    from zfista_tpu.models.deblur import make_blur as mb

    for shape in [(3, 3), (4, 4), (8, 8), (2, 5), (5, 2)]:
        K = rng.random(shape)
        lhs = float(jnp.sum(mb(K)(X) * Y))
        rhs = float(jnp.sum(X * mb(K, adjoint=True)(Y)))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-12)
