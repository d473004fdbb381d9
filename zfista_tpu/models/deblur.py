r"""Wavelet-L1 image deblurring — the reference's flagship imaging workload.

``min_x ||A x - b||² + λ‖x‖₁`` over Haar wavelet coefficients ``x``, where
``A = blur ∘ IDWT``: reconstruct the image from its wavelet coefficients,
then blur with a Gaussian kernel (reference: examples/cameraman.ipynb cells
2-11 — 256×256 cameraman, 9×9 Gaussian σ=4, λ=2e-5, fixed step lr=1/L).

TPU-native construction:

* the 2-D separable Haar DWT/IDWT is expressed with reshape/stack tensor
  algebra (no Python-level recursion over pixels) — each level is a pair of
  butterflies along rows and columns, XLA-fusable and differentiable;
* the blur is ``lax.conv_general_dilated`` with SAME padding (feature-free
  NCHW conv, MXU-eligible);
* the Lipschitz constant is computed exactly as ``L = 2·max|DFT(kernel)|²``
  from the blur kernel's Fourier symbol (the DWT is orthonormal, so it does
  not change the operator norm) — the same spectral argument the reference
  uses via the DCT (cameraman.ipynb cell 6).

``f``/``jac_f``/``prox`` plug straight into the core solver; the Jacobian
is the analytic adjoint ``2·DWT(blur*(residual))`` with the blur's TRUE
adjoint (``make_blur(..., adjoint=True)``; for centro-symmetric kernels it
coincides with the forward blur), validated against autodiff in tests.
"""

from __future__ import annotations

import math
import time as _time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from zfista_tpu._typing import Array
from zfista_tpu.core.solver import minimize_proximal_gradient
from zfista_tpu.ops.prox import soft_threshold
from zfista_tpu.ops.tv import prox_tv, tv2d

_INV_SQRT2 = 1.0 / math.sqrt(2.0)


def _haar_1d(a: Array, axis: int) -> tuple[Array, Array]:
    """One Haar analysis step along ``axis``: (approx, detail)."""
    n = a.shape[axis]
    lo = lax.slice_in_dim(a, 0, n, 2, axis)
    hi = lax.slice_in_dim(a, 1, n, 2, axis)
    return (lo + hi) * _INV_SQRT2, (lo - hi) * _INV_SQRT2


def _ihaar_1d(approx: Array, detail: Array, axis: int) -> Array:
    """Inverse of :func:`_haar_1d` along ``axis``."""
    lo = (approx + detail) * _INV_SQRT2
    hi = (approx - detail) * _INV_SQRT2
    stacked = jnp.stack([lo, hi], axis=axis + 1)
    shape = list(lo.shape)
    shape[axis] *= 2
    return stacked.reshape(shape)


def dwt2(image: Array, levels: int) -> Array:
    """Orthonormal 2-D Haar DWT, coefficients packed in-place
    (approx block at the top-left corner, standard pyramid layout)."""
    out = image
    size = image.shape[0]
    for _ in range(levels):
        block = out[:size, :size]
        lo_r, hi_r = _haar_1d(block, 0)
        ll, lh = _haar_1d(lo_r, 1)
        hl, hh = _haar_1d(hi_r, 1)
        packed = jnp.block([[ll, lh], [hl, hh]])
        out = out.at[:size, :size].set(packed)
        size //= 2
    return out


def idwt2(coeffs: Array, levels: int) -> Array:
    """Inverse of :func:`dwt2` (exact: the transform is orthonormal)."""
    if levels <= 0:
        return coeffs  # dwt2(img, 0) is the identity; keep the pair symmetric
    out = coeffs
    size = out.shape[0] >> (levels - 1)
    for _ in range(levels):
        h = size // 2
        block = out[:size, :size]
        ll = block[:h, :h]
        lh = block[:h, h:]
        hl = block[h:, :h]
        hh = block[h:, h:]
        lo_r = _ihaar_1d(ll, lh, 1)
        hi_r = _ihaar_1d(hl, hh, 1)
        rec = _ihaar_1d(lo_r, hi_r, 0)
        out = out.at[:size, :size].set(rec)
        size *= 2
    return out


def gaussian_kernel(size: int = 9, sigma: float = 4.0) -> np.ndarray:
    """Normalized 2-D Gaussian blur kernel (reference nb cell 4)."""
    ax = np.arange(size) - (size - 1) / 2
    g = np.exp(-(ax**2) / (2 * sigma**2))
    k = np.outer(g, g)
    return (k / k.sum()).astype(np.float64)


def _band_matrix(taps: np.ndarray, n: int) -> np.ndarray:
    """SAME-zero-padded 1-D convolution as a banded ``(n, n)`` matrix:
    ``(Bx)_i = sum_d taps[d+c] x_{i+d}`` with out-of-range terms dropped
    (== the conv's zero padding).  Only odd-length ``taps`` (the separable
    dispatch guarantees this); diagonals beyond the matrix (images smaller
    than the kernel half-width) are simply absent, matching the conv."""
    c = (len(taps) - 1) // 2
    B = np.zeros((n, n))
    for d in range(-c, c + 1):
        if abs(d) < n:
            B += np.diag(np.full(n - abs(d), taps[d + c]), k=d)
    return B


def _separable_taps(k_np: np.ndarray) -> np.ndarray | None:
    """1-D taps such that ``K == taps tapsᵀ``, or None.

    The reconstruction check is the ground truth — it rejects even-length
    kernels (whose SAME offsets the odd-centered band matrix cannot
    express), negative-definite rank-1 kernels ``K = -a aᵀ`` (whose sign
    would silently cancel in ``G X Gᵀ``), and anything numerically
    non-separable; all of those use the conv path instead.
    """
    if k_np.ndim != 2 or k_np.shape[0] != k_np.shape[1]:
        return None
    if k_np.shape[0] % 2 == 0:
        return None
    u_, s_, _ = np.linalg.svd(k_np)
    taps = u_[:, 0] * np.sqrt(s_[0])
    if not np.allclose(k_np, np.outer(taps, taps), atol=1e-12):
        return None
    return taps


def make_blur(kernel: np.ndarray, adjoint: bool = False):
    """SAME-padded 2-D convolution ``image -> blurred image``.

    Separable symmetric kernels (the Gaussian: ``K = a aᵀ``) dispatch to
    ``G @ X @ Gᵀ`` with banded SAME matrices — two MXU matmuls instead of
    a single-channel ``lax.conv``, which XLA lowers catastrophically on
    TPU for 1-channel NCHW (measured 7.2 ms vs 0.16 ms per application at
    256², 45x; boundary semantics identical to the conv's zero padding,
    max diff 2e-7 f32).  Non-separable kernels fall back to the conv.

    ``adjoint=True`` returns the TRUE adjoint operator ``blur*``
    (``Gᵀ @ X @ G`` on the matmul path; convolution with the doubly
    flipped kernel on the conv path) — what ``jac_f`` in the deblurring
    models needs.  For centro-symmetric kernels (the Gaussian) the
    adjoint equals the forward operator bitwise; for anything else
    (motion blur, non-palindromic rank-1 taps) the two genuinely differ,
    and using the forward blur in the gradient would silently converge
    to the wrong image.
    """
    k_np = np.asarray(kernel, np.float64)
    taps = _separable_taps(k_np)
    if taps is not None:
        bands: dict = {}

        def band(n: int, dtype) -> Array:
            # Cache the HOST matrix only: a jnp constant created under one
            # trace (e.g. inside jax.eval_shape) is a tracer there, and
            # storing it would leak it into later traces.
            B = bands.get(n)
            if B is None:
                B = bands[n] = _band_matrix(taps, n)
            return jnp.asarray(B, dtype)

        def blur(img: Array) -> Array:
            Gr = band(img.shape[-2], img.dtype)
            Gc = band(img.shape[-1], img.dtype)
            p = lax.Precision.HIGHEST  # bf16 products floor convergence
            if adjoint:  # <Gr X Gcᵀ, Y> = <X, Grᵀ Y Gc>
                return jnp.matmul(
                    jnp.matmul(Gr.T, img, precision=p), Gc, precision=p
                )
            return jnp.matmul(
                jnp.matmul(Gr, img, precision=p), Gc.T, precision=p
            )

        return blur

    k = jnp.asarray(k_np[::-1, ::-1] if adjoint else k_np)
    # XLA SAME pads (lo, hi) = ((k-1)//2, k//2) per dim.  The adjoint of a
    # zero-padded correlation is correlation with the flipped kernel under
    # SWAPPED padding — for odd kernels lo == hi and plain SAME is the
    # adjoint, but for even kernels the asymmetric pad must flip too or
    # the operator is off by one pixel (inner-product test pins this).
    kh, kw = k_np.shape
    if adjoint:
        pad = ((kh // 2, (kh - 1) // 2), (kw // 2, (kw - 1) // 2))
    else:
        pad = (((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2))

    def blur_conv(img: Array) -> Array:
        x = img[None, None, :, :]
        w = k[None, None, :, :].astype(img.dtype)
        out = lax.conv_general_dilated(
            x,
            w,
            window_strides=(1, 1),
            padding=pad,
            precision=lax.Precision.HIGHEST,  # bf16 conv floors convergence
        )
        return out[0, 0]

    return blur_conv


def blur_lipschitz(kernel: np.ndarray, shape: tuple[int, int]) -> float:
    """``L = 2·max|F(kernel)|²`` — spectral bound on ``2‖A‖²`` for
    ``f = ‖Ax−b‖²`` (DWT orthonormal, blur symmetric; the circular-padding
    symbol upper-bounds the SAME-padded operator norm)."""
    sym = np.fft.fft2(kernel, s=shape)
    return float(2 * np.max(np.abs(sym)) ** 2)


class WaveletDeblur:
    """Composite problem ``F(x) = ‖blur(IDWT(x)) − b‖² + λ‖x‖₁``.

    The solver core works on flat vectors; ``x`` is the flattened wavelet
    coefficient array, reshaped to the image grid inside ``f``/``jac_f``.
    """

    def __init__(
        self,
        observed: Array,
        l1_ratio: float = 2e-5,
        kernel: np.ndarray | None = None,
        levels: int | None = None,
    ) -> None:
        self.b = jnp.asarray(observed)
        if self.b.ndim != 2:
            raise ValueError("observed must be a 2-D image")
        size = self.b.shape[0]
        if self.b.shape[0] != self.b.shape[1] or size & (size - 1):
            raise ValueError("image must be square with power-of-two side")
        self.kernel = gaussian_kernel() if kernel is None else kernel
        self.levels = int(math.log2(size)) if levels is None else int(levels)
        if not 1 <= self.levels <= int(math.log2(size)):
            raise ValueError(
                f"levels must be in [1, log2(size)]; got {self.levels}"
            )
        self.l1_ratio = float(l1_ratio)
        self._blur = make_blur(self.kernel)
        self._blur_T = make_blur(self.kernel, adjoint=True)
        self.n_objectives = 1
        self.n_features = size * size

    def _coeffs(self, x: Array) -> Array:
        return jnp.reshape(x, self.b.shape)

    def f(self, x: Array) -> Array:
        r = self._blur(idwt2(self._coeffs(x), self.levels)) - self.b
        return jnp.reshape(jnp.sum(r * r), (1,))

    def jac_f(self, x: Array) -> Array:
        # grad = 2 * A* r with A = blur ∘ IDWT: the blur's TRUE adjoint
        # (equal to the forward blur only for centro-symmetric kernels)
        # and DWT = IDWT* (orthonormal).
        r = self._blur(idwt2(self._coeffs(x), self.levels)) - self.b
        return 2 * jnp.reshape(dwt2(self._blur_T(r), self.levels), (1, -1))

    def g(self, x: Array) -> Array:
        return jnp.reshape(self.l1_ratio * jnp.sum(jnp.abs(x)), (1,))

    def prox_wsum_g(self, weight, x: Array) -> Array:
        return soft_threshold(x, jnp.asarray(weight) * self.l1_ratio)

    def lipschitz(self) -> float:
        return blur_lipschitz(self.kernel, self.b.shape)

    def x0(self) -> Array:
        """Reference warm start: DWT of the observed image (nb cell 8)."""
        return jnp.reshape(dwt2(self.b, self.levels), (-1,))

    def solve(self, **kwargs):
        """Fixed-step accelerated solve at lr = 1/L (reference settings:
        decay_rate=1, nesterov=True; cameraman.ipynb cell 11)."""
        if "lr" not in kwargs:  # avoid the eager FFT when lr is given
            kwargs["lr"] = 1.0 / self.lipschitz()
        kwargs.setdefault("decay_rate", 1)
        kwargs.setdefault("nesterov", True)
        # pop-with-default would EVALUATE the eager DWT pyramid even when
        # the caller supplies x0 (Python evaluates the default first)
        x0 = kwargs.pop("x0") if "x0" in kwargs else self.x0()
        return minimize_proximal_gradient(
            self.f, self.g, self.jac_f, self.prox_wsum_g, x0, **kwargs
        )


class TVDeblur:
    """Composite problem ``F(X) = ‖blur(X) − b‖² + λ·TV(X)`` on the image
    domain — the TV-regularized formulation of the deblurring workload
    (BASELINE configs[1]; the reference notebook solves the wavelet-L1
    surrogate instead because its scipy solver has no TV prox,
    examples/cameraman.ipynb cells 2-11).

    ``x`` is the flattened image; the TV prox is the fixed-budget FGP of
    :func:`zfista_tpu.ops.tv.prox_tv` (``prox_iter`` dual iterations per
    outer prox call), nested inside the compiled solver step.  The prox is
    therefore INEXACT — with the workload's fixed step ``lr = 1/L``
    (``decay_rate=1``, no accept test) the inexactness acts as a small
    perturbation; ``prox_iter=30`` holds the per-call duality gap below
    ~1e-4 of the objective scale on 256² images (tests assert the
    certificate).
    """

    def __init__(
        self,
        observed: Array,
        tv_ratio: float = 2e-4,
        kernel: np.ndarray | None = None,
        prox_iter: int = 30,
        isotropic: bool = True,
        prox_method: str = "auto",
    ) -> None:
        self.b = jnp.asarray(observed)
        if self.b.ndim != 2:
            raise ValueError("observed must be a 2-D image")
        self.kernel = gaussian_kernel() if kernel is None else kernel
        self.tv_ratio = float(tv_ratio)
        self.prox_iter = int(prox_iter)
        self.isotropic = bool(isotropic)
        # "auto" (default) = the FGP dual loop as a VMEM-resident Pallas
        # kernel per prox call on TPU (ops/tv_pallas; measured 1.06-1.21x
        # XLA, BENCHMARKS.md "TV prox kernel on device"), XLA above the
        # VMEM budget and on non-TPU backends; "xla" forces the XLA loop
        # everywhere; "pallas_interpret" forces the interpreted kernel
        # anywhere — the CPU test path, never for real work.
        self.prox_method = str(prox_method)
        self._blur = make_blur(self.kernel)
        self._blur_T = make_blur(self.kernel, adjoint=True)
        self.n_objectives = 1
        self.n_features = int(self.b.shape[0] * self.b.shape[1])

    def _image(self, x: Array) -> Array:
        return jnp.reshape(x, self.b.shape)

    def f(self, x: Array) -> Array:
        r = self._blur(self._image(x)) - self.b
        return jnp.reshape(jnp.sum(r * r), (1,))

    def jac_f(self, x: Array) -> Array:
        r = self._blur(self._image(x)) - self.b
        return 2 * jnp.reshape(self._blur_T(r), (1, -1))

    def g(self, x: Array) -> Array:
        val = tv2d(self._image(x), self.isotropic)
        return jnp.reshape(self.tv_ratio * val, (1,))

    def prox_wsum_g(self, weight, x: Array) -> Array:
        u = prox_tv(
            jnp.asarray(weight) * self.tv_ratio,
            self._image(x),
            n_iter=self.prox_iter,
            isotropic=self.isotropic,
            method=self.prox_method,
        )
        return jnp.reshape(u, (-1,))

    def lipschitz(self) -> float:
        return blur_lipschitz(self.kernel, self.b.shape)

    def x0(self) -> Array:
        """Warm start at the observed image itself."""
        return jnp.reshape(self.b, (-1,))

    def checkpoint_meta(self) -> dict[str, str]:
        """Configuration pins for ``save_state(..., meta=...)``.

        The solver ``State`` alone cannot express which TV-prox kernel
        produced it, and ``prox_method="auto"`` resolves differently per
        backend/shape (Pallas vs XLA are same-math but NOT bitwise).  A
        resume that wants bitwise continuation must reconstruct TVDeblur
        with a ``prox_method`` that resolves to the recorded
        ``prox_kernel`` — compare against
        ``utils.checkpoint.load_meta(path)``.
        """
        from zfista_tpu.ops import tv_pallas

        method = "pallas" if self.prox_method == "auto" else self.prox_method
        if method == "pallas_interpret":
            resolved = "pallas_interpret"
        elif method == "pallas" and jax.default_backend() == "tpu":
            if tv_pallas.fits_vmem(self.b.shape, self.b.dtype):
                resolved = "pallas"
            elif tv_pallas.strip_rows(self.b.shape, self.b.dtype) is not None:
                resolved = "pallas_strips"
            else:
                resolved = "xla"
        else:
            resolved = "xla"
        return {
            "problem": "TVDeblur",
            "prox_method": self.prox_method,
            "prox_kernel": resolved,
            "backend": jax.default_backend(),
            "prox_iter": str(self.prox_iter),
            "isotropic": str(self.isotropic),
            "tv_ratio": repr(self.tv_ratio),
        }

    def _bands(self):
        """Device-resident banded blur matrices ``(Gr, Gc)``, built once
        per instance (the SVD + O(n²) host construction + transfer are
        RTT-priced on remote backends), or None for non-separable
        kernels.  Shared by :meth:`solve` (via ``_params``) and
        :meth:`solve_warm`."""
        bands = getattr(self, "_bands_cache", False)
        if bands is False:
            taps = _separable_taps(np.asarray(self.kernel, np.float64))
            if taps is None:
                bands = None
            else:
                dt = self.b.dtype
                bands = (
                    jnp.asarray(_band_matrix(taps, self.b.shape[0]), dt),
                    jnp.asarray(_band_matrix(taps, self.b.shape[1]), dt),
                )
            self._bands_cache = bands
        return bands

    def solve(self, **kwargs):
        """Fixed-step accelerated solve at ``lr = 1/L`` (same driver
        settings as the wavelet workload: decay_rate=1, nesterov=True).

        Runs through module-level params-style callables (stable
        identities for the solver's compiled-driver cache): the observed
        image and the blur operand stream into the compiled program as
        arguments, so solving a NEW observation of the same shape reuses
        the compiled program instead of recompiling with the operands
        baked in as constants.

        .. warning:: The instance is FROZEN after the first call (the
           params tuple is cached); build a new instance per observation
           — the compiled program is shared across instances of one
           shape, so this is cheap.
        """
        if "lr" not in kwargs:
            kwargs["lr"] = 1.0 / self.lipschitz()
        kwargs.setdefault("decay_rate", 1)
        kwargs.setdefault("nesterov", True)
        x0 = kwargs.pop("x0") if "x0" in kwargs else self.x0()
        p = getattr(self, "_params", None)
        if p is None:
            dt = self.b.dtype
            lam = jnp.asarray(self.tv_ratio, dt)
            bands = self._bands()
            if bands is not None:
                p = (self.b, *bands, lam)
            else:
                p = (self.b, jnp.asarray(self.kernel, dt), lam)
            self._params = p
        fns = _tv_deblur_callables(
            self.prox_iter,
            self.isotropic,
            separable=len(p) == 4,
            prox_method=self.prox_method,
        )
        return minimize_proximal_gradient(*fns, x0, params=p, **kwargs)

    def solve_warm(
        self,
        max_iter: int = 500,
        tol: float = 1e-5,
        prox_iter: int = 8,
    ) -> dict:
        """Warm-dual fast path: the whole FISTA solve as ONE XLA program
        with the TV prox's FGP dual carried ACROSS outer iterations
        (:func:`_tv_warm_driver`).  Consecutive proxes see nearly
        identical inputs, so warm duals reach cold-start quality at a
        fraction of the inner budget — ``prox_iter=8`` here matches
        ``prox_iter=30`` through :meth:`solve` on PSNR/objective
        (asserted in tests, measured in BENCHMARKS.md).  The accelerated
        trajectory differs slightly from :meth:`solve` (different prox
        inexactness pattern); use :meth:`solve` when exact comparability
        with the general solver path matters.  Separable symmetric
        kernels only.  Returns ``{x, fun, nit, error_criterion, time}``.
        """
        bands = self._bands()
        if bands is None:
            raise ValueError(
                "solve_warm requires a separable symmetric odd-size kernel"
            )
        start = _time.perf_counter()
        dt = self.b.dtype
        Gr, Gc = bands
        X, F, nit, err, _ = _tv_warm_driver(
            self.b,
            Gr,
            Gc,
            jnp.asarray(self.tv_ratio, dt),
            jnp.asarray(1.0 / self.lipschitz(), dt),
            jnp.asarray(tol, dt),
            int(max_iter),
            int(prox_iter),
            self.isotropic,
            self.prox_method,
        )
        X, F, nit, err = jax.device_get((X, F, nit, err))
        return {
            "x": np.asarray(X).reshape(-1),
            "fun": float(F),
            "nit": int(nit),
            "error_criterion": float(err),
            "time": _time.perf_counter() - start,
        }


@partial(
    jax.jit,
    static_argnames=("max_iter", "prox_iter", "isotropic", "prox_method"),
)
def _tv_warm_driver(
    b: Array,
    Gr: Array,
    Gc: Array,
    lam: Array,
    lr: Array,
    tol: Array,
    max_iter: int,
    prox_iter: int,
    isotropic: bool,
    prox_method: str = "auto",
):
    """Whole warm-dual TV-deblur solve as one XLA program.

    Fixed-step FISTA ``(a,b)=(0,0.25)`` on ``||blur(X)-b||² + lam·TV(X)``
    where each prox call's FGP dual field is WARM-STARTED from the
    previous outer iteration's (consecutive proxes see nearly identical
    inputs, so the optimal duals barely move): ``prox_iter`` can drop
    from the cold-start 30 to ~5-8 at equal restoration quality —
    measured in BENCHMARKS.md "TV-regularized deblurring".  Separable
    (banded-matmul) blur only.  Returns ``(X, F, nit, err, dual)``.
    """
    pr = lax.Precision.HIGHEST

    def blur(X: Array) -> Array:
        return jnp.matmul(jnp.matmul(Gr, X, precision=pr), Gc.T, precision=pr)

    def blur_T(Y: Array) -> Array:
        # true adjoint (bitwise equal to blur for symmetric bands)
        return jnp.matmul(jnp.matmul(Gr.T, Y, precision=pr), Gc, precision=pr)

    def grad_f(X: Array) -> Array:
        return 2.0 * blur_T(blur(X) - b)

    z = jnp.zeros_like(b)
    one = jnp.asarray(1.0, b.dtype)
    carry0 = (b, b, one, z, z, jnp.asarray(0, jnp.int32), jnp.asarray(jnp.inf, b.dtype))

    def cond(c):
        return (c[6] >= tol) & (c[5] < max_iter)

    def body(c):
        X, X_old, t, pd, qd, k, _ = c
        y = X  # carry convention: X is the extrapolated point (see below)
        step_in = y - lr * grad_f(y)
        x_new, (pd_n, qd_n) = prox_tv(
            lr * lam,
            step_in,
            n_iter=prox_iter,
            isotropic=isotropic,
            return_dual=True,
            dual0=(pd, qd),
            method=prox_method,
        )
        err = jnp.max(jnp.abs(x_new - y))
        t_new = jnp.sqrt(t * t + 0.25) + 0.5
        y_new = x_new + ((t - 1.0) / t_new) * (x_new - X_old)
        return (y_new, x_new, t_new, pd_n, qd_n, k + 1, err)

    y_f, x_f, _, pd_f, qd_f, nit, err = lax.while_loop(cond, body, carry0)
    r = blur(x_f) - b
    F = jnp.sum(r * r) + lam * tv2d(x_f, isotropic)
    return x_f, F, nit, err, (pd_f, qd_f)


#: Params-style callables for TVDeblur.solve, cached per static config so
#: repeat solves (and different instances with the same config) hit ONE
#: compiled program.  Params layout: (b, Gr, Gc, lam) separable, else
#: (b, K, lam).  Both blur forms are self-adjoint (symmetric band
#: matrices / symmetric kernel), which the Jacobian relies on.
_TV_CALLABLES: dict = {}


def _tv_deblur_callables(
    prox_iter: int, isotropic: bool, separable: bool, prox_method: str = "auto"
):
    key = (int(prox_iter), bool(isotropic), bool(separable), str(prox_method))
    fns = _TV_CALLABLES.get(key)
    if fns is not None:
        return fns
    pr = lax.Precision.HIGHEST

    if separable:

        def blur_p(X: Array, p) -> Array:
            _, Gr, Gc, _ = p
            Grc = Gr.astype(X.dtype)
            Gcc = Gc.astype(X.dtype)
            return jnp.matmul(
                jnp.matmul(Grc, X, precision=pr), Gcc.T, precision=pr
            )

        def blur_T_p(Y: Array, p) -> Array:
            # true adjoint: <Gr X Gcᵀ, Y> = <X, Grᵀ Y Gc>; equals blur_p
            # bitwise for centro-symmetric kernels (symmetric bands)
            _, Gr, Gc, _ = p
            Grc = Gr.astype(Y.dtype)
            Gcc = Gc.astype(Y.dtype)
            return jnp.matmul(
                jnp.matmul(Grc.T, Y, precision=pr), Gcc, precision=pr
            )

    else:

        def blur_p(X: Array, p) -> Array:
            K = p[1]
            x4 = X[None, None, :, :]
            w = K[None, None, :, :].astype(X.dtype)
            return lax.conv_general_dilated(
                x4, w, (1, 1), "SAME", precision=pr
            )[0, 0]

        def blur_T_p(Y: Array, p) -> Array:
            # true adjoint of the SAME zero-padded correlation: correlate
            # with the doubly flipped kernel under SWAPPED padding (XLA
            # SAME pads ((k-1)//2, k//2); for even kernels the asymmetry
            # must flip with the kernel or the adjoint is off by a pixel)
            K = p[1][::-1, ::-1]
            kh, kw = K.shape
            pad = ((kh // 2, (kh - 1) // 2), (kw // 2, (kw - 1) // 2))
            x4 = Y[None, None, :, :]
            w = K[None, None, :, :].astype(Y.dtype)
            return lax.conv_general_dilated(
                x4, w, (1, 1), pad, precision=pr
            )[0, 0]

    def f_p(x, p):
        b = p[0]
        r = blur_p(jnp.reshape(x, b.shape), p) - b
        return jnp.reshape(jnp.sum(r * r), (1,))

    def jac_p(x, p):
        b = p[0]
        r = blur_p(jnp.reshape(x, b.shape), p) - b
        return 2 * jnp.reshape(blur_T_p(r, p), (1, -1))

    def g_p(x, p):
        b, lam = p[0], p[-1]
        val = tv2d(jnp.reshape(x, b.shape), isotropic)
        return jnp.reshape(lam * val, (1,))

    def prox_p(w, x, p):
        b, lam = p[0], p[-1]
        w = w[0] if getattr(w, "ndim", 0) else w
        u = prox_tv(
            w * lam,
            jnp.reshape(x, b.shape),
            n_iter=prox_iter,
            isotropic=isotropic,
            method=prox_method,
        )
        return jnp.reshape(u, (-1,))

    fns = _TV_CALLABLES[key] = (f_p, g_p, jac_p, prox_p)
    return fns


@partial(jax.jit, static_argnames=("size",))
def synthetic_cameraman(size: int = 256) -> Array:
    """Deterministic synthetic test image (the true cameraman photo is not
    redistributable here; scipy.datasets needs network).  Piecewise-constant
    regions + gradients + a few edges: the structure wavelet-L1 deblurring
    exercises."""
    i = jnp.arange(size)[:, None] / size
    j = jnp.arange(size)[None, :] / size
    img = 0.3 + 0.4 * (i > 0.5) + 0.2 * (j > 0.3)
    img = img + 0.15 * jnp.sin(6.28 * 3 * i) * (j < 0.6)
    disk = ((i - 0.35) ** 2 + (j - 0.65) ** 2) < 0.04
    img = jnp.where(disk, 0.9, img)
    tri = (i + j > 1.3) & (i + j < 1.5)
    img = jnp.where(tri, 0.1, img)
    return img.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
