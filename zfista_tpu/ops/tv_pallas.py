r"""Pallas TPU kernel for the FGP TV-prox dual iteration.

Motivation (SURVEY §7 step 5, round-2 verdict item 3): the FGP dual loop
(:func:`zfista_tpu.ops.tv.prox_tv`) runs ``n_iter`` iterations of a
multi-op stencil — gradient, divergence, projection, momentum — over four
``(H, W)`` dual/extrapolation fields.  Under ``lax.fori_loop`` XLA fuses
*within* one iteration but materializes the carry to HBM *between*
iterations: ~6 full-array HBM round trips per dual step.  This kernel runs
the whole loop with every field VMEM-resident — HBM is touched exactly
once on entry (``v``, warm-start dual) and once on exit (``u``, final
dual), independent of ``n_iter``.

Capacity: all-VMEM residency needs roughly ``10 * H * W * 4`` bytes of
VMEM (carry fields + stencil temporaries), so the kernel accepts images up
to ~512x512 float32 per core; callers fall back to the XLA loop above
that (:func:`fits_vmem`).

Numerics: identical formulas to the XLA path (same step, same projection,
same momentum recursion).  Bitwise identity is NOT guaranteed — Mosaic
schedules FMA contractions differently — but parity is asserted to ~1e-6
relative plus an identical dual-gap certificate (tests/test_tv.py).

Stencils use ``pltpu.roll`` + an iota mask instead of concatenation:
roll is a lane/sublane rotate the VPU does natively, while concatenating a
zero row/column builds a misaligned tile every iteration.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zfista_tpu._typing import Array

#: VMEM budget for the all-resident kernel: carry (p, q, r, s) + v + the
#: in-flight stencil temporaries — ~10 live (H, W) buffers, kept under a
#: 12 MiB cap (of ~16 MiB/core) to leave headroom for Mosaic's own
#: scheduling copies.
_VMEM_CAP_BYTES = 12 * 1024 * 1024
_LIVE_BUFFERS = 10

#: Dual iterations fused per strip sweep in the past-VMEM kernel.  The FGP
#: body's row-dependency radius is exactly 1 (div reaches one row up, grad
#: one row down, and the momentum combination adds nothing), so a strip
#: computing k iterations needs a k-row halo — HBM traffic per dual
#: iteration drops ~k x vs the XLA ``fori_loop``, paid for with
#: ``2k/S`` redundant halo compute.  Multiple of 8 keeps every DMA row
#: offset aligned to the f32 sublane tile.
_STRIP_K = 8
#: Live (S + 2k, W) tiles during a strip sweep: v + 4 carry fields +
#: ~4 stencil temporaries + the 4 input staging tiles Mosaic may not
#: overlap with the carry.
_STRIP_LIVE_BUFFERS = 13
#: Live tiles for the double-buffered sweep: 2 x 5 input slots (current +
#: prefetch; results are written back into the current slot, no separate
#: staging) + ~4 stencil temporaries.
_STRIP_LIVE_BUFFERS_PIPE = 14


def fits_vmem(shape: tuple[int, ...], dtype) -> bool:
    """True if the all-VMEM-resident FGP kernel fits for this image."""
    n = 1
    for d in shape:
        n *= int(d)
    return _LIVE_BUFFERS * n * jnp.dtype(dtype).itemsize <= _VMEM_CAP_BYTES


def strip_rows(
    shape: tuple[int, ...], dtype, pipelined: bool = False
) -> int | None:
    """Strip height ``S`` for the past-VMEM sweep kernel, or ``None`` when
    no admissible blocking exists (then callers use the XLA loop).

    Constraints: ``S`` divides ``H`` (identical static tiles per grid
    step), the image is taller than one haloed tile, and
    ``_STRIP_LIVE_BUFFERS`` tiles of ``(S + 2k, W)`` fit the VMEM cap
    (``_STRIP_LIVE_BUFFERS_PIPE`` for the double-buffered variant, whose
    prefetch slots cost 5 extra tiles).  Larger ``S`` is preferred — halo
    redundancy is ``2k/S``.
    """
    H, W = (int(d) for d in shape)
    item = jnp.dtype(dtype).itemsize
    live = _STRIP_LIVE_BUFFERS_PIPE if pipelined else _STRIP_LIVE_BUFFERS
    for S in (512, 256, 128, 64, 32):
        if H % S or H < S + 2 * _STRIP_K or S < _STRIP_K:
            continue
        tile = (S + 2 * _STRIP_K) * W * item
        if live * tile <= _VMEM_CAP_BYTES:
            return S
    return None


def _fgp_step_fns(v, lam, rows, cols, n_rows: int, n_cols: int, isotropic: bool):
    """Shared stencil closures for the all-VMEM and strip kernels.

    ``rows``/``cols`` carry GLOBAL image indices (for the strip kernel the
    tile is a window into the image, so boundary masks must compare against
    the full-image extent ``n_rows`` x ``n_cols``, not the tile shape);
    ``pltpu.roll`` rotates within the TILE, which is exactly right — the
    wrapped rows land either in discarded halo or under a boundary mask.
    Returns ``(div2d, body)``; ``body`` is a ``fori_loop`` step over the
    carry ``(p, q, r, s, t)``.
    """
    H, W = v.shape
    dt = v.dtype
    zero = jnp.zeros((), dt)
    safe = jnp.maximum(lam, jnp.asarray(jnp.finfo(dt).tiny, dt))
    step = 1.0 / (8.0 * safe)

    def grad2d(u):
        # forward differences, last row/column structurally zero
        # (ops/tv.py _grad2d semantics); pltpu.roll requires a
        # non-negative shift, so roll by size-1 instead of -1
        px = jnp.where(rows < n_rows - 1, pltpu.roll(u, H - 1, 0) - u, zero)
        py = jnp.where(cols < n_cols - 1, pltpu.roll(u, W - 1, 1) - u, zero)
        return px, py

    def div2d(p, q):
        # negative adjoint of grad2d on the padded representation
        # (ops/tv.py _div2d semantics)
        dx = p - jnp.where(rows > 0, pltpu.roll(p, 1, 0), zero)
        dy = q - jnp.where(cols > 0, pltpu.roll(q, 1, 1), zero)
        return dx + dy

    def project(p, q):
        if isotropic:
            denom = jnp.maximum(1.0, jnp.sqrt(p * p + q * q))
            return p / denom, q / denom
        return jnp.clip(p, -1.0, 1.0), jnp.clip(q, -1.0, 1.0)

    def body(_, carry):
        p, q, r, s, t = carry
        gx, gy = grad2d(v - lam * div2d(r, s))
        p_new, q_new = project(r - step * gx, s - step * gy)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        gamma = (t - 1.0) / t_new
        r_new = p_new + gamma * (p_new - p)
        s_new = q_new + gamma * (q_new - q)
        return p_new, q_new, r_new, s_new, t_new

    return div2d, body


def _fgp_kernel(lam_ref, v_ref, p0_ref, q0_ref, u_ref, p_ref, q_ref, *, n_iter: int, isotropic: bool):
    v = v_ref[:]
    H, W = v.shape
    lam = lam_ref[0, 0]
    rows = lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = lax.broadcasted_iota(jnp.int32, (H, W), 1)
    div2d, body = _fgp_step_fns(v, lam, rows, cols, H, W, isotropic)

    p0 = p0_ref[:]
    q0 = q0_ref[:]
    one = jnp.asarray(1.0, v.dtype)
    p, q, _, _, _ = lax.fori_loop(0, n_iter, body, (p0, q0, p0, q0, one))
    u_ref[:] = v - lam * div2d(p, q)
    p_ref[:] = p
    q_ref[:] = q


@partial(jax.jit, static_argnames=("n_iter", "isotropic", "interpret"))
def fgp_pallas(
    lam: Array,
    v: Array,
    p0: Array,
    q0: Array,
    n_iter: int = 50,
    isotropic: bool = True,
    interpret: bool = False,
) -> tuple[Array, Array, Array]:
    """Run ``n_iter`` FGP dual iterations VMEM-resident; returns
    ``(u, p, q)`` — the denoised image and the final feasible dual.

    Same contract as the XLA loop in :func:`zfista_tpu.ops.tv.prox_tv`
    (``lam`` may be a traced scalar; callers handle ``lam <= 0``).
    ``interpret=True`` runs the kernel in the Pallas interpreter —
    the CPU-test path.
    """
    lam_arr = jnp.reshape(jnp.asarray(lam, v.dtype), (1, 1))
    out_shape = tuple(
        jax.ShapeDtypeStruct(v.shape, v.dtype) for _ in range(3)
    )
    kernel = partial(_fgp_kernel, n_iter=int(n_iter), isotropic=bool(isotropic))
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(3)
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_CAP_BYTES + 2 * 1024 * 1024,
        ),
        interpret=interpret,
    )(lam_arr, v, p0, q0)


def _fgp_strip_kernel(
    lam_ref,
    t0_ref,
    v_hbm,
    p_hbm,
    q_hbm,
    r_hbm,
    s_hbm,
    po_hbm,
    qo_hbm,
    ro_hbm,
    so_hbm,
    *,
    n_iter: int,
    isotropic: bool,
    S: int,
    halo: int,
    H: int,
    W: int,
):
    """One grid step = one row strip advanced ``n_iter`` dual iterations.

    Temporal blocking: the strip's VMEM tile carries ``halo >= n_iter``
    extra rows on each side, so after ``n_iter`` Jacobi-style iterations
    the interior ``S`` rows are EXACTLY the values the whole-image
    iteration would produce (the body's dependency cone grows one row per
    iteration); the contaminated halo rows are discarded.  All strips read
    the sweep-start fields and write DISTINCT output buffers — the output
    must not alias the input, or a later strip's halo would see an earlier
    strip's already-written rows (Gauss-Seidel contamination).
    """
    i = pl.program_id(0)
    T = S + 2 * halo
    # Haloed window clamped inside the image: at the top/bottom edge the
    # window slides inward instead of shrinking, keeping one static tile
    # shape; `off` locates the strip's interior within the tile.
    # S and halo are multiples of the f32 sublane tile (8), and so are the
    # clip bounds (strip_rows guarantees 8 | H - T); Mosaic's divisibility
    # analysis cannot see through clip/program_id arithmetic, so assert it.
    start = pl.multiple_of(jnp.clip(i * S - halo, 0, H - T), 8)
    off = pl.multiple_of(i * S - start, 8)

    def inner(vt, pt, qt, rt, st, in_sems, out_sems):
        copies = [
            pltpu.make_async_copy(src.at[pl.ds(start, T)], dst, in_sems.at[j])
            for j, (src, dst) in enumerate(
                [(v_hbm, vt), (p_hbm, pt), (q_hbm, qt), (r_hbm, rt), (s_hbm, st)]
            )
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

        v = vt[:]
        lam = lam_ref[0, 0]
        t0 = t0_ref[0, 0]
        rows = start + lax.broadcasted_iota(jnp.int32, (T, W), 0)
        cols = lax.broadcasted_iota(jnp.int32, (T, W), 1)
        _, body = _fgp_step_fns(v, lam, rows, cols, H, W, isotropic)
        p, q, r, s, _ = lax.fori_loop(
            0, n_iter, body, (pt[:], qt[:], rt[:], st[:], t0)
        )

        # Stage the final fields back into the (now dead) input tiles and
        # DMA only the interior rows out.
        pt[:], qt[:], rt[:], st[:] = p, q, r, s
        outs = [
            pltpu.make_async_copy(
                src.at[pl.ds(off, S)],
                dst.at[pl.ds(i * S, S)],
                out_sems.at[j],
            )
            for j, (src, dst) in enumerate(
                [(pt, po_hbm), (qt, qo_hbm), (rt, ro_hbm), (st, so_hbm)]
            )
        ]
        for c in outs:
            c.start()
        for c in outs:
            c.wait()

    pl.run_scoped(
        inner,
        *(
            pltpu.VMEM((S + 2 * halo, W), v_hbm.dtype)
            for _ in range(5)
        ),
        pltpu.SemaphoreType.DMA((5,)),
        pltpu.SemaphoreType.DMA((4,)),
    )


def _fgp_strip_kernel_pipelined(
    lam_ref,
    t0_ref,
    v_hbm,
    p_hbm,
    q_hbm,
    r_hbm,
    s_hbm,
    po_hbm,
    qo_hbm,
    ro_hbm,
    so_hbm,
    vt,
    pt,
    qt,
    rt,
    st,
    in_sems,
    out_sems,
    *,
    n_iter: int,
    isotropic: bool,
    S: int,
    halo: int,
    H: int,
    W: int,
):
    """Double-buffered strip sweep: same math as :func:`_fgp_strip_kernel`,
    with the next strip's haloed window prefetched during this strip's
    compute and the previous strip's output DMA drained during it too.

    TPU grid steps run sequentially on one core and ``pallas_call``
    ``scratch_shapes`` buffers persist across them (``run_scoped`` scratch
    does NOT — it re-allocates per grid step, measured: strips 1+ read
    garbage), so step ``i`` can start the DMA for strip ``i+1`` into the
    alternate input slot (the canonical double-buffer pattern) — the
    serial kernel instead sits idle on both transfers.  Results go back
    into the current slot's tiles and the output DMA from them is drained
    at the top of the NEXT step, just before the prefetch that would
    overwrite that slot — per-strip output copies are microseconds, so
    what matters is never stalling compute on them.  Every DMA start is
    waited exactly once: input for strip ``j`` (started at step ``j-1``,
    or step 0 for ``j=0``) is waited at step ``j``; output for step
    ``i <= n-2`` at step ``i+1``; the final step drains its own.
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)
    T = S + 2 * halo

    def start_of(j):
        # Haloed window clamped inside the image (see _fgp_strip_kernel):
        # edge windows slide inward, all tiles share one static shape.
        return pl.multiple_of(jnp.clip(j * S - halo, 0, H - T), 8)

    ins = (v_hbm, p_hbm, q_hbm, r_hbm, s_hbm)
    tiles = (vt, pt, qt, rt, st)

    def in_copies(j, slot):
        row = start_of(j)
        return [
            pltpu.make_async_copy(
                src.at[pl.ds(row, T)], dst.at[slot], in_sems.at[slot, k]
            )
            for k, (src, dst) in enumerate(zip(ins, tiles))
        ]

    two = jnp.asarray(2, i.dtype)  # x64 mode must not promote the literal
    slot = lax.rem(i, two)
    nslot = lax.rem(i + 1, two)

    outs = (po_hbm, qo_hbm, ro_hbm, so_hbm)

    def out_copies(j, oslot):
        # Results live in the input slot's p/q/r/s tiles (no separate
        # staging — it would cost 4 more live tiles, measured 208 KB past
        # the 2048^2 scoped-vmem limit); the copy reads the interior rows.
        off = pl.multiple_of(j * S - start_of(j), 8)
        return [
            pltpu.make_async_copy(
                src.at[oslot, pl.ds(off, S)],
                dst.at[pl.ds(j * S, S)],
                out_sems.at[k],
            )
            for k, (src, dst) in enumerate(zip((pt, qt, rt, st), outs))
        ]

    @pl.when(i == 0)
    def _():
        for c in in_copies(0, 0):
            c.start()

    @pl.when(i > 0)
    def _():
        # Drain step i-1's output DMA BEFORE the prefetch below overwrites
        # the slot it reads from (slot (i-1)%2 == nslot).  The copy
        # descriptor only determines the wait size — all steps copy S x W.
        for c in out_copies(i - 1, nslot):
            c.wait()

    @pl.when(i + 1 < n)
    def _():
        for c in in_copies(i + 1, nslot):
            c.start()

    for c in in_copies(i, slot):
        c.wait()

    v = vt[slot]
    lam = lam_ref[0, 0]
    t0 = t0_ref[0, 0]
    rows = start_of(i) + lax.broadcasted_iota(jnp.int32, (T, W), 0)
    cols = lax.broadcasted_iota(jnp.int32, (T, W), 1)
    _, body = _fgp_step_fns(v, lam, rows, cols, H, W, isotropic)
    p, q, r, s, _ = lax.fori_loop(
        0, n_iter, body, (pt[slot], qt[slot], rt[slot], st[slot], t0)
    )

    pt[slot], qt[slot], rt[slot], st[slot] = p, q, r, s
    for c in out_copies(i, slot):
        c.start()

    @pl.when(i == n - 1)
    def _():
        for c in out_copies(i, slot):
            c.wait()


@partial(
    jax.jit, static_argnames=("n_iter", "isotropic", "interpret", "pipelined")
)
def fgp_pallas_strips(
    lam: Array,
    v: Array,
    p0: Array,
    q0: Array,
    n_iter: int = 50,
    isotropic: bool = True,
    interpret: bool = False,
    pipelined: bool = False,
) -> tuple[Array, Array, Array]:
    """FGP for images past the all-VMEM wall: ``n_iter`` dual iterations as
    ``ceil(n_iter / k)`` strip sweeps (``k = _STRIP_K``), each sweep one
    Pallas grid over row strips doing ``k`` iterations VMEM-resident with a
    ``k``-row halo.  HBM traffic per dual iteration is ~``9/k`` arrays vs
    the XLA loop's ~9.  Same contract and numerics as :func:`fgp_pallas`
    (caller gates on :func:`strip_rows`).

    The momentum scalar ``t`` is global and data-independent; each sweep
    receives its starting value through SMEM and the driver advances the
    identical recursion between sweeps.

    ``pipelined=True`` selects the double-buffered kernel
    (:func:`_fgp_strip_kernel_pipelined`): identical floats (the strips
    are independent within a sweep, so prefetch order cannot change the
    math — parity is test-pinned bitwise), with the next strip's input
    DMA and the previous strip's output DMA overlapping compute.  Its
    extra prefetch slots cost 5 tiles of VMEM, which can shrink ``S``
    (``strip_rows(..., pipelined=True)``) and with it the halo-redundancy
    trade; dispatch decisions are measured, not assumed (BENCHMARKS.md).
    """
    H, W = (int(d) for d in v.shape)
    S = strip_rows(v.shape, v.dtype, pipelined=pipelined)
    if S is None:  # pragma: no cover — callers gate on strip_rows
        raise ValueError(f"no admissible strip blocking for shape {v.shape}")
    lam_arr = jnp.reshape(jnp.asarray(lam, v.dtype), (1, 1))
    field = jax.ShapeDtypeStruct((H, W), v.dtype)

    def sweep(p, q, r, s, t, n_inner: int):
        kernel = partial(
            _fgp_strip_kernel_pipelined if pipelined else _fgp_strip_kernel,
            n_iter=n_inner,
            isotropic=bool(isotropic),
            S=S,
            halo=_STRIP_K,
            H=H,
            W=W,
        )
        T = S + 2 * _STRIP_K
        scratch = (
            # scratch_shapes (NOT run_scoped) so the prefetch slots and
            # in-flight semaphores persist across the sequential grid.
            [pltpu.VMEM((2, T, W), v.dtype) for _ in range(5)]
            + [pltpu.SemaphoreType.DMA((2, 5)), pltpu.SemaphoreType.DMA((4,))]
            if pipelined
            else []
        )
        p, q, r, s = pl.pallas_call(
            kernel,
            grid=(H // S,),
            out_shape=(field,) * 4,
            # Full fields stay in HBM (ANY lets the compiler pull a 4 MB+
            # input into VMEM and blow the budget); the kernel DMAs its
            # haloed window explicitly.
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
            + [pl.BlockSpec(memory_space=pltpu.HBM)] * 5,
            out_specs=tuple(
                pl.BlockSpec(memory_space=pltpu.HBM) for _ in range(4)
            ),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_CAP_BYTES + 2 * 1024 * 1024,
            ),
            interpret=interpret,
        )(lam_arr, jnp.reshape(t, (1, 1)), v, p, q, r, s)
        for _ in range(n_inner):
            t = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        return p, q, r, s, t

    p, q = p0, q0
    r, s = p0, q0
    t = jnp.asarray(1.0, v.dtype)
    n_sweeps, rem = divmod(int(n_iter), _STRIP_K)
    if n_sweeps:
        # Equal-length sweeps share ONE compiled kernel via fori_loop.
        def outer(_, carry):
            p, q, r, s, t = carry
            return sweep(p, q, r, s, t, _STRIP_K)

        p, q, r, s, t = lax.fori_loop(0, n_sweeps, outer, (p, q, r, s, t))
    if rem:
        p, q, r, s, t = sweep(p, q, r, s, t, rem)

    # One cheap XLA pass recovers the primal from the final dual.
    from zfista_tpu.ops.tv import _div2d

    u = v - jnp.asarray(lam, v.dtype) * _div2d(p, q)
    return u, p, q
