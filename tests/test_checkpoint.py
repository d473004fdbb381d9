"""Checkpoint/resume: a solve interrupted at iteration k and resumed from
its saved state must finish bitwise identical to the uninterrupted solve."""

import jax
import numpy as np
import pytest

from zfista_tpu import minimize_proximal_gradient
from zfista_tpu.models.zoo import JOS1
from zfista_tpu.utils.checkpoint import load_state, save_state


def test_resume_bitwise_identical(tmp_path):
    prob = JOS1(n_features=5)
    rng = np.random.default_rng(0)
    x0 = rng.uniform(-2, 4, size=5)
    opts = dict(nesterov=True, max_iter=200)

    full = prob.minimize_proximal_gradient(x0, **opts)
    assert full.success

    # interrupt at 7 iterations, checkpoint, reload, resume
    part = prob.minimize_proximal_gradient(x0, nesterov=True, max_iter=7, tol=0.0)
    ckpt = tmp_path / "solve.npz"
    save_state(part.state, ckpt)
    state = load_state(ckpt)
    resumed = minimize_proximal_gradient(
        prob.f,
        prob.g,
        prob.jac_f,
        prob.prox_wsum_g,
        x0,
        initial_state=state,
        **opts,
    )
    assert resumed.success
    assert resumed.nit == full.nit
    np.testing.assert_array_equal(resumed.x, full.x)
    np.testing.assert_array_equal(np.asarray(resumed.fun), np.asarray(full.fun))


def test_state_roundtrip_batched(tmp_path):
    from zfista_tpu.parallel.batch import minimize_proximal_gradient_batch

    prob = JOS1(n_features=5)
    rng = np.random.default_rng(1)
    x0s = rng.uniform(-2, 4, size=(4, 5))
    res = minimize_proximal_gradient_batch(
        prob.f, prob.g, prob.jac_f, prob.prox_wsum_g, x0s, nesterov=True
    )
    # batched final states round-trip through npz
    import jax

    from zfista_tpu.core.solver import State

    # reconstruct a batched state from the result fields isn't exposed;
    # check the npz round-trip on a hand-built batched pytree instead.
    state = State(
        x=res.x,
        y=res.x,
        F_x=np.atleast_2d(res.fun).reshape(len(res.x), -1),
        lr=res.lr,
        # dtype follows the solve (f64 on the x64 CPU mesh, f32 under the
        # ZFISTA_TEST_PLATFORM opt-out): a float64 literal here would trip
        # load_state's silent-downcast refusal when x64 is off.
        t=np.ones(len(res.x), dtype=np.asarray(res.x).dtype),
        w=res.weight,
        err=res.error_criterion,
        sub_fun=np.zeros(len(res.x), dtype=np.asarray(res.x).dtype),
        nit=res.nit,
        nit_internal=res.nit_internal,
        converged=res.success,
        failed=res.status == 2,
    )
    p = tmp_path / "batch.npz"
    save_state(jax.tree.map(lambda a: np.asarray(a), state), p)
    loaded = load_state(p)
    for a, b in zip(loaded, state):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_check_every_bitwise_identical():
    # check_every>1 masks frozen states inside the inner unrolled loop, so
    # the final state (including nit) must be bitwise identical.
    prob = JOS1(n_features=5)
    rng = np.random.default_rng(2)
    x0 = rng.uniform(-2, 4, size=5)
    base = prob.minimize_proximal_gradient(x0, nesterov=True)
    for k in [2, 4, 7]:
        fast = prob.minimize_proximal_gradient(x0, nesterov=True, check_every=k)
        assert fast.nit == base.nit
        np.testing.assert_array_equal(fast.x, base.x)
        assert fast.success == base.success


def test_batch_resume_bitwise_identical(tmp_path):
    from zfista_tpu.core.solver import State
    from zfista_tpu.parallel.batch import minimize_proximal_gradient_batch

    prob = JOS1(n_features=5)
    rng = np.random.default_rng(3)
    x0s = rng.uniform(-2, 4, size=(4, 5))
    args = (prob.f, prob.g, prob.jac_f, prob.prox_wsum_g, x0s)
    full = minimize_proximal_gradient_batch(*args, nesterov=True)
    part = minimize_proximal_gradient_batch(*args, nesterov=True, max_iter=6, tol=0.0)
    p = tmp_path / "batch.npz"
    save_state(part.state, p)
    loaded = load_state(p)
    resumed = minimize_proximal_gradient_batch(
        *args, nesterov=True, initial_states=State(*loaded)
    )
    np.testing.assert_array_equal(resumed.x, full.x)
    np.testing.assert_array_equal(resumed.nit, full.nit)


def test_checkpoint_path_without_suffix(tmp_path):
    prob = JOS1(n_features=5)
    r = prob.minimize_proximal_gradient(np.ones(5), nesterov=True, max_iter=3, tol=0.0)
    save_state(r.state, tmp_path / "iter100")  # no .npz suffix
    st = load_state(tmp_path / "iter100")
    np.testing.assert_array_equal(np.asarray(st.x), np.asarray(r.state.x))


@pytest.mark.skipif(
    not jax.config.jax_enable_x64,
    reason="needs x64: without it the f64 input silently becomes f32 "
    "and the expected refusal never triggers",
)
def test_load_state_refuses_silent_downcast(tmp_path):
    """A float64 checkpoint must not silently load as float32 when x64 is
    off (ADVICE r1: bitwise-identical-resume contract)."""
    import jax.numpy as jnp
    import pytest

    from zfista_tpu.core.solver import init_state

    import jax

    state = init_state(jnp.zeros(3, jnp.float64), jnp.zeros(1, jnp.float64), 1, lr=1.0)
    ckpt = tmp_path / "f64.npz"
    save_state(state, ckpt)  # floating fields stored as float64
    with jax.enable_x64(False):  # loader would canonicalize f64 -> f32
        with pytest.raises(ValueError, match="refusing a silent precision"):
            load_state(ckpt)
    load_state(ckpt)  # x64 back on: loads fine


def test_annotate_decorator_and_ctx():
    """annotate() must work both as a decorator and a context manager
    (review finding: TraceAnnotation alone is not callable)."""
    from zfista_tpu.utils.profiling import annotate

    @annotate("step")
    def f(x):
        return x + 1

    assert f(1) == 2
    with annotate("scope"):
        pass


def test_annotate_reentrant():
    """One annotation object entered reentrantly must close scopes LIFO
    (round-3 finding: a single-slot ctx closed the wrong scope twice)."""
    from zfista_tpu.utils.profiling import annotate

    ann = annotate("outer")
    with ann:
        with ann:
            pass
    # exits balanced: a fresh enter still works
    with ann:
        pass


def test_save_state_atomic_no_tmp_left(tmp_path):
    """save_state writes via tmp+rename: no temp files survive, and the
    checkpoint loads (round-3 finding: a crash mid-savez left a
    truncated npz)."""
    import jax.numpy as jnp

    from zfista_tpu.core.solver import init_state
    from zfista_tpu.utils.checkpoint import load_state, save_state

    st = init_state(jnp.zeros(4), jnp.zeros(1), 1, 0.5)
    path = tmp_path / "ckpt.npz"
    save_state(st, path)
    leftovers = [p for p in tmp_path.iterdir() if "tmp" in p.name]
    assert leftovers == []
    st2 = load_state(path)
    assert st2.x.shape == (4,)


def test_checkpoint_meta_roundtrip(tmp_path):
    """save_state(meta=...) stores string metadata read back by
    load_meta; load_state ignores it (state round-trip unchanged); a
    meta key colliding with a State field is rejected; checkpoints
    without metadata load an empty dict (backward compatible)."""
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from zfista_tpu.core.solver import init_state
    from zfista_tpu.utils.checkpoint import load_meta, load_state, save_state

    st = init_state(jnp.arange(4.0), jnp.zeros(1), 1, 0.5)
    path = tmp_path / "ckpt.npz"
    save_state(st, path, meta={"prox_kernel": "pallas", "prox_iter": "30"})
    assert load_meta(path) == {"prox_kernel": "pallas", "prox_iter": "30"}
    st2 = load_state(path)
    np.testing.assert_array_equal(np.asarray(st2.x), np.asarray(st.x))
    with pytest.raises(ValueError, match="collides"):
        save_state(st, path, meta={"x": "oops"})
    save_state(st, path)  # no meta
    assert load_meta(path) == {}


def test_tv_deblur_checkpoint_meta(tmp_path):
    """TVDeblur.checkpoint_meta() pins the RESOLVED prox kernel (the
    ADVICE round-3 finding: the 'auto' default flip to Pallas changes
    TPU numerics, so resumes must be able to detect a kernel change).
    On this CPU suite 'auto' resolves to the XLA loop."""
    import jax
    import numpy as np

    from zfista_tpu.models.deblur import TVDeblur, gaussian_kernel

    rng = np.random.default_rng(0)
    prob = TVDeblur(rng.random((16, 16)), kernel=gaussian_kernel(5, 1.0))
    meta = prob.checkpoint_meta()
    assert meta["problem"] == "TVDeblur"
    assert meta["prox_method"] == "auto"
    expected = "pallas" if jax.default_backend() == "tpu" else "xla"
    assert meta["prox_kernel"] == expected
    assert meta["prox_iter"] == "30"
    # explicit pin survives resolution
    p2 = TVDeblur(
        rng.random((16, 16)), kernel=gaussian_kernel(5, 1.0),
        prox_method="xla",
    )
    assert p2.checkpoint_meta()["prox_kernel"] == "xla"
