"""Backend-gated TPU production-path smoke (VERDICT r2 next-step #5).

The rest of the suite runs on the virtual CPU mesh, which silently selects
layout="vmap" and use_pallas=False — the NON-production engine. That is how
a kernel-breaking change (the r2 Pallas VMEM OOM) got committed without any
test failing. These tests only run when the session is on a real TPU
backend (run with `CAT_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py`)
and jit one lanes+Pallas control step at the flagship contact configuration
(nc=36: self-collision ON), so a kernel that fails to compile turns tests
red, not just the end-of-round bench.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

on_tpu = jax.default_backend() == "tpu"
pytestmark = pytest.mark.skipif(
    not on_tpu, reason="requires a real TPU backend (CAT_TPU_TESTS=1)"
)


@pytest.mark.slow
def test_lanes_pallas_control_step_compiles_and_runs():
    from cat_tpu.models.solo12 import solo12_model
    from cat_tpu.sim import engine as em
    from cat_tpu.sim.engine import EngineParams

    model = solo12_model()
    assert model.ncand == 36  # flagship contact set: self-collision ON
    N = 128
    step = jax.jit(
        em.make_batched_step(model, EngineParams(), num_envs=N,
                             layout="lanes")
    )
    s = em.make_batched_init(model, N)
    target = jnp.zeros((N, model.nj))
    s1 = step(s, target, jnp.ones(N))
    jax.block_until_ready(s1.qpos)
    q = np.asarray(s1.qpos)
    assert np.isfinite(q).all()
    # robot dropped from z=0.3: feet contact fires within one control step
    f = np.asarray(s1.forces)
    assert np.isfinite(f).all()


@pytest.mark.slow
def test_entry_exercises_production_path():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


@pytest.mark.slow
def test_lanes_pallas_hfield_step_compiles_and_runs():
    """Heightfield production path (rough task): lanes + Pallas + the
    packed-cell surface_gap probe must compile and run on chip."""
    from cat_tpu.models.solo12 import solo12_model
    from cat_tpu.sim import engine as em
    from cat_tpu.sim.engine import EngineParams
    from cat_tpu.sim.terrain import generate_rough, height_at

    model = solo12_model()
    terr = generate_rough(rows=2, cols=4, patch_m=4.0, seed=0)
    N = 128
    step = jax.jit(
        em.make_batched_step(model, EngineParams(), num_envs=N,
                             layout="lanes", terrain=terr)
    )
    s = em.make_batched_init(model, N)
    target = jnp.broadcast_to(jnp.asarray(model.default_qpos_joints),
                              (N, model.nj))
    s1 = step(s, target, jnp.ones(N))
    jax.block_until_ready(s1.qpos)
    assert np.isfinite(np.asarray(s1.qpos)).all()


@pytest.mark.slow
def test_preassembled_kernel_runs_on_chip():
    """The sweep-only kernel variant (CAT_TPU_PGS_PREASSEMBLE A/B path)
    must also compile on real hardware, not just interpret mode."""
    from cat_tpu.models.solo12 import solo12_model
    from cat_tpu.ops import pgs_pallas
    from cat_tpu.sim.solver import SolverParams

    model = solo12_model()
    nc, nv, N = model.ncand, model.nv, 256
    rng = np.random.default_rng(0)
    E = jnp.asarray(rng.normal(size=(3 * nc, nv, N)).astype(np.float32))
    W = jnp.asarray(rng.normal(size=(nv, 3 * nc, N)).astype(np.float32) * 0.1)
    A = jnp.einsum("rkn,kcn->rcn", E, W)
    A = 0.5 * (A + jnp.swapaxes(A, 0, 1)) + 5.0 * jnp.eye(3 * nc)[:, :, None]
    b = jnp.asarray(rng.normal(size=(3 * nc, N)).astype(np.float32))
    bias = jnp.zeros((nc, N))
    active = jnp.ones((nc, N))
    mu = jnp.full((1, N), 0.8)
    lam0 = jnp.zeros((3 * nc, N))
    sp = SolverParams()
    lam = pgs_pallas.pgs_solve_lanes_pre(
        A, b, bias, active, mu, lam0,
        nc=nc, iterations=sp.iterations, cfm=sp.cfm,
    )
    jax.block_until_ready(lam)
    out = np.asarray(lam)
    assert out.shape == (3 * nc, N) and np.isfinite(out).all()
    # normal components non-negative
    assert (out.reshape(nc, 3, N)[:, 2, :] >= 0).all()
