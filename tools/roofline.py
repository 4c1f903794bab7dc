"""Roofline accounting for the engine + train iteration (VERDICT r3 #4).

Measures, on the real chip:
  * XLA cost-analysis FLOPs and HBM bytes for (a) one physics control step
    (4 substeps, lanes + Pallas PGS) and (b) one full PPO train iteration,
  * wall-clock per call (chained dispatches, overhead amortized per
    tpu-tunnel-measurement-limits),
  * achieved FLOP/s and bytes/s vs the device's nominal peaks, i.e. where
    the program sits on the roofline and how far speed-of-light is.

NOTE: cost_analysis covers the XLA ops only — the Pallas kernel body is a
custom call XLA cannot cost, so kernel FLOPs are added from a hand count
(documented inline; assembly + sweeps + w-updates at nc/nv/iterations).

Writes runs/profile/roofline_r4.json. Usage: python tools/roofline.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

NUM_ENVS = 4096

# Nominal peaks for the chip kinds we may land on. VPU figure is the
# f32 vector unit (8 sublanes x 128 lanes x 8-wide ALU x 2 flops at clock);
# MXU figure is dense bf16 matmul peak. HBM is the published bandwidth.
PEAKS = {
    "TPU v5 lite": {"mxu_bf16_tflops": 197.0, "vpu_f32_tflops": 3.9,
                    "hbm_gbs": 819.0},
    "TPU v4": {"mxu_bf16_tflops": 275.0, "vpu_f32_tflops": 4.3,
               "hbm_gbs": 1228.0},
}


def pallas_kernel_flops(nc: int, nv: int, iterations: int,
                        row_dofs) -> int:
    """Hand count of the PGS kernel's per-env FLOPs (ops/pgs_pallas.py).

    Assembly A[r] = sum_k E[r,k] W[k,:]: per row r, len(row_dofs[r]) FMAs
    of width n3 -> 2 * n3 * sum_r |dofs_r|.
    w = A @ lam: n3 rows x n3 FMA -> 2 n3^2.
    inv_d: n3 divides.
    Sweeps: per contact per iteration ~ (3 n3 FMAs for the w update +
    ~25 scalar-ish ops) -> iterations * nc * (6 n3 + 25).
    """
    n3 = 3 * nc
    a_flops = 2 * n3 * sum(len(d) for d in row_dofs)
    w0 = 2 * n3 * n3
    invd = n3
    sweep = iterations * nc * (6 * n3 + 25)
    return a_flops + w0 + invd + sweep


def cost(fn, *args):
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return compiled, {
        "flops": float(ca.get("flops", -1)),
        "bytes": float(ca.get("bytes accessed", -1)),
    }


def timeit(fn, args, iters=20, warm=3):
    out = None
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from cat_tpu.ops import pgs_pallas
    from cat_tpu.rl.ppo import PPO, PpoCfg
    from cat_tpu.sim.solver import SolverParams
    from cat_tpu.tasks.solo12_flat import make_env

    dev = jax.devices()[0]
    kind = dev.device_kind
    peaks = PEAKS.get(kind, PEAKS["TPU v5 lite"])
    env = make_env(num_envs=NUM_ENVS)
    model = env.model
    cfg = PpoCfg()
    ppo = PPO(env, cfg)

    es = env.init(jax.random.PRNGKey(0), NUM_ENVS)
    first_obs = jax.jit(env.observe)(es)
    ts = ppo.init(jax.random.PRNGKey(1), es, first_obs)

    # ---- (a) one physics control step ----
    target = jnp.broadcast_to(jnp.asarray(model.default_qpos_joints),
                              (NUM_ENVS, model.nj))

    def ctrl(sim, mu):
        return env._engine_step(sim, target, mu, None)

    compiled_c, cost_c = cost(ctrl, es.sim, es.mu)
    t_c = timeit(jax.jit(ctrl), (es.sim, es.mu))

    # ---- (b) full train iteration ----
    fn = jax.jit(ppo.train_iteration)
    compiled_t, cost_t = cost(ppo.train_iteration, ts, es)
    t_t = timeit(fn, (ts, es), iters=8)

    # ---- kernel hand count ----
    sp = SolverParams()
    row_dofs = pgs_pallas.contact_row_dofs(model, model.ancestor_mask())
    k_flops_env = pallas_kernel_flops(model.ncand, model.nv, sp.iterations,
                                      row_dofs)
    k_flops_ctrl = 4 * k_flops_env * NUM_ENVS  # 4 substeps

    def roofline(flops, bytes_, secs):
        return {
            "flops": flops, "bytes": bytes_, "seconds": secs,
            "achieved_tflops": flops / secs / 1e12,
            "achieved_gbs": bytes_ / secs / 1e9,
            "pct_vpu_f32_peak": 100 * flops / secs / 1e12
            / peaks["vpu_f32_tflops"],
            "pct_hbm_peak": 100 * bytes_ / secs / 1e9 / peaks["hbm_gbs"],
            "arith_intensity_flop_per_byte": flops / max(bytes_, 1),
        }

    out = {
        "device_kind": kind,
        "peaks_assumed": peaks,
        "num_envs": NUM_ENVS,
        "nc": model.ncand, "nv": model.nv,
        "pgs_iterations": sp.iterations,
        "control_step": {
            "xla": roofline(cost_c["flops"], cost_c["bytes"], t_c),
            "xla_plus_kernel_handcount": roofline(
                cost_c["flops"] + k_flops_ctrl, cost_c["bytes"], t_c
            ),
            "kernel_handcount_flops": k_flops_ctrl,
        },
        "train_iteration": {
            "xla": roofline(cost_t["flops"], cost_t["bytes"], t_t),
            "xla_plus_kernel_handcount": roofline(
                cost_t["flops"] + 24 * k_flops_ctrl, cost_t["bytes"], t_t
            ),
            "env_steps_per_sec": cfg.num_steps * NUM_ENVS / t_t,
            "control_step_share_pct": 100 * 24 * t_c / t_t,
        },
    }
    os.makedirs("runs/profile", exist_ok=True)
    with open("runs/profile/roofline_r4.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
