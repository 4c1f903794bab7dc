"""Part 2: is the settled-state slowdown caused by denormals/NaN in inputs?

Usage: python tools/engine_anomaly2.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:52s} {(time.perf_counter()-t0)/n*1e3:9.3f} ms", flush=True)


def stats(name, tree):
    leaves, _ = jax.tree_util.tree_flatten(tree)
    tiny = 0
    nan = 0
    total = 0
    amin = np.inf
    for x in leaves:
        a = np.asarray(x)
        if a.dtype == np.bool_ or a.dtype.kind in "iu":
            continue
        f = np.abs(a[np.isfinite(a) & (a != 0)])
        if f.size:
            amin = min(amin, float(f.min()))
        tiny += int((f < 1.18e-38).sum())     # subnormal f32
        nan += int((~np.isfinite(a)).sum())
        total += a.size
    print(f"{name}: {total} vals, {nan} nonfinite, {tiny} subnormal, "
          f"min|x| = {amin:.3e}", flush=True)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    from cat_tpu.models.solo12 import solo12_model
    from cat_tpu.sim import engine as em
    from cat_tpu.sim.engine import EngineParams
    from cat_tpu.tasks.solo12_flat import make_env

    model = solo12_model()
    params = EngineParams()
    env = make_env(num_envs=N)
    es = env.init(jax.random.PRNGKey(0), N)
    target0 = jnp.zeros((N, 12))
    step = jax.jit(em.make_batched_step(model, params, num_envs=N))

    es2 = es
    stepfn = jax.jit(lambda st, a: env.step(st, a))
    for _ in range(5):
        es2, *_ = stepfn(es2, jnp.zeros((N, 12)))
    jax.block_until_ready(es2)
    stats("settled sim state", es2.sim)

    timeit("settled sim (baseline slow)", step, es2.sim, target0, es2.mu)

    # flush subnormals in inputs to zero
    def flush(x):
        if x.dtype.kind != "f":
            return x
        a = jnp.asarray(x)
        return jnp.where(jnp.abs(a) < 1.2e-38, 0.0, a)

    sim_f = jax.tree.map(flush, es2.sim)
    jax.block_until_ready(sim_f)
    timeit("settled sim, subnormals flushed", step, sim_f, target0, es2.mu)

    # round inputs to bf16-ish granularity (kills long mantissa tails)
    def crush(x):
        if x.dtype.kind != "f":
            return x
        return jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32)

    sim_c = jax.tree.map(crush, es2.sim)
    jax.block_until_ready(sim_c)
    timeit("settled sim, bf16-crushed inputs", step, sim_c, target0, es2.mu)

    # single field bisect: start from fresh state, swap in settled fields
    fresh = es.sim
    for field in es2.sim._fields:
        hybrid = fresh._replace(**{field: getattr(es2.sim, field)})
        timeit(f"fresh + settled {field}", step, hybrid, target0, es2.mu)


if __name__ == "__main__":
    main()
