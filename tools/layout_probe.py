"""Layout probe: same dynamics contractions in batch-FIRST (current vmap
layout) vs env-on-LANES (trailing N) form, chained timing.

Usage: python tools/layout_probe.py [N]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def chain(name, fn, state, n=20):
    state = fn(state)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(n):
        state = fn(state)
    jax.block_until_ready(state)
    print(f"{name:52s} {(time.perf_counter()-t0)/n*1e3:9.3f} ms", flush=True)
    return state


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    nb, nv = 13, 18
    key = jax.random.PRNGKey(0)
    m = jax.random.uniform(jax.random.fold_in(key, 9), (nb,))

    # ---- batch-first: M[n] = sum_b m_b Jv[n,b]^T Jv[n,b] ----
    Jv0 = jax.random.normal(key, (N, nb, 3, nv))

    @functools.partial(jax.jit, donate_argnums=0)
    def mm_batchfirst(Jv):
        with jax.default_matmul_precision("float32"):
            M = jnp.einsum("nbik,nbil->nkl", Jv * m[None, :, None, None], Jv)
            # feed back so chaining is data-dependent
            return Jv + 1e-9 * M[:, None, :3, :]

    chain("M einsum, batch-first (vmap layout)", mm_batchfirst, Jv0)

    # ---- lanes: Jv (nb, 3, nv, N) ----
    Jv1 = jax.random.normal(key, (nb, 3, nv, N))

    @functools.partial(jax.jit, donate_argnums=0)
    def mm_lanes(Jv):
        M = jnp.zeros((nv, nv, N))
        for b in range(nb):
            JvM = Jv[b] * m[b]                      # (3, nv, N)
            M = M + jnp.sum(
                JvM[:, :, None, :] * Jv[b][:, None, :, :], axis=0
            )
        return Jv + 1e-9 * M[None, :3, :, :]

    chain("M loop, env-on-lanes", mm_lanes, Jv1)

    # ---- minvEt: batch-first batched matmul vs lanes loop ----
    Minv0 = jax.random.normal(key, (N, nv, nv))
    E0 = jax.random.normal(key, (N, 84, nv))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def w_batchfirst(Minv, E):
        with jax.default_matmul_precision("float32"):
            W = jnp.einsum("nkj,ncj->nkc", Minv, E)   # (N, nv, 84)
            return Minv + 1e-9 * W[:, :, :nv], E + 1e-9 * W.transpose(0, 2, 1)

    chain("minvEt, batch-first", lambda c: w_batchfirst(*c), (Minv0, E0))

    Minv1 = jax.random.normal(key, (nv, nv, N))
    E1 = jax.random.normal(key, (84, nv, N))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def w_lanes(Minv, E):
        W = jnp.zeros((nv, 84, N))
        for j in range(nv):
            W = W + Minv[:, j, None, :] * E[None, :, j, :]
        return Minv + 1e-9 * W[:, :nv, :], E + 1e-9 * W.transpose(1, 0, 2)

    chain("minvEt, env-on-lanes", lambda c: w_lanes(*c), (Minv1, E1))

    # ---- FK-style chain: sequence of small matmats, both layouts ----
    R0 = jax.random.normal(key, (N, 3, 3))

    @functools.partial(jax.jit, donate_argnums=0)
    def fkish_batchfirst(R):
        with jax.default_matmul_precision("float32"):
            acc = R
            for _ in range(24):
                acc = jnp.einsum("nij,njk->nik", acc, R)
                acc = acc / jnp.linalg.norm(acc, axis=(1, 2), keepdims=True)
            return acc

    chain("24x (3x3 matmul+norm), batch-first", fkish_batchfirst, R0)

    R1 = jax.random.normal(key, (3, 3, N))

    @functools.partial(jax.jit, donate_argnums=0)
    def fkish_lanes(R):
        acc = R
        for _ in range(24):
            nxt = jnp.zeros((3, 3, N))
            for i in range(3):
                for k in range(3):
                    s = jnp.zeros(N)
                    for j in range(3):
                        s = s + acc[i, j] * R[j, k]
                    nxt = nxt.at[i, k].set(s)
            acc = nxt / jnp.sqrt(jnp.sum(nxt * nxt, axis=(0, 1)))[None, None]
        return acc

    chain("24x (3x3 matmul+norm), env-on-lanes", fkish_lanes, R1)


if __name__ == "__main__":
    main()
