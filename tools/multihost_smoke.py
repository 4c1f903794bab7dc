"""2-process mock-DCN smoke: jax.distributed over CPU devices.

Spawns 2 processes, each with 4 virtual CPU devices, bootstraps
jax.distributed, builds the GLOBAL 8-device mesh, runs a few full train
iterations of the Solo12 CaT recipe with the env batch sharded 2 hosts x 4
devices, saves a checkpoint from host 0, and checks metrics are finite and
identical across ranks (they are replicated by construction: gradient
pmean / constraint pmax / metric pmean inside shard_map).

This validates the multi-HOST code path (jax.distributed.initialize,
make_array_from_process_local_data assembly, allgather checkpoint save) that
the single-process virtual mesh cannot exercise — the reference's analog is
the untested rl_games `--distributed` plumbing (scripts/rl_games/train.py:
100-107).

Usage: python tools/multihost_smoke.py            # driver, spawns workers
       python tools/multihost_smoke.py worker <rank>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

PORT = 49731
NPROC = 2
ENVS = 32            # global
ITERS = 3


def worker(rank: int):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

    from cat_tpu.parallel import distributed as pdist
    from cat_tpu.parallel import mesh as pmesh
    from cat_tpu.rl import checkpoint as ckpt
    from cat_tpu.rl.ppo import PPO, PpoCfg
    from cat_tpu.tasks import registry

    dist = pdist.maybe_initialize(
        seed=1, coordinator=f"localhost:{PORT}",
        num_processes=NPROC, process_id=rank,
    )
    assert jax.process_count() == NPROC
    assert len(jax.devices()) == 4 * NPROC, len(jax.devices())

    mesh = pdist.make_global_mesh()
    spec = registry.get("Solo12-CaT-Flat-v0")
    env = spec.make_env(num_envs=ENVS)
    cfg = PpoCfg(num_steps=4, num_iterations=ITERS,
                 minibatch_size=ENVS * 4 // 2)
    ppo, build = pmesh.make_train_fn(env, cfg, mesh)

    n_local = pdist.local_env_count(ENVS)
    es = env.init(jax.random.PRNGKey(dist.seed), n_local)
    first_obs = jax.jit(env.observe)(es)
    ts = ppo.init(jax.random.PRNGKey(1 + 0x5EED), es, first_obs)
    ts = pdist.host_local_to_global(mesh, ts, ENVS)
    es = pdist.host_local_to_global(mesh, es, ENVS)
    fn = build(ts, es)

    for _ in range(ITERS):
        ts, es, metrics = fn(ts, es)
    out = {k: float(v) for k, v in jax.device_get(metrics).items()}

    path = ckpt.save(f"/tmp/mh_smoke_ckpt_r{rank}", ts, es,
                     write=dist.is_host0)
    out["_ckpt_written"] = os.path.exists(path)
    print("RESULT" + json.dumps(out), flush=True)


def driver():
    me = os.path.abspath(__file__)
    procs = [
        subprocess.Popen(
            [sys.executable, me, "worker", str(r)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for r in range(NPROC)
    ]
    outs = []
    ok = True
    for r, p in enumerate(procs):
        out, _ = p.communicate(timeout=1500)
        ok &= p.returncode == 0
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT")]
        if not lines:
            print(f"--- rank {r} produced no RESULT; tail:\n"
                  + "\n".join(out.splitlines()[-15:]))
            ok = False
            continue
        outs.append(json.loads(lines[-1][len("RESULT"):]))
    if not ok:
        sys.exit(1)

    m0, m1 = outs
    loss0 = m0["Loss/mean_surrogate_loss"]
    assert all(abs(m0[k] - m1[k]) < 1e-5 for k in m0 if k != "_ckpt_written"), \
        "metrics differ across ranks (should be replicated)"
    assert m0["_ckpt_written"] and not m1["_ckpt_written"], \
        "checkpoint should be written by host 0 only"
    import math
    assert math.isfinite(loss0)
    print(f"multihost_smoke OK: 2 processes x 4 devices, {ITERS} iters, "
          f"loss={loss0:.4f}, reward={m0['Train/mean_reward_per_step']:.5f}, "
          f"rank-identical metrics, host0-only checkpoint")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]))
    else:
        driver()
