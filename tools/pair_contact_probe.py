"""Self-collision pair contact rates under a TRAINED policy (VERDICT r2
next-step #2: "a short TPU run logging nonzero knee/leg pair contact
rates").

Loads a training run's checkpoint, rolls the deterministic policy for a few
hundred control steps at a few hundred envs on the real chip, and reports
per-pair contact statistics straight from the solver's impulses (the pair
rows of SimState.lam): fraction of (env, step) samples with a nonzero
normal impulse, plus near-contact proximity rates from the capsule
distances. Writes runs/profile/pair_contacts.json.

Usage: python tools/pair_contact_probe.py <run_dir> [steps=250] [envs=256]
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    run_dir = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 250
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    from cat_tpu.models.solo12 import solo12_model
    from cat_tpu.rl import checkpoint as ckpt
    from cat_tpu.rl.networks import ActorCritic, SharedActorCritic
    from cat_tpu.rl.normalize import rms_normalize
    from cat_tpu.rl.ppo import PPO, PpoCfg
    from cat_tpu.tasks.solo12_flat import make_env

    import dataclasses

    with open(os.path.join(run_dir, "config.json")) as f:
        run_cfg = json.load(f)
    field_names = {f.name for f in dataclasses.fields(PpoCfg)}
    acfg = PpoCfg(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in run_cfg["agent_cfg"].items()
        if k in field_names
    })

    env = make_env(num_envs=n)
    ppo = PPO(env, acfg)
    es = env.init(jax.random.PRNGKey(42), n)
    obs = jax.jit(env.observe)(es)
    ts = ppo.init(jax.random.PRNGKey(7), es, obs)
    path = os.path.join(run_dir, "ckpt_final.pkl")
    ts, _ = ckpt.restore(path, ts, es, strict=False)
    print(f"loaded {path}")

    model = solo12_model()
    npair, nct = model.npair, model.ncand_terrain
    pair_names = [
        f"{model.body_names[a]}--{model.body_names[b]}"
        for a, b in zip(model.pair_body_a, model.pair_body_b)
    ]

    from cat_tpu.sim import collision, dynamics

    anc = model.ancestor_mask()

    def policy(params, obs_rms, obs_raw):
        mean, _, _ = ppo.net.apply(params, rms_normalize(obs_rms, obs_raw))
        return mean

    def pair_phi(qpos_batch):
        def one(q):
            kin = dynamics.fk(model, q, jnp.zeros(model.nv))
            phi, _, _ = collision.detect_pair_contacts(model, kin, anc)
            return phi
        return jax.vmap(one)(qpos_batch)                  # (n, npair)

    @functools.partial(jax.jit, static_argnums=2)
    def roll(ts, es, random_actions: bool):
        def body(carry, key):
            es, obs = carry
            if random_actions:
                # wild thrashing: the self-collision path MUST fire here
                act = 3.0 * jax.random.normal(key, (n, env.num_actions))
            else:
                act = policy(ts.params, ts.obs_rms, obs)
            es2, obs2, *_ = env.step(es, act)
            lam = es2.sim.lam.reshape(n, model.ncand, 3)
            pair_n = lam[:, nct:, 2]                      # (n, npair)
            hit = (jnp.abs(pair_n) > 0).astype(jnp.float32)
            phi = pair_phi(es2.sim.qpos)
            return (es2, obs2), (hit.mean(axis=0), phi.min(axis=0))
        keys = jax.random.split(jax.random.PRNGKey(3), steps)
        (es, _), (hits, phis) = jax.lax.scan(
            body, (es, jax.jit(env.observe)(es)), keys)
        return hits, phis                                 # (steps, npair)

    def stats(hits, phis):
        hits, phis = np.asarray(hits), np.asarray(phis)
        return {
            "pair_contact_rate": {
                pair_names[p]: float(hits[:, p].mean()) for p in range(npair)
            },
            "any_pair_contact_rate": float((hits.sum(axis=1) > 0).mean()),
            "min_pair_distance_m": {
                pair_names[p]: float(phis[:, p].min()) for p in range(npair)
            },
        }

    out = {
        "backend": jax.default_backend(),
        "run_dir": run_dir,
        "steps": steps,
        "envs": n,
        # trained policy: rates ~0 and positive margins = the constraint
        # stack taught the gait to AVOID self-collision
        "trained_policy": stats(*roll(ts, es, False)),
        # random thrashing: nonzero rates = the pair-contact path FIRES
        # in situ (negative min distance without impulses would be a bug)
        "random_policy": stats(*roll(ts, env.init(jax.random.PRNGKey(9), n),
                                     True)),
    }
    os.makedirs("runs/profile", exist_ok=True)
    with open("runs/profile/pair_contacts.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
