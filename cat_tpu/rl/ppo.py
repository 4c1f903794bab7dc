"""From-scratch PPO with CaT float-done GAE, fully jit-compiled.

Parity with the reference CleanRL-style PPO (cleanrl/ppo.py:126-372) and its
Solo12 hyperparameters (clean_rl_ppo_cfg.py), redesigned TPU-first:

  * one jitted ``train_iteration``: rollout as ``lax.scan`` over the horizon,
    dual-done GAE as a reversed scan, 5x(batch/minibatch) SGD as nested scans
    — a single XLA program per iteration, state donated, no host round-trips
    except the scalar metrics fetched once per iteration.
  * CaT GAE semantics (cleanrl/ppo.py:250-277): two done signals — float
    constraint probability ``dones`` and binary truncation ``true_dones`` —
    both multiply the bootstrap and the trace decay.
  * obs normalization in the learner, updated during rollout
    (cleanrl/ppo.py:187,225); value/return normalization updated sequentially
    exactly like the reference (ppo.py:287-288).
  * multi-chip: the same function runs under ``shard_map`` over a mesh axis
    ``env``; gradients/metrics psum, normalizer moments psum, constraint
    running-max pmax (SURVEY.md §2.4/§2.5). Minibatch permutations are
    per-chip (each chip permutes its local rows — statistically equivalent).

Collective discipline v2 (runs/scaling/PROJECTION.md: off-slice efficiency
is latency x collective COUNT, not bytes). One iteration issues exactly
``30 + 5 + 1`` collectives:

  * 30 grad pmeans (one per minibatch — irreducible at reference
    semantics), each carrying the 5 scalar loss stats fused into the same
    pmean (XLA's all-reduce combiner merges the pytree into one op);
  * 5 per-EPOCH fused pmeans of ALL that epoch's minibatch adv-norm
    moments as one (n_minibatches, 2) tensor — exact, because advantages
    are fixed for the whole iteration, so each minibatch's moments are
    known the moment the epoch's permutation is drawn;
  * 1 iteration-boundary fused merge (`_boundary_merge`): obs-normalizer
    moment deltas (psum), value-normalizer batch moments (psum), episode
    metrics (psum), and the constraint running-max (pmax) cross one
    mixed-op collective via a scatter-psum table.

The rollout itself issues ZERO collectives: obs_rms and the CaT
running-max update shard-locally during the 24 steps (each shard behaves
exactly like the reference's single-GPU semantics over its own envs) and
re-synchronize EXACTLY at the boundary — the merged obs_rms equals the
per-step-psum result bit-for-near (moment accumulation is associative),
and the running-max pmax re-replicates the CaT normalizer every iteration.
Single-chip math is completely unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from cat_tpu.envs.env import CatEnv
from cat_tpu.envs.types import EnvState

from . import networks
from .normalize import (RmsState, rms_init, rms_merge_moments, rms_moments,
                        rms_normalize, rms_stats, rms_update)


@dataclasses.dataclass(frozen=True)
class PpoCfg:
    """Hyperparameters (reference clean_rl_ppo_cfg.py:10-34).

    The backend-variant knobs mirror the reference's other two RL stacks:
    ``lr_mode="adaptive_kl"`` + ``kl_target`` is rl_games' AdaptiveScheduler
    (rl_games_cat_solo.yaml:43-45) / skrl's KLAdaptiveLR (skrl_ppo_cfg.yaml:48),
    ``value_bootstrap`` is rl_games' timeout bootstrap (cat_common.py:62-67),
    and ``shared_model`` is skrl's single GaussianMixin+DeterministicMixin
    network (skrl_ppo_cfg.yaml:3-26).
    """
    learning_rate: float = 3.0e-4
    num_steps: int = 24
    num_iterations: int = 2000
    gamma: float = 0.99
    gae_lambda: float = 0.95
    updates_epochs: int = 5
    minibatch_size: int = 16384   # GLOBAL minibatch size
    clip_coef: float = 0.2
    ent_coef: float = 0.001
    vf_coef: float = 2.0
    max_grad_norm: float = 1.0
    norm_adv: bool = True
    clip_vloss: bool = True
    anneal_lr: bool = True        # used when lr_mode="auto"
    save_interval: int = 50
    hidden: Tuple[int, ...] = (512, 256, 128)
    # backend variants (C16-C21 parity)
    # auto | linear | constant | adaptive_kl | adaptive_kl_epoch:
    #   adaptive_kl       — per-MINIBATCH lr step (rl_games AdaptiveScheduler,
    #                       invoked inside train_actor_critic per update)
    #   adaptive_kl_epoch — one lr step per EPOCH on that epoch's mean KL
    #                       (skrl KLAdaptiveLR semantics, skrl/ppo.py:558-567:
    #                       kl_divergences reset each epoch at 476, mean +
    #                       distributed all-reduce, then scheduler.step)
    lr_mode: str = "auto"
    kl_target: float = 0.008      # rl_games kl .008 / skrl kl .01
    lr_min: float = 1.0e-6        # AdaptiveScheduler bounds (rl_games defaults)
    lr_max: float = 1.0e-2
    value_bootstrap: bool = False
    shared_model: bool = False

    @property
    def resolved_lr_mode(self) -> str:
        if self.lr_mode == "auto":
            return "linear" if self.anneal_lr else "constant"
        return self.lr_mode


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    obs_rms: RmsState
    value_rms: RmsState
    iteration: jnp.ndarray        # () int32
    lr: jnp.ndarray               # () current learning rate
    key: jnp.ndarray              # per-shard PRNG key
    # rollout carry (the "next_*" buffers of cleanrl/ppo.py:186-189)
    next_obs: jnp.ndarray         # (N, obs) normalized
    next_done: jnp.ndarray        # (N,) float
    next_true_done: jnp.ndarray   # (N,) float


class PPO:
    """Builds the jitted train iteration for an env + config."""

    def __init__(self, env: CatEnv, cfg: PpoCfg,
                 axis_name: Optional[str] = None, num_devices: int = 1):
        self.env = env
        self.cfg = cfg
        self.axis_name = axis_name
        self.num_devices = num_devices  # static shard count of the env axis
        net_cls = (
            networks.SharedActorCritic if cfg.shared_model
            else networks.ActorCritic
        )
        self.net = net_cls(env.num_actions, cfg.hidden)
        # LR is applied manually from TrainState.lr: the linear anneal is
        # per-ITERATION (cleanrl/ppo.py:196-199), not per optimizer step, and
        # the adaptive-KL mode mutates lr per minibatch (rl_games
        # AdaptiveScheduler), so a step-counted optax schedule fits neither.
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.scale_by_adam(eps=1e-5),
        )
        self._inv_dev = 1.0 / num_devices

    def _boundary_merge(self, ax, obs_rms0, obs_rms_l, moms, rmax_l, scal,
                        sum_scaled):
        """The iteration's single fused cross-shard collective.

        Sum-reduced payload (obs_rms moment DELTAS since iteration start,
        value/return batch moments, episode metric accumulators) and the
        max-reduced CaT running-max cross the wire as ONE psum of a
        (num_devices, D) one-hot-row table; both reductions finish locally.
        Exact: moment pooling is associative (normalize.rms_merge_moments),
        so the merged obs_rms equals the per-step-psum result, and pmax of
        per-shard polyak maxes re-replicates running_max each iteration.
        """
        s1_0, s2_0, n_0 = rms_stats(obs_rms0)
        s1_l, s2_l, n_l = rms_stats(obs_rms_l)
        (vs1, vs2, vn), (rs1, rs2, rn) = moms
        sums = jnp.concatenate([
            s1_l - s1_0, s2_l - s2_0, (n_l - n_0)[None],
            jnp.stack([vs1, vs2, vn, rs1, rs2, rn]),
            scal,
        ])
        row = jnp.concatenate([sums, rmax_l])
        ndev = self.num_devices
        table = jnp.zeros((ndev, row.shape[0]), row.dtype)
        table = table.at[jax.lax.axis_index(ax)].set(row)
        table = jax.lax.psum(table, ax)
        m = sums.shape[0]
        gsums = jnp.sum(table[:, :m], axis=0)
        rmax_g = jnp.max(table[:, m:], axis=0)

        k = s1_0.shape[0]
        n_g = n_0 + gsums[2 * k]
        mean_g = (s1_0 + gsums[:k]) / n_g
        ex2_g = (s2_0 + gsums[k:2 * k]) / n_g
        obs_rms_g = RmsState(
            mean=mean_g,
            var=jnp.maximum(ex2_g - jnp.square(mean_g), 0.0),
            count=n_g,
        )
        vm = gsums[2 * k + 1:2 * k + 7]
        scal_g = gsums[2 * k + 7:] * sum_scaled
        return (
            obs_rms_g,
            ((vm[0], vm[1], vm[2]), (vm[3], vm[4], vm[5])),
            rmax_g, scal_g,
        )

    # ---------------- init ----------------

    def init(self, key: jnp.ndarray, env_state: EnvState,
             first_obs_raw: jnp.ndarray) -> TrainState:
        k_net, k_run = jax.random.split(key)
        params = self.net.init(
            k_net, jnp.zeros((1, self.env.num_obs))
        )
        obs_rms = rms_init((self.env.num_obs,))
        # warm-start obs_rms on the reset obs (cleanrl/ppo.py:186-187).
        # init runs host-side on the GLOBAL batch (outside shard_map), so no
        # axis collective here.
        obs_rms = rms_update(obs_rms, first_obs_raw, None)
        n = first_obs_raw.shape[0]
        return TrainState(
            params=params,
            opt_state=self.tx.init(params),
            obs_rms=obs_rms,
            value_rms=rms_init(()),
            iteration=jnp.zeros((), jnp.int32),
            lr=jnp.asarray(self.cfg.learning_rate, jnp.float32),
            key=k_run,
            next_obs=rms_normalize(obs_rms, first_obs_raw),
            next_done=jnp.zeros(n),
            next_true_done=jnp.zeros(n),
        )

    # ---------------- one training iteration ----------------

    def train_iteration(self, ts: TrainState, es: EnvState):
        """(TrainState, EnvState) -> (TrainState, EnvState, metrics dict)."""
        cfg = self.cfg
        ax = self.axis_name

        # Per-shard key derivation: TrainState.key stays replicated (so the
        # replicated params/opt update identically), while local draws
        # (action noise, permutations) decorrelate across shards.
        base_key, next_ts_key = jax.random.split(ts.key)
        if ax is not None:
            base_key = jax.random.fold_in(base_key, jax.lax.axis_index(ax))

        # per-iteration learning rate (cleanrl/ppo.py:196-199); adaptive-KL
        # mode instead carries lr across iterations and mutates it per
        # minibatch below (rl_games AdaptiveScheduler / skrl KLAdaptiveLR).
        mode = cfg.resolved_lr_mode
        if mode == "linear":
            frac = 1.0 - ts.iteration.astype(jnp.float32) / cfg.num_iterations
            lr = cfg.learning_rate * jnp.maximum(frac, 0.0)
        elif mode == "constant":
            lr = jnp.asarray(cfg.learning_rate, jnp.float32)
        else:
            lr = ts.lr

        # ---- rollout (HOT LOOP #1, cleanrl/ppo.py:201-230) ----
        # Collective-free (discipline v2, module docstring): obs_rms and the
        # CaT running-max update shard-LOCALLY over the 24 steps — each
        # shard runs the reference's exact single-GPU semantics on its own
        # envs — and re-sync exactly in _boundary_merge below.
        def rollout_step(carry, _):
            ts_obs, ts_done, ts_tdone, obs_rms, es, key = carry
            key, k_act = jax.random.split(key)
            mean, log_std, value = self.net.apply(ts.params, ts_obs)
            action, logp = networks.sample_action(mean, log_std, k_act)
            es2, next_obs_raw, reward, done, time_out = self.env.step(
                es, action, axis_name=None
            )
            if cfg.value_bootstrap:
                # rl_games timeout bootstrap (cat_common.py:62-67):
                # r += gamma * V(s_t) on truncation, so cut-off episodes
                # don't look like zero-future-return.
                reward = reward + (
                    cfg.gamma * value * time_out.astype(reward.dtype)
                )
            obs_rms2 = rms_update(obs_rms, next_obs_raw, None)
            next_obs = rms_normalize(obs_rms2, next_obs_raw)
            out = (ts_obs, action, logp, value, reward, ts_done, ts_tdone)
            return (
                (next_obs, done, time_out.astype(jnp.float32), obs_rms2, es2,
                 key), out
            )

        key = base_key
        (next_obs, next_done, next_tdone, obs_rms, es, key), traj = (
            jax.lax.scan(
                rollout_step,
                (ts.next_obs, ts.next_done, ts.next_true_done, ts.obs_rms,
                 es, key),
                None, length=cfg.num_steps,
            )
        )
        b_obs, b_actions, b_logprobs, b_values_t, b_rewards, b_dones, b_tdones = traj

        # ---- dual-done GAE (cleanrl/ppo.py:250-277) ----
        _, _, next_value = self.net.apply(ts.params, next_obs)

        def gae_step(carry, inp):
            lastgaelam, nextvalue, nextnonterm = carry
            reward, value, done, tdone = inp
            delta = reward + cfg.gamma * nextvalue * nextnonterm - value
            lastgaelam = (
                delta + cfg.gamma * cfg.gae_lambda * nextnonterm * lastgaelam
            )
            return (lastgaelam, value, (1.0 - done) * (1.0 - tdone)), lastgaelam

        # at t: nextnonterminal uses dones[t+1] (or the carry next_done)
        nn_last = (1.0 - next_done) * (1.0 - next_tdone)
        (_, _, _), advantages = jax.lax.scan(
            gae_step,
            (jnp.zeros_like(next_done), next_value, nn_last),
            (b_rewards, b_values_t, b_dones, b_tdones),
            reverse=True,
        )
        returns = advantages + b_values_t

        # ---- flatten & value normalization (cleanrl/ppo.py:279-288) ----
        nb = cfg.num_steps * next_obs.shape[0]
        b_obs = b_obs.reshape(nb, -1)
        b_actions = b_actions.reshape(nb, -1)
        b_logprobs = b_logprobs.reshape(nb)
        b_adv = advantages.reshape(nb)
        b_returns = returns.reshape(nb)
        b_vals = b_values_t.reshape(nb)

        # ---- iteration-boundary cross-shard merge (ONE collective) ----
        # Everything the shards must agree on before SGD crosses the wire
        # here, fused: obs_rms moment deltas + value moments + episode
        # metrics (sum-reduced) and the CaT running-max (max-reduced) ride
        # one scatter-psum table (module docstring, discipline v2).
        es, ep_metrics = self.env.drain_metrics(es)
        ep_keys = sorted(ep_metrics)
        mean_reward = jnp.mean(b_rewards)
        mean_done = jnp.mean(b_dones)
        v_mom = rms_moments(b_vals)
        r_mom = rms_moments(b_returns)
        if ax is not None:
            obs_rms, (v_mom, r_mom), rmax, scal = self._boundary_merge(
                ax, ts.obs_rms, obs_rms, (v_mom, r_mom),
                es.running_max,
                jnp.stack([ep_metrics[k] for k in ep_keys]
                          + [mean_reward, mean_done]),
                sum_scaled=jnp.array(
                    [1.0 if k == "Episode/count" else self._inv_dev
                     for k in ep_keys] + [self._inv_dev, self._inv_dev],
                    dtype=jnp.float32),
            )
            es = es._replace(running_max=rmax)
            ep_metrics = dict(zip(ep_keys, scal[:len(ep_keys)]))
            mean_reward, mean_done = scal[len(ep_keys)], scal[len(ep_keys) + 1]

        value_rms = rms_merge_moments(ts.value_rms, *v_mom)
        b_vals = rms_normalize(value_rms, b_vals)
        value_rms = rms_merge_moments(value_rms, *r_mom)
        b_returns = rms_normalize(value_rms, b_returns)

        # ---- minibatch SGD (HOT LOOP #3, cleanrl/ppo.py:294-354) ----
        mb_size = cfg.minibatch_size // self.num_devices
        n_minibatches = nb // mb_size

        def loss_fn(params, mb, adv_mom):
            """Collective discipline v2 (module docstring): the loss body
            itself issues NO collectives. The adv-norm moments arrive
            precomputed per epoch (advantages are fixed for the iteration,
            so each minibatch's global moments are known at permutation
            time — one fused (n_minibatches, 2) pmean per epoch in
            epoch_step); every other component reduces LOCALLY — valid
            because shards are equal-sized and the gradient is pmean'd
            after value_and_grad (local-mean loss + grad pmean == grad of
            the global-mean loss); the scalar stats ride the grad pmean."""
            obs, act, old_logp, adv, ret, old_val = mb
            mean, log_std, newvalue = self.net.apply(params, obs)
            newlogp = networks.gaussian_logp(mean, log_std, act)
            entropy = networks.gaussian_entropy(log_std, act)
            logratio = newlogp - old_logp
            ratio = jnp.exp(logratio)

            if cfg.norm_adv:
                m = adv_mom[0]
                s = jnp.sqrt(
                    jnp.maximum(adv_mom[1] - jnp.square(adv_mom[0]), 0.0)
                )
                adv = (adv - m) / (s + 1e-8)

            pg1 = -adv * ratio
            pg2 = -adv * jnp.clip(ratio, 1 - cfg.clip_coef, 1 + cfg.clip_coef)
            pg_loss = jnp.mean(jnp.maximum(pg1, pg2))

            newvalue_n = rms_normalize(value_rms, newvalue)
            if cfg.clip_vloss:
                v_unclipped = jnp.square(newvalue_n - ret)
                v_clipped_val = old_val + jnp.clip(
                    newvalue_n - old_val, -cfg.clip_coef, cfg.clip_coef
                )
                v_clipped = jnp.square(v_clipped_val - ret)
                v_loss = 0.5 * jnp.mean(jnp.maximum(v_unclipped, v_clipped))
            else:
                v_loss = 0.5 * jnp.mean(jnp.square(newvalue_n - ret))

            ent_loss = jnp.mean(entropy)
            total = pg_loss - cfg.ent_coef * ent_loss + v_loss * cfg.vf_coef
            approx_kl = jnp.mean((ratio - 1.0) - logratio)
            clipfrac = jnp.mean(
                (jnp.abs(ratio - 1.0) > cfg.clip_coef).astype(jnp.float32)
            )
            return total, (pg_loss, v_loss, ent_loss, approx_kl, clipfrac)

        def sgd_step(carry, xs):
            mb_idx, adv_mom = xs
            params, opt_state, lr, perm_data = carry
            mb = jax.tree.map(
                lambda x: jax.lax.dynamic_slice_in_dim(
                    x, mb_idx * mb_size, mb_size, axis=0
                ),
                perm_data,
            )
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, mb, adv_mom
            )
            if ax is not None:
                # the 5 scalar stats ride the grad pmean as extra pytree
                # leaves — XLA's all-reduce combiner lowers the whole thing
                # to ONE collective
                grads, aux_v = jax.lax.pmean((grads, jnp.stack(aux)), ax)
                aux = tuple(aux_v)
                loss = aux[0] - cfg.ent_coef * aux[2] + aux[1] * cfg.vf_coef
            updates, opt_state = self.tx.update(grads, opt_state, params)
            updates = jax.tree.map(lambda u: -lr * u, updates)
            params = optax.apply_updates(params, updates)
            if mode == "adaptive_kl":
                # per minibatch, on the pmean'd KL — mirroring skrl's KL
                # all_reduce (ppo.py:562-564)
                lr = adaptive_kl_lr(
                    lr, aux[3], cfg.kl_target, cfg.lr_min, cfg.lr_max
                )
            return (params, opt_state, lr, perm_data), (loss,) + aux

        def epoch_step(carry, k_epoch):
            params, opt_state, lr = carry
            perm = jax.random.permutation(k_epoch, nb)
            data = (b_obs, b_actions, b_logprobs, b_adv, b_returns, b_vals)
            perm_data = jax.tree.map(lambda x: x[perm], data)
            # per-epoch adv-norm moments: one fused (n_minibatches, 2)
            # pmean instead of one (2,) pmean per minibatch — exact, since
            # the advantages don't change within the iteration
            adv_mb = perm_data[3].reshape(n_minibatches, mb_size)
            adv_moms = jnp.stack(
                [jnp.mean(adv_mb, axis=1),
                 jnp.mean(jnp.square(adv_mb), axis=1)], axis=1,
            )
            if ax is not None:
                adv_moms = jax.lax.pmean(adv_moms, ax)
            (params, opt_state, lr, _), stats = jax.lax.scan(
                sgd_step, (params, opt_state, lr, perm_data),
                (jnp.arange(n_minibatches), adv_moms),
            )
            if mode == "adaptive_kl_epoch":
                # skrl: one step per epoch on the epoch-mean KL. Each
                # minibatch KL in stats is already pmean'd across chips, so
                # the mean over minibatches equals skrl's all-reduced mean.
                lr = adaptive_kl_lr(
                    lr, jnp.mean(stats[4]), cfg.kl_target,
                    cfg.lr_min, cfg.lr_max,
                )
            return (params, opt_state, lr), stats

        key, k_perm = jax.random.split(key)
        epoch_keys = jax.random.split(k_perm, cfg.updates_epochs)
        (params, opt_state, lr), stats = jax.lax.scan(
            epoch_step, (ts.params, ts.opt_state, lr), epoch_keys
        )
        loss, pg_loss, v_loss, ent_loss, approx_kl, clipfrac = (
            jax.tree.map(jnp.mean, stats)
        )

        # episode metrics were drained + cross-shard merged in the boundary
        # collective above (discipline v2)
        metrics = {
            "Loss/mean_surrogate_loss": loss,
            "Loss/mean_pg_loss": pg_loss,
            "Loss/mean_v_loss": v_loss,
            "Loss/mean_entropy_loss": ent_loss,
            "Loss/approx_kl": approx_kl,
            "Loss/clipfrac": clipfrac,
            "Train/mean_reward_per_step": mean_reward,
            "Train/mean_done": mean_done,
            **ep_metrics,
        }

        metrics["Train/learning_rate"] = lr

        new_ts = TrainState(
            params=params, opt_state=opt_state,
            obs_rms=obs_rms, value_rms=value_rms,
            iteration=ts.iteration + 1, lr=lr, key=next_ts_key,
            next_obs=next_obs, next_done=next_done,
            next_true_done=next_tdone,
        )
        return new_ts, es, metrics


def adaptive_kl_lr(lr, kl, kl_target: float, lr_min: float, lr_max: float):
    """rl_games AdaptiveScheduler.update / skrl KLAdaptiveLR step.

    (rl_games schedulers.AdaptiveScheduler: kl > 2*threshold -> lr/1.5
    floored at min_lr; kl < threshold/2 -> lr*1.5 capped at max_lr;
    configured via rl_games_cat_solo.yaml:43-45.)
    """
    return jnp.where(
        kl > 2.0 * kl_target,
        jnp.maximum(lr / 1.5, lr_min),
        jnp.where(
            kl < 0.5 * kl_target,
            jnp.minimum(lr * 1.5, lr_max),
            lr,
        ),
    )


