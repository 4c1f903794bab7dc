"""CatEnv: the fully-jitted constrained locomotion environment.

TPU-native replacement for the reference's CaTEnv.step pipeline
(cat_env.py:42-147) and the Isaac Lab manager stack it orchestrates. One
``step(state, action)`` call performs, in the reference's exact order:

  1. action processing (store raw action / prev action)
  2. decimation x physics substeps (PD target = default + scale*action)
  3. episode/common counters
  4. terminations: time_out | illegal_contact | upside_down
  5. CaT constraints -> cstr_prob; reward = clip(r * (1 - p), min=0);
     dones = cstr_prob with hard-reset envs forced to 1.0
  6. masked auto-reset (reset events, episode-stat accumulation)
  7. command schedule + deadzone/resample/yaw-flip logic
  8. interval push events
  9. observation build (optionally noise-corrupted)

Everything is one pure function of (EnvState, action): no host sync, no
dynamic shapes; resets are lax-select masks (SURVEY.md §7.3 hard part #3).

Randomness: one step key derived from (per-shard seed, common_step), all
draws are full (N, ...) shaped tensors — per-env vmapped key-splitting
profiled ~1000x the arithmetic cost on TPU. Shards stay decorrelated because
the seed array is sharded with the env axis and each shard folds in its own
seed[0].
"""

from __future__ import annotations

import dataclasses
import re
from typing import Callable, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cat_tpu.sim import engine as engine_mod
from cat_tpu.sim import terrain as terrain_mod
from cat_tpu.sim.engine import EngineParams, SimState
from cat_tpu.sim.maths import quat_from_euler_zyx, quat_rotate_inv, quat_yaw
from cat_tpu.sim.model import RobotModel
from cat_tpu.sim.terrain import Terrain

from .cat import ConstraintSet, ConstraintTerm, curriculum_max_p
from .types import EnvState, StepData


# --------------------------------------------------------------------------
# Config dataclasses (frozen; the reference's configclass tree, SURVEY.md §5.6)
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class CommandsCfg:
    """UniformVelocityCommandWithDeadzone (reference mdp/commands.py:19-100,
    cat_flat_env_cfg.py:96-107)."""
    lin_vel_x: Tuple[float, float] = (-0.3, 1.0)
    lin_vel_y: Tuple[float, float] = (-0.7, 0.7)
    ang_vel_z: Tuple[float, float] = (-0.78, 0.78)
    resampling_time: float = 10.0
    rel_standing_envs: float = 0.02
    velocity_deadzone: float = 0.1


class EventTerm(NamedTuple):
    """A config-extensible event term (Isaac Lab EventManager mode parity,
    reference cat_flat_env_cfg.py:182-239 `mode="startup"/"reset"/"interval"`).

    The built-in recipe events (friction buckets, reset randomization,
    pushes, CoM shifts) stay first-class cfg fields below; `extra_terms`
    lets a task add events without touching the env, with the same three
    firing modes. Pure-function signatures (all batched, key-threaded):

      startup : func(key, n, model, **params) -> dict of EnvState field
                updates (e.g. {"mu": ..., "com_offset": ...}); applied once
                in init().
      reset   : func(key, sim: SimState, rmask (N,) bool, model, **params)
                -> SimState; applied after the masked auto-reset merge, so
                it sees freshly-reset envs (guard updates with rmask).
      interval: func(key, sim: SimState, state: EnvState, cfg, **params)
                -> SimState; applied every control step at the same point
                as the built-in push event (after resets, before
                observations — the reference's interval slot).
    """
    name: str
    mode: str
    func: Callable
    params: Optional[Dict] = None


@dataclasses.dataclass(frozen=True)
class EventsCfg:
    """Domain randomization (cat_flat_env_cfg.py:182-239, mdp/events.py)."""
    friction_range: Tuple[float, float] = (0.5, 1.25)   # startup, per env
    # friction is drawn from `friction_num_buckets` discrete values sampled
    # once from the range (randomize_rigid_body_material num_buckets=100,
    # cat_flat_env_cfg.py:186-196); 0 = continuous per-env sampling
    friction_num_buckets: int = 100
    reset_pose_xy: float = 0.05
    reset_yaw: float = 1.57
    reset_joint_scale: Tuple[float, float] = (0.95, 1.05)
    push_vel_xy: float = 0.5
    push_enabled: bool = True
    # randomize_body_coms startup event (reference events.py:20-56): each
    # body's CoM is shifted by U(-d, d)^3 in its body frame, per env. The
    # Solo12 flat recipe does not enable it (not in its EventCfg), so the
    # default is 0 (off); set >0 for DR-parity experiments.
    com_displacement: float = 0.0
    com_bodies: Tuple[str, ...] = (".*",)
    # additional EventTerm entries (any mode); fired alongside the built-ins
    extra_terms: Tuple[EventTerm, ...] = ()


@dataclasses.dataclass(frozen=True)
class NoiseCfg:
    """AdditiveUniformNoise per obs term (cat_flat_env_cfg.py:140-176)."""
    enabled: bool = True
    ang_vel: float = 0.001
    gravity: float = 0.05
    joint_pos: float = 0.01
    joint_vel: float = 0.2


@dataclasses.dataclass(frozen=True)
class RewardsCfg:
    """Two tracking terms only (cat_flat_env_cfg.py:242-256)."""
    lin_weight: float = 1.0
    ang_weight: float = 0.5
    std2: float = 0.25     # sigma^2 in exp(-err/sigma^2)


@dataclasses.dataclass(frozen=True)
class TerminationsCfg:
    """(cat_flat_env_cfg.py:358-377)"""
    upside_down_limit: float = 0.1
    contact_threshold: float = 1.0


@dataclasses.dataclass(frozen=True)
class HeightScanCfg:
    """Height-scanner observation grid (Isaac Lab height_scan equivalent,
    for the rough-terrain task — BASELINE.json config #3)."""
    size_x: float = 1.6
    size_y: float = 1.0
    resolution: float = 0.1
    offset_z: float = 0.5      # obs = clip(base_z - offset - h, lo, hi)
    clip: float = 1.0
    noise: float = 0.1

    @property
    def num_points(self) -> int:
        nx = int(round(self.size_x / self.resolution)) + 1
        ny = int(round(self.size_y / self.resolution)) + 1
        return nx * ny

    def grid(self) -> np.ndarray:
        xs = np.linspace(-self.size_x / 2, self.size_x / 2,
                         int(round(self.size_x / self.resolution)) + 1)
        ys = np.linspace(-self.size_y / 2, self.size_y / 2,
                         int(round(self.size_y / self.resolution)) + 1)
        gx, gy = np.meshgrid(xs, ys, indexing="ij")
        return np.stack([gx.ravel(), gy.ravel()], axis=-1)  # (P, 2)


@dataclasses.dataclass(frozen=True)
class EnvCfg:
    num_envs: int = 4096
    episode_length_s: float = 10.0
    sim_dt: float = 0.005
    decimation: int = 4
    action_scale: float = 0.5          # JointPositionAction scale (cfg:130)
    curriculum_steps: int = 24 * 1000  # modify_constraint_p num_steps
    commands: CommandsCfg = CommandsCfg()
    events: EventsCfg = EventsCfg()
    noise: NoiseCfg = NoiseCfg()
    rewards: RewardsCfg = RewardsCfg()
    terminations: TerminationsCfg = TerminationsCfg()
    kp: float = 4.0
    kd: float = 0.2
    # PGS sweep count override (None = SolverParams default 5, the PhysX
    # 4+1 budget); exposed for solver-stiffness ablations
    solver_iterations: Optional[int] = None
    # PGS sweep structure: "gs" or "bj:<n_blocks>[:<omega>[:<iters>]]"
    # (block-Jacobi, ops/pgs_pallas.py); None = SolverParams default
    # (serial GS). Default bj:4:0.9:6 from the round-5 sweep-structure
    # A/B (runs/profile/perf_r5.md): +8% end-to-end over GS-5 on chip
    # AND strictly better convergence on captured physical problems
    # (pgs_structure_probe.json: imp_err .037 vs .052, worst residual
    # .17 vs .30). Raw-engine users (SolverParams) keep GS-5.
    solver_structure: Optional[str] = "bj:4:0.9:6"
    terrain: Terrain = terrain_mod.plane()
    height_scan: Optional[HeightScanCfg] = None
    terrain_curriculum: bool = False   # promote/demote difficulty rows

    @property
    def step_dt(self) -> float:
        return self.sim_dt * self.decimation

    @property
    def max_episode_length(self) -> int:
        return int(round(self.episode_length_s / self.step_dt))


# --------------------------------------------------------------------------
# Name resolution (SceneEntityCfg regex equivalents)
# --------------------------------------------------------------------------

def resolve_names(patterns: Sequence[str], names: Sequence[str],
                  preserve_order: bool = False) -> np.ndarray:
    """Resolve regex patterns to indices.

    preserve_order=True: indices follow the PATTERN list order (the
    reference's preserve_order joint indexing, cat_flat_env_cfg.py:159);
    otherwise they follow the name-list order.
    """
    out = []
    if preserve_order:
        for p in patterns:
            rx = re.compile(p + "$")
            matched = [i for i, n in enumerate(names) if rx.match(n)]
            out.extend(matched)
    else:
        for i, n in enumerate(names):
            if any(re.compile(p + "$").match(n) for p in patterns):
                out.append(i)
    assert out, f"no match for {patterns} in {names}"
    return np.array(out, dtype=np.int32)


def _uniform(key, shape, lo, hi):
    return jax.random.uniform(key, shape, minval=lo, maxval=hi)


# --------------------------------------------------------------------------
# The environment
# --------------------------------------------------------------------------

class CatEnv:
    """Builds the jitted step/reset for a robot model + config + constraints."""

    def __init__(
        self,
        model: RobotModel,
        cfg: EnvCfg,
        constraint_terms: Sequence[ConstraintTerm],
        actuated_joint_order: Sequence[str],
        illegal_contact_bodies: Sequence[str] = ("base_link", ".*_UPPER_LEG"),
    ):
        self.model = model
        self.cfg = cfg
        self.num_actions = model.nj
        # task-order joint view: t2m[j] = model joint index of task joint j
        self.t2m = resolve_names(
            list(actuated_joint_order), model.joint_names, preserve_order=True
        )
        m2t = np.empty(model.nj, dtype=np.int32)
        m2t[self.t2m] = np.arange(model.nj, dtype=np.int32)
        self.m2t = m2t                  # model order -> task order gather
        self.default_joint_pos_task = jnp.asarray(
            model.default_qpos_joints[self.t2m], dtype=jnp.float32
        )
        self.illegal_ids = resolve_names(
            list(illegal_contact_bodies), model.report_names
        )

        params = EngineParams(
            dt=cfg.sim_dt, decimation=cfg.decimation, kp=cfg.kp, kd=cfg.kd,
        )
        if cfg.solver_iterations is not None:
            params = params._replace(
                solver=params.solver._replace(
                    iterations=cfg.solver_iterations
                )
            )
        if cfg.solver_structure is not None:
            parts = cfg.solver_structure.split(":")
            sp = params.solver._replace(structure=parts[0])
            if len(parts) > 1:
                sp = sp._replace(bj_blocks=int(parts[1]))
            if len(parts) > 2:
                sp = sp._replace(omega=float(parts[2]))
            if len(parts) > 3 and cfg.solver_iterations is None:
                # explicit solver_iterations (ablations) wins over the
                # structure string's iteration count
                sp = sp._replace(iterations=int(parts[3]))
            params = params._replace(solver=sp)
        self._engine_step = engine_mod.make_batched_step(
            model, params, num_envs=cfg.num_envs, terrain=cfg.terrain
        )

        probe = self._probe_data(2)  # column-count probe for the term layout
        self.cset = ConstraintSet(constraint_terms, probe)
        self.num_obs = 9 + 3 * self.num_actions  # 45 for Solo12
        if cfg.height_scan is not None:
            self._scan_grid = jnp.asarray(cfg.height_scan.grid(),
                                          dtype=jnp.float32)
            self.num_obs += cfg.height_scan.num_points

    # ---------------- helpers ----------------

    def _probe_data(self, n: int) -> StepData:
        nj, nr = self.model.nj, self.model.nreport
        nf = len(self.model.foot_report_ids)
        z = jnp.zeros
        return StepData(
            joint_pos=z((n, nj)), joint_vel=z((n, nj)), joint_acc=z((n, nj)),
            applied_torque=z((n, nj)),
            default_joint_pos=self.default_joint_pos_task,
            base_pos=z((n, 3)), base_yaw=z((n,)), base_lin_vel_b=z((n, 3)),
            base_ang_vel_b=z((n, 3)), projected_gravity=z((n, 3)),
            command=z((n, 3)), action=z((n, nj)), prev_action=z((n, nj)),
            force_hist=z((n, 3, nr, 3)), touchdown=z((n, nf), dtype=bool),
            last_air_time=z((n, nf)), step_dt=self.cfg.step_dt,
        )

    def _step_data(self, sim: SimState, command, action, prev_action) -> StepData:
        n = command.shape[0]
        nr = self.model.nreport
        quat = sim.qpos[:, 3:7]
        g_dir = jnp.array([0.0, 0.0, -1.0])
        proj_g = quat_rotate_inv(quat, jnp.broadcast_to(g_dir, quat[:, :3].shape))
        lin_b = quat_rotate_inv(quat, sim.qvel[:, 0:3])
        t2m = self.t2m
        return StepData(
            joint_pos=sim.qpos[:, 7:][:, t2m],
            joint_vel=sim.qvel[:, 6:][:, t2m],
            joint_acc=sim.joint_acc[:, t2m],
            applied_torque=sim.applied_torque[:, t2m],
            default_joint_pos=self.default_joint_pos_task,
            base_pos=sim.qpos[:, 0:3],
            base_yaw=quat_yaw(quat),
            base_lin_vel_b=lin_b,
            base_ang_vel_b=sim.qvel[:, 3:6],   # already body frame
            projected_gravity=proj_g,
            command=command,
            action=action,
            prev_action=prev_action,
            force_hist=sim.force_hist.reshape(n, 3, nr, 3),
            touchdown=sim.touchdown,
            last_air_time=sim.last_air_time,
            step_dt=self.cfg.step_dt,
        )

    # ---------------- init / reset ----------------

    def init(self, key: jnp.ndarray, num_envs: Optional[int] = None) -> EnvState:
        n = num_envs or self.cfg.num_envs
        nj = self.model.nj
        ev = self.cfg.events
        k_seed, k_mu, k_cmd, k_rst, k_lvl, k_com = jax.random.split(key, 6)
        seed = jax.random.bits(k_seed, (n,), jnp.uint32)
        # startup friction randomization (physics_material event,
        # cat_flat_env_cfg.py:186-196; terrain friction 1.0, multiply-combine).
        # PhysX shares materials through `num_buckets` discrete values; we
        # reproduce that by sampling the bucket table then assigning each env
        # a random bucket.
        if ev.friction_num_buckets > 0:
            kb, ka = jax.random.split(k_mu)
            buckets = _uniform(
                kb, (ev.friction_num_buckets,), *ev.friction_range
            )
            mu = buckets[
                jax.random.randint(ka, (n,), 0, ev.friction_num_buckets)
            ]
        else:
            mu = _uniform(k_mu, (n,), *ev.friction_range)
        # randomize_body_coms startup event (events.py:20-56)
        if ev.com_displacement > 0.0:
            body_ids = resolve_names(list(ev.com_bodies), self.model.body_names)
            mask = np.zeros((self.model.nbody, 1), dtype=np.float32)
            mask[body_ids] = 1.0
            com_offset = _uniform(
                k_com, (n, self.model.nbody, 3),
                -ev.com_displacement, ev.com_displacement,
            ) * jnp.asarray(mask)[None]
        else:
            com_offset = jnp.zeros((n, self.model.nbody, 3))
        cmd = self._sample_commands(k_cmd, n)
        nt = self.cset.n_terms
        # terrain patch assignment (curriculum spawning; flat -> all zeros)
        terr = self.cfg.terrain
        if terr.kind == "hfield":
            init_max_row = max(1, terr.rows // 2)
            trow = jax.random.randint(k_lvl, (n,), 0, init_max_row,
                                      dtype=jnp.int32)
            tcol = jnp.arange(n, dtype=jnp.int32) % terr.cols
            origin = self._patch_origins(trow, tcol)
        else:
            trow = jnp.zeros(n, dtype=jnp.int32)
            tcol = jnp.zeros(n, dtype=jnp.int32)
            origin = jnp.zeros((n, 2))
        state = EnvState(
            sim=self._reset_sim(k_rst, n, origin),
            action=jnp.zeros((n, nj)), prev_action=jnp.zeros((n, nj)),
            episode_len=jnp.zeros(n, dtype=jnp.int32),
            command=cmd,
            command_time_left=jnp.full(n, self.cfg.commands.resampling_time),
            mu=mu, com_offset=com_offset,
            running_max=self.cset.init_running_max(),
            max_p=self.cset.init_max_p(),
            episode_viol=jnp.zeros((n, nt)), episode_prob=jnp.zeros((n, nt)),
            episode_rew=jnp.zeros(n),
            origin=origin, terrain_row=trow, terrain_col=tcol,
            common_step=jnp.zeros((), dtype=jnp.int32),
            seed=seed,
            acc_viol=jnp.zeros(nt), acc_prob=jnp.zeros(nt),
            acc_rew=jnp.zeros(()), acc_len=jnp.zeros(()),
            acc_count=jnp.zeros(()), acc_term=jnp.zeros(3),
        )
        # extensible startup events (EventTerm mode="startup")
        for i, t in enumerate(ev.extra_terms):
            if t.mode == "startup":
                updates = t.func(jax.random.fold_in(k_rst, 1000 + i), n,
                                 self.model, **(t.params or {}))
                state = state._replace(**updates)
        return state

    def _patch_origins(self, row: jnp.ndarray, col: jnp.ndarray) -> jnp.ndarray:
        """World xy of patch centers for (row, col) arrays."""
        t = self.cfg.terrain
        H, W = t.size_m
        x = (row.astype(jnp.float32) + 0.5) * t.patch_m - H / 2.0
        y = (col.astype(jnp.float32) + 0.5) * t.patch_m - W / 2.0
        return jnp.stack([x, y], axis=-1)

    def _sample_commands(self, key: jnp.ndarray, n: int) -> jnp.ndarray:
        """Uniform command sample + standing-env zeroing (Isaac Lab
        UniformVelocityCommand._resample_command + rel_standing_envs)."""
        c = self.cfg.commands
        u = jax.random.uniform(key, (n, 4))
        lo = jnp.array([c.lin_vel_x[0], c.lin_vel_y[0], c.ang_vel_z[0]])
        hi = jnp.array([c.lin_vel_x[1], c.lin_vel_y[1], c.ang_vel_z[1]])
        cmd = lo + (hi - lo) * u[:, :3]
        standing = u[:, 3] < c.rel_standing_envs
        return jnp.where(standing[:, None], 0.0, cmd)

    def _reset_sim(self, key: jnp.ndarray, n: int,
                   origin: jnp.ndarray) -> SimState:
        """Fresh randomized sim states for ALL envs (masked-selected later).

        Events: reset_root_state_uniform (pose x/y +-0.05, yaw +-1.57,
        velocity_range all zero) and reset_joints_by_scale
        (q = default * U(0.95, 1.05), qd = default_qd * U(-0.05, 0.05))
        (cat_flat_env_cfg.py:198-225). NOTE reset_joints_by_scale SCALES the
        default joint velocity — which is 0 for Solo12
        (odri.py init_state joint_vel={".*": 0.0}) — so qd = 0 at reset is
        exact reference parity, not a deviation. Spawn is at the env's
        terrain-patch origin (flat: world origin).
        """
        model, ev = self.model, self.cfg.events
        nj = model.nj
        u = jax.random.uniform(key, (n, 3 + nj))
        xy = origin + (2.0 * u[:, 0:2] - 1.0) * ev.reset_pose_xy
        yaw = (2.0 * u[:, 2] - 1.0) * ev.reset_yaw
        quat = quat_from_euler_zyx(jnp.zeros(n), jnp.zeros(n), yaw)
        lo, hi = ev.reset_joint_scale
        scale = lo + (hi - lo) * u[:, 3:]
        qj = jnp.asarray(model.default_qpos_joints)[None, :] * scale
        qj = jnp.clip(qj, jnp.asarray(model.joint_limit_lower),
                      jnp.asarray(model.joint_limit_upper))
        # spawn ABOVE the local terrain: patches' spawn pads sit at the
        # patch's platform height (terrain.generate_rough), not at z=0, so
        # the base z offset rides on a terrain height query (flat: +0).
        h0 = terrain_mod.height_at(self.cfg.terrain, xy)
        z = (model.default_base_pos[2] + h0)[:, None]
        qpos = jnp.concatenate([xy, z, quat, qj], axis=1).astype(jnp.float32)
        base = engine_mod.init_state(model)
        batched = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n,) + x.shape), base
        )
        return batched._replace(qpos=qpos)

    def observe(self, state: EnvState) -> jnp.ndarray:
        """Observation of the current state (the reset obs, cleanrl/ppo.py:186)."""
        data = self._step_data(
            state.sim, state.command, state.action, state.prev_action
        )
        # mix ALL per-env seeds into the noise key (not just seed[0]): under
        # sharding each shard's seed slice differs, so shards decorrelate even
        # when observe runs outside shard_map on the global batch.
        seed_mix = jax.lax.reduce(
            state.seed, jnp.uint32(0), jax.lax.bitwise_xor, (0,)
        )
        k = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(seed_mix),
                               state.common_step), 777
        )
        return self._observations(data, k)

    # ---------------- the step ----------------

    def step(
        self, state: EnvState, raw_action: jnp.ndarray,
        axis_name: Optional[str] = None,
    ):
        """Returns (state', obs, reward, dones(float), time_outs(bool))."""
        cfg = self.cfg
        n = raw_action.shape[0]

        # one step key per shard; all draws are (N, ...) shaped
        k_step = jax.random.fold_in(
            jax.random.PRNGKey(state.seed[0]), state.common_step
        )
        ks = jax.random.split(k_step, 8)

        # 1. action processing (action_manager.process_action, cat_env.py:62)
        prev_action = state.action
        action = raw_action
        target_task = self.default_joint_pos_task + cfg.action_scale * action
        target_model = target_task[:, self.m2t]   # task order -> model order

        # 2. physics (cat_env.py:71-88)
        com_offset = (
            state.com_offset if cfg.events.com_displacement > 0.0 else None
        )
        sim = self._engine_step(state.sim, target_model, state.mu, com_offset)

        # 3. counters
        episode_len = state.episode_len + 1
        common_step = state.common_step + 1

        data = self._step_data(sim, state.command, action, prev_action)

        # 4. terminations (cat_flat_env_cfg.py:358-377)
        time_out = episode_len >= cfg.max_episode_length
        hist = sim.force_hist.reshape(n, 3, self.model.nreport, 3)
        hist_n = jnp.linalg.norm(hist[:, :, self.illegal_ids, :], axis=-1)
        illegal = jnp.any(
            jnp.max(hist_n, axis=1) > cfg.terminations.contact_threshold, axis=1
        )
        upside = (
            jnp.linalg.norm(data.projected_gravity[:, :2], axis=1)
            > cfg.terminations.upside_down_limit
        )
        terminated = illegal | upside
        reset_buf = terminated | time_out

        # 5. CaT constraints + reward (cat_env.py:98-110)
        max_p = curriculum_max_p(
            self.cset.terms, common_step, cfg.curriculum_steps
        )
        cstr_prob, running_max, term_probs, viol = self.cset.compute(
            data, state.running_max, max_p, axis_name=axis_name,
        )
        rw = cfg.rewards
        lin_err = jnp.sum(
            jnp.square(data.command[:, :2] - data.base_lin_vel_b[:, :2]), axis=1
        )
        ang_err = jnp.square(data.command[:, 2] - data.base_ang_vel_b[:, 2])
        base_reward = (
            rw.lin_weight * jnp.exp(-lin_err / rw.std2)
            + rw.ang_weight * jnp.exp(-ang_err / rw.std2)
        ) * cfg.step_dt
        reward = jnp.clip(base_reward * (1.0 - cstr_prob), 0.0, None)
        dones = jnp.where(reset_buf, 1.0, cstr_prob)

        # episode stats (constraint_manager.py:223-227)
        episode_viol = state.episode_viol + viol.astype(jnp.float32)
        episode_prob = state.episode_prob + term_probs
        episode_rew = state.episode_rew + reward

        # 6. masked auto-reset (cat_env.py:118-135, _reset_idx:149-200)
        rmask = reset_buf
        rf = rmask.astype(jnp.float32)
        ep_len_f = jnp.maximum(episode_len.astype(jnp.float32), 1.0)
        acc_viol = state.acc_viol + jnp.sum(
            rf[:, None] * episode_viol / ep_len_f[:, None] * 100.0, axis=0
        )
        acc_prob = state.acc_prob + jnp.sum(
            rf[:, None] * episode_prob / ep_len_f[:, None], axis=0
        )
        acc_rew = state.acc_rew + jnp.sum(rf * episode_rew)
        acc_len = state.acc_len + jnp.sum(rf * episode_len)
        acc_count = state.acc_count + jnp.sum(rf)
        # termination-cause split (priority contact > upside > timeout)
        acc_term = state.acc_term + jnp.stack([
            jnp.sum(illegal.astype(jnp.float32)),
            jnp.sum((upside & ~illegal).astype(jnp.float32)),
            jnp.sum((time_out & ~terminated).astype(jnp.float32)),
        ])

        # terrain curriculum (Isaac Lab terrain_levels_vel equivalent):
        # promoted on a timed-out episode that walked at least half the
        # commanded distance; demoted when it walked less than a quarter.
        origin, trow, tcol = state.origin, state.terrain_row, state.terrain_col
        if cfg.terrain_curriculum and cfg.terrain.kind == "hfield":
            dist = jnp.linalg.norm(sim.qpos[:, 0:2] - origin, axis=1)
            required = (
                jnp.linalg.norm(state.command[:, :2], axis=1)
                * cfg.episode_length_s
            )
            # promote walkers that covered at least half their commanded
            # distance (standing envs are excluded — they would otherwise
            # promote on every survived episode); demote envs that covered
            # under a quarter (standing envs never do: dist < 0 is false).
            # Eligibility gates on COMMANDED SPEED above the standing
            # deadzone, not on an absolute required distance — the latter
            # implicitly couples promotion to episode_length_s and locks
            # out slow-but-valid commands (ADVICE r4).
            moving = (
                jnp.linalg.norm(state.command[:, :2], axis=1)
                > self.cfg.commands.velocity_deadzone
            )
            move_up = time_out & (dist > 0.5 * required) & moving
            move_down = dist < 0.25 * required
            new_row = jnp.clip(
                trow + move_up.astype(jnp.int32) - move_down.astype(jnp.int32),
                0, cfg.terrain.rows - 1,
            )
            trow = jnp.where(rmask, new_row, trow)
            origin = jnp.where(
                rmask[:, None], self._patch_origins(trow, tcol), origin
            )

        fresh_sim = self._reset_sim(ks[0], n, origin)
        sim = jax.tree.map(
            lambda new, old: jnp.where(
                rmask.reshape((n,) + (1,) * (old.ndim - 1)), new, old
            ),
            fresh_sim, sim,
        )
        # extensible reset events (EventTerm mode="reset"): fire on the
        # merged state so they see freshly-reset envs (guarded by rmask)
        for i, t in enumerate(cfg.events.extra_terms):
            if t.mode == "reset":
                sim = t.func(jax.random.fold_in(ks[0], 100 + i), sim,
                             rmask, self.model, **(t.params or {}))
        episode_len = jnp.where(rmask, 0, episode_len)
        episode_viol = jnp.where(rmask[:, None], 0.0, episode_viol)
        episode_prob = jnp.where(rmask[:, None], 0.0, episode_prob)
        episode_rew = jnp.where(rmask, 0.0, episode_rew)
        action = jnp.where(rmask[:, None], 0.0, action)
        prev_action = jnp.where(rmask[:, None], 0.0, prev_action)
        # command manager reset -> resample (Isaac Lab CommandTerm.reset)
        reset_cmd = self._sample_commands(ks[1], n)
        command = jnp.where(rmask[:, None], reset_cmd, state.command)
        time_left = jnp.where(
            rmask, cfg.commands.resampling_time, state.command_time_left
        )

        # 7. command schedule + deadzone logic (commands.py:39-92)
        command, time_left = self._update_commands(
            command, time_left, ks[2], ks[3], ks[4]
        )

        # 8. interval push event (events.py:59-96, cat_flat_env_cfg.py:231-239)
        if cfg.events.push_enabled:
            p_push = cfg.sim_dt / (cfg.episode_length_s * 2.0)
            push = jax.random.uniform(ks[5], (n,)) < p_push
            push_vel = _uniform(
                ks[6], (n, 2), -cfg.events.push_vel_xy, cfg.events.push_vel_xy
            )
            # overwrite the FULL root velocity (z & angular zeroed) as the
            # reference does (events.py:91-96)
            new_qvel = sim.qvel.at[:, 0:2].set(push_vel).at[:, 2:6].set(0.0)
            qvel = jnp.where(push[:, None], new_qvel, sim.qvel)
            sim = sim._replace(qvel=qvel)
        # extensible interval events (EventTerm mode="interval"): the same
        # firing slot as the push (after resets, before observations)
        for i, t in enumerate(cfg.events.extra_terms):
            if t.mode == "interval":
                sim = t.func(jax.random.fold_in(ks[5], 200 + i), sim,
                             state, cfg, **(t.params or {}))

        # 9. observations (cat_flat_env_cfg.py:140-176; order + scales + noise)
        data = self._step_data(sim, command, action, prev_action)
        obs = self._observations(data, ks[7])

        new_state = EnvState(
            sim=sim, action=action, prev_action=prev_action,
            episode_len=episode_len, command=command,
            command_time_left=time_left, mu=state.mu,
            com_offset=state.com_offset,
            origin=origin, terrain_row=trow, terrain_col=tcol,
            running_max=running_max, max_p=max_p,
            episode_viol=episode_viol, episode_prob=episode_prob,
            episode_rew=episode_rew,
            common_step=common_step, seed=state.seed,
            acc_viol=acc_viol, acc_prob=acc_prob, acc_rew=acc_rew,
            acc_len=acc_len, acc_count=acc_count, acc_term=acc_term,
        )
        return new_state, obs, reward, dones, time_out

    def _update_commands(self, command, time_left, k_sched, k_stoch, k_flip):
        """Scheduled resample + deadzone zeroing + stochastic resample +
        yaw-rate sign flip (reference commands.py:39-92). The stochastic
        probabilities use PHYSICS dt (commands.py:36: self.dt = env.physics_dt).
        """
        c, cfg = self.cfg.commands, self.cfg
        n = command.shape[0]
        # scheduled resample every resampling_time seconds
        time_left = time_left - cfg.step_dt
        expired = time_left <= 0.0
        cmd_sched = self._sample_commands(k_sched, n)
        command = jnp.where(expired[:, None], cmd_sched, command)
        time_left = jnp.where(expired, c.resampling_time, time_left)

        # deadzone zeroing: zero unless any |component| > deadzone
        keep = jnp.any(jnp.abs(command) > c.velocity_deadzone, axis=1)
        command = command * keep[:, None].astype(command.dtype)

        # stochastic resample: p = 0.01 idle / dt_phys/T_ep moving
        no_cmd = (
            jnp.linalg.norm(command, axis=1) < c.velocity_deadzone
        ).astype(command.dtype)
        p_res = 0.01 * no_cmd + (cfg.sim_dt / cfg.episode_length_s) * (1 - no_cmd)
        u = jax.random.uniform(k_stoch, (n,))
        resample = u < p_res
        cmd_stoch = self._sample_commands(jax.random.fold_in(k_stoch, 1), n)
        command = jnp.where(resample[:, None], cmd_stoch, command)
        time_left = jnp.where(resample, c.resampling_time, time_left)

        # random yaw-rate inversion
        p_flip = cfg.sim_dt / cfg.episode_length_s
        flip = jax.random.uniform(k_flip, (n,)) < p_flip
        command = command.at[:, 2].multiply(1.0 - 2.0 * flip.astype(command.dtype))
        return command, time_left

    def _observations(self, data: StepData, k_noise) -> jnp.ndarray:
        nz = self.cfg.noise

        def noise(x, mag, idx):
            if not nz.enabled or mag == 0.0:
                return x
            return x + _uniform(
                jax.random.fold_in(k_noise, idx), x.shape, -mag, mag
            )

        parts = [
            noise(data.base_ang_vel_b, nz.ang_vel, 0) * 0.25,
            data.command * jnp.array([2.0, 2.0, 0.25]),
            noise(data.projected_gravity, nz.gravity, 1) * 0.1,
            noise(data.joint_pos, nz.joint_pos, 2),
            noise(data.joint_vel, nz.joint_vel, 3) * 0.05,
            data.action,
        ]
        hs = self.cfg.height_scan
        if hs is not None:
            # yaw-aligned scan grid around the base (Isaac Lab height_scan)
            yaw = data.base_yaw
            cy, sy = jnp.cos(yaw), jnp.sin(yaw)
            gx, gy = self._scan_grid[:, 0], self._scan_grid[:, 1]
            px = data.base_pos[:, 0:1] + cy[:, None] * gx - sy[:, None] * gy
            py = data.base_pos[:, 1:2] + sy[:, None] * gx + cy[:, None] * gy
            pts = jnp.stack([px, py], axis=-1)          # (N, P, 2)
            h = terrain_mod.height_at(self.cfg.terrain, pts)
            scan = jnp.clip(
                data.base_pos[:, 2:3] - hs.offset_z - h, -hs.clip, hs.clip
            )
            if nz.enabled and hs.noise > 0:
                scan = scan + _uniform(
                    jax.random.fold_in(k_noise, 4), scan.shape,
                    -hs.noise, hs.noise,
                )
            parts.append(scan)
        return jnp.concatenate(parts, axis=1)

    # ---------------- metrics ----------------

    def drain_metrics(self, state: EnvState) -> Tuple[EnvState, Dict[str, jnp.ndarray]]:
        """Finished-episode metrics since last drain, then reset accumulators.

        Metric names match the reference for parity checking (SURVEY.md §5.5:
        Episode_Constraint_violation/cstr_* etc.).
        """
        cnt = jnp.maximum(state.acc_count, 1.0)
        metrics = {}
        for i, t in enumerate(self.cset.terms):
            metrics[f"Episode_Constraint_violation/cstr_{t.name}"] = (
                state.acc_viol[i] / cnt
            )
            metrics[f"Episode_Constraint_probability/cstr_{t.name}"] = (
                state.acc_prob[i] / cnt
            )
            metrics[f"Curriculum/{t.name}_max_p"] = state.max_p[i]
            # the CaT normalizer's state: sustained violations inflate the
            # polyak running max, which SOFTENS marginal pressure (p ~
            # violation/rmax) — logging it makes that renormalization
            # visible (diagnoses e.g. the joint_torque violation creep)
            a, b = self.cset.slices[i]
            metrics[f"Constraint_running_max/cstr_{t.name}"] = jnp.mean(
                state.running_max[a:b]
            )
        metrics["Episode/reward"] = state.acc_rew / cnt
        metrics["Episode/length"] = state.acc_len / cnt
        metrics["Episode/count"] = state.acc_count
        # termination-cause fractions of finished episodes (diagnoses e.g.
        # the post-curriculum episode-length decline: which cause rises)
        metrics["Episode/terminated_contact_frac"] = state.acc_term[0] / cnt
        metrics["Episode/terminated_upside_down_frac"] = state.acc_term[1] / cnt
        metrics["Episode/timed_out_frac"] = state.acc_term[2] / cnt
        if self.cfg.terrain.kind == "hfield":
            # mean difficulty row currently assigned (Isaac Lab's
            # Curriculum/terrain_levels gauge; rises as envs get promoted)
            metrics["Curriculum/terrain_levels"] = jnp.mean(
                state.terrain_row.astype(jnp.float32)
            )
        nt = self.cset.n_terms
        state = state._replace(
            acc_viol=jnp.zeros(nt), acc_prob=jnp.zeros(nt),
            acc_rew=jnp.zeros(()), acc_len=jnp.zeros(()),
            acc_count=jnp.zeros(()), acc_term=jnp.zeros(3),
        )
        return state, metrics
