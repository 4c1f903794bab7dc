"""Static robot model description for the batched TPU simulator.

A ``RobotModel`` is a frozen container of plain numpy arrays describing a
kinematic tree of rigid bodies connected by revolute joints to a free-floating
base. It is *static* data: it is closed over by jitted step functions, so XLA
bakes it in as constants (no HBM traffic, full constant folding).

Replaces the capability of the reference's USD/PhysX articulation description
(reference: exts/cat_envs/cat_envs/assets/Robots/odri/solo12_description/
solo12_mpi.urdf and odri.py) with a TPU-native representation:

  * bodies 0..nbody-1 in topological order, body 0 = free-floating base
  * each moving body i>=1 has one revolute joint (dof index i-1)
  * fixed-joint children (e.g. the Solo12 FOOT links, URDF ANKLE joints) are
    merged into their parent for dynamics (inertia composed via parallel-axis)
    but kept as named *sites* and their collision geoms kept as separate
    *report bodies* so contact forces are attributed per original link, the way
    the reference's contact sensor reports per-body net forces.

Generalized coordinates (MuJoCo-style free joint):
  qpos = [base_pos(3), base_quat wxyz(4), q_joints(nj)]      -> nq = 7 + nj
  qvel = [base_linvel_world(3), base_angvel_body(3), qd(nj)] -> nv = 6 + nj
"""

from __future__ import annotations

import dataclasses
import json
from typing import Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class RobotModel:
    # --- topology ---
    body_names: Tuple[str, ...]          # (nbody,) body 0 is the base
    parent: np.ndarray                   # (nbody,) int, parent body index, parent[0] = -1
    # --- joint placement (moving bodies 1..nbody-1; row 0 unused) ---
    joint_pos: np.ndarray                # (nbody, 3) joint origin in parent frame
    joint_rot: np.ndarray                # (nbody, 3, 3) joint frame rotation in parent frame
    joint_axis: np.ndarray               # (nbody, 3) hinge axis in joint/child frame
    joint_names: Tuple[str, ...]         # (nj,) name of joint with dof index d (= body d+1)
    # --- inertial (after fixed-joint merging) ---
    mass: np.ndarray                     # (nbody,)
    com: np.ndarray                      # (nbody, 3) com in body frame
    inertia: np.ndarray                  # (nbody, 3, 3) about com, body frame
    # --- joint properties (nj,) ---
    armature: np.ndarray
    joint_limit_lower: np.ndarray
    joint_limit_upper: np.ndarray
    effort_limit: np.ndarray             # actuator clip (N m)
    velocity_limit: np.ndarray
    # --- default state ---
    default_base_pos: np.ndarray         # (3,)
    default_qpos_joints: np.ndarray      # (nj,)
    # --- contact candidates (fixed-size masked set) ---
    cand_body: np.ndarray                # (ncand,) dynamics body owning the point
    cand_offset: np.ndarray              # (ncand, 3) offset in body frame
    cand_radius: np.ndarray              # (ncand,)
    cand_report: np.ndarray              # (ncand,) index into report_names
    report_names: Tuple[str, ...]        # contact-force reporting slots
    # --- named sites (merged fixed-joint frames, e.g. feet) ---
    site_names: Tuple[str, ...]
    site_body: np.ndarray                # (nsite,)
    site_offset: np.ndarray              # (nsite, 3)
    # foot candidate indices (for air-time tracking): report slots that are feet
    foot_report_ids: np.ndarray          # (nfeet,)
    # --- self-collision capsule pairs (optional; reference enables PhysX
    # self-collisions, odri.py:35 enabled_self_collisions=True). Each pair is
    # capsule-vs-capsule (sphere = degenerate capsule p0 == p1); endpoints in
    # the owning body's frame. Contact rows are appended after the terrain
    # candidates; forces report +f to pair_report_a and -f to pair_report_b.
    pair_body_a: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, dtype=np.int32))      # (npair,)
    pair_p0_a: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 3)))                 # (npair, 3)
    pair_p1_a: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 3)))
    pair_radius_a: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0))                      # (npair,)
    pair_body_b: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, dtype=np.int32))
    pair_p0_b: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 3)))
    pair_p1_b: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 3)))
    pair_radius_b: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0))
    pair_report_a: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, dtype=np.int32))      # (npair,)
    pair_report_b: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, dtype=np.int32))

    @property
    def nbody(self) -> int:
        return len(self.body_names)

    @property
    def nj(self) -> int:
        return self.nbody - 1

    @property
    def nq(self) -> int:
        return 7 + self.nj

    @property
    def nv(self) -> int:
        return 6 + self.nj

    @property
    def ncand(self) -> int:
        """TOTAL contact rows: terrain candidates + self-collision pairs.

        This sizes the impulse state, the Delassus system, and the PGS
        kernel; the terrain-only count is `ncand_terrain`.
        """
        return len(self.cand_body) + len(self.pair_body_a)

    @property
    def ncand_terrain(self) -> int:
        return len(self.cand_body)

    @property
    def npair(self) -> int:
        return len(self.pair_body_a)

    @property
    def nreport(self) -> int:
        return len(self.report_names)

    def ancestor_mask(self) -> np.ndarray:
        """(nbody, nj) bool: mask[b, d] = joint d is on the chain base->body b."""
        nb = self.nbody
        mask = np.zeros((nb, nb - 1), dtype=bool)
        for b in range(1, nb):
            i = b
            while i > 0:
                mask[b, i - 1] = True
                i = int(self.parent[i])
        return mask

    def branches(self):
        """Joint indices grouped by independent branch off the base.

        Two joints are in the same branch iff their base-chains share a
        joint; branches are independent in the mass matrix (zero coupling
        except through the base 6-dof block).
        """
        body_branch = {0: -1}
        branches: list[list[int]] = []
        for b in range(1, self.nbody):
            p = int(self.parent[b])
            if p == 0:
                body_branch[b] = len(branches)
                branches.append([b - 1])
            else:
                body_branch[b] = body_branch[p]
                branches[body_branch[b]].append(b - 1)
        return branches

    def uniform_3dof_branches(self) -> bool:
        """True if every branch is a contiguous 3-dof chain (quadruped legs),
        enabling the closed-form structured mass-matrix inverse."""
        br = self.branches()
        return bool(br) and all(
            len(x) == 3 and x == list(range(x[0], x[0] + 3)) for x in br
        )

    def default_qpos(self) -> np.ndarray:
        q = np.zeros(self.nq, dtype=np.float64)
        q[0:3] = self.default_base_pos
        q[3] = 1.0  # identity quaternion (w,x,y,z)
        q[7:] = self.default_qpos_joints
        return q

    # ---------------- serialization ----------------
    def to_json(self) -> str:
        d = {}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if isinstance(v, np.ndarray):
                d[f.name] = {"__nd__": v.tolist(), "dtype": str(v.dtype)}
            else:
                d[f.name] = list(v)
        return json.dumps(d, indent=1)

    @staticmethod
    def from_json(s: str) -> "RobotModel":
        raw = json.loads(s)
        kw = {}
        for f in dataclasses.fields(RobotModel):
            if f.name not in raw:
                continue  # optional field (e.g. pair_*): keep the default
            v = raw[f.name]
            if isinstance(v, dict) and "__nd__" in v:
                kw[f.name] = np.array(v["__nd__"], dtype=v["dtype"])
            else:
                kw[f.name] = tuple(v)
        return RobotModel(**kw)

    def with_self_collision_pairs(self, specs) -> "RobotModel":
        """Return a copy with self-collision capsule pairs attached.

        specs: iterable of dicts with keys
          body_a, p0_a, p1_a, radius_a, body_b, p0_b, p1_b, radius_b
          and optional report_a / report_b (default: the body's own report
          slot, resolved by name in report_names).
        Bodies are referenced by NAME; endpoints are body-frame points.
        """
        names = list(self.body_names)
        rnames = list(self.report_names)

        def rep(spec, side):
            key = f"report_{side}"
            nm = spec.get(key, spec[f"body_{side}"])
            return rnames.index(nm)

        specs = list(specs)
        return dataclasses.replace(
            self,
            pair_body_a=np.array(
                [names.index(s["body_a"]) for s in specs], dtype=np.int32),
            pair_p0_a=np.array([s["p0_a"] for s in specs], dtype=np.float64
                               ).reshape(-1, 3),
            pair_p1_a=np.array([s["p1_a"] for s in specs], dtype=np.float64
                               ).reshape(-1, 3),
            pair_radius_a=np.array([s["radius_a"] for s in specs]),
            pair_body_b=np.array(
                [names.index(s["body_b"]) for s in specs], dtype=np.int32),
            pair_p0_b=np.array([s["p0_b"] for s in specs], dtype=np.float64
                               ).reshape(-1, 3),
            pair_p1_b=np.array([s["p1_b"] for s in specs], dtype=np.float64
                               ).reshape(-1, 3),
            pair_radius_b=np.array([s["radius_b"] for s in specs]),
            pair_report_a=np.array(
                [rep(s, "a") for s in specs], dtype=np.int32),
            pair_report_b=np.array(
                [rep(s, "b") for s in specs], dtype=np.int32),
        )


def combine_inertia(
    m_a: float, com_a: np.ndarray, I_a: np.ndarray,
    m_b: float, com_b: np.ndarray, I_b: np.ndarray,
) -> Tuple[float, np.ndarray, np.ndarray]:
    """Combine two rigid bodies given in the same frame (parallel-axis)."""
    m = m_a + m_b
    com = (m_a * com_a + m_b * com_b) / m

    def shift(I, mass, c, new_c):
        d = c - new_c
        return I + mass * ((d @ d) * np.eye(3) - np.outer(d, d))

    I = shift(I_a, m_a, com_a, com) + shift(I_b, m_b, com_b, com)
    return m, com, I
