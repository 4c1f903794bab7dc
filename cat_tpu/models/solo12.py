"""Solo12 robot model (compiled from URDF by tools/compile_solo12.py).

The JSON model is committed so the package is standalone; regenerate with the
tool if the source URDF changes. Parity source: reference
solo12_description/solo12_mpi.urdf + odri.py actuator config.
"""

import functools
import os

from cat_tpu.sim.model import RobotModel

_JSON = os.path.join(os.path.dirname(__file__), "solo12_model.json")

# Reference actuator gains (odri.py:81-82): IdealPD stiffness 4.0, damping 0.2.
SOLO12_KP = 4.0
SOLO12_KD = 0.2

# Action/observation joint order used by the reference task
# (cat_flat_env_cfg.py:116-128 — note HR before HL, preserve_order=True).
SOLO12_ACTUATED_JOINT_ORDER = (
    "FL_HAA", "FL_HFE", "FL_KFE",
    "FR_HAA", "FR_HFE", "FR_KFE",
    "HR_HAA", "HR_HFE", "HR_KFE",
    "HL_HAA", "HL_HFE", "HL_KFE",
)


# Self-collision capsule pairs (reference enables PhysX self-collisions,
# odri.py:35 enabled_self_collisions=True). Geometry from the URDF collision
# shapes compiled into solo12_model.json: lower leg = shin capsule
# (0,0,-0.03)..(0,0,-0.13) r=0.01 plus foot sphere at z=-0.16 r=0.02 — the
# pair capsule spans shin+foot with a blended radius; the base box
# (+-0.25, +-0.05, z in [-0.02, 0.08]) is approximated by an x-axis capsule.
_SHIN = dict(p0=(0.0, 0.0, -0.03), p1=(0.0, 0.0, -0.16), r=0.016)
_BASE = dict(p0=(-0.2, 0.0, 0.03), p1=(0.2, 0.0, 0.03), r=0.06)


def _cap_pair(body_a, cap_a, body_b, cap_b, report_a=None, report_b=None):
    d = dict(
        body_a=body_a, p0_a=cap_a["p0"], p1_a=cap_a["p1"],
        radius_a=cap_a["r"],
        body_b=body_b, p0_b=cap_b["p0"], p1_b=cap_b["p1"],
        radius_b=cap_b["r"],
    )
    if report_a:
        d["report_a"] = report_a
    if report_b:
        d["report_b"] = report_b
    return d


SOLO12_SELF_COLLISION_PAIRS = (
    # opposite lower legs (left-right crossing)
    _cap_pair("FL_LOWER_LEG", _SHIN, "FR_LOWER_LEG", _SHIN),
    _cap_pair("HL_LOWER_LEG", _SHIN, "HR_LOWER_LEG", _SHIN),
    # same-side front-hind lower legs (large-stride overlap)
    _cap_pair("FL_LOWER_LEG", _SHIN, "HL_LOWER_LEG", _SHIN),
    _cap_pair("FR_LOWER_LEG", _SHIN, "HR_LOWER_LEG", _SHIN),
    # each lower leg (shin + foot) vs the base box
    _cap_pair("FL_LOWER_LEG", _SHIN, "base_link", _BASE),
    _cap_pair("FR_LOWER_LEG", _SHIN, "base_link", _BASE),
    _cap_pair("HL_LOWER_LEG", _SHIN, "base_link", _BASE),
    _cap_pair("HR_LOWER_LEG", _SHIN, "base_link", _BASE),
)


@functools.lru_cache(maxsize=2)
def solo12_model(self_collisions: bool = True) -> RobotModel:
    with open(_JSON) as f:
        model = RobotModel.from_json(f.read())
    if self_collisions:
        model = model.with_self_collision_pairs(SOLO12_SELF_COLLISION_PAIRS)
    return model
