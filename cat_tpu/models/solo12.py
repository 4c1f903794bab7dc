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


@functools.lru_cache(maxsize=1)
def solo12_model() -> RobotModel:
    with open(_JSON) as f:
        return RobotModel.from_json(f.read())
