"""Go2-class quadruped model (compiled from assets/go2.urdf by
tools/compile_go2.py).

Second robot family: demonstrates that new robots are config-only
(SURVEY.md §7.1 item 3 — "term = fn + indices + params ... so new
robots/tasks are config-only"). Gains follow common Go2-class RL recipes
(stiffness 25, damping 0.5, action scale 0.25).
"""

import functools
import os

from cat_tpu.sim.model import RobotModel

_JSON = os.path.join(os.path.dirname(__file__), "go2_model.json")

GO2_KP = 25.0
GO2_KD = 0.5

GO2_ACTUATED_JOINT_ORDER = (
    "FL_hip_joint", "FL_thigh_joint", "FL_calf_joint",
    "FR_hip_joint", "FR_thigh_joint", "FR_calf_joint",
    "RL_hip_joint", "RL_thigh_joint", "RL_calf_joint",
    "RR_hip_joint", "RR_thigh_joint", "RR_calf_joint",
)


@functools.lru_cache(maxsize=1)
def go2_model() -> RobotModel:
    with open(_JSON) as f:
        return RobotModel.from_json(f.read())
