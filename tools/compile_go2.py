"""Compile the Go2-class quadruped URDF into cat_tpu/models/go2_model.json.

Second robot family through the offline asset pipeline (the JSON is
committed so the repo is standalone). Actuator values follow public Go2-class
spec sheets: 23.7 Nm joints, 30 rad/s, rotor armature ~0.01 kg m^2 reflected.

Usage: python tools/compile_go2.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cat_tpu.sim.urdf import compile_urdf  # noqa: E402

DEFAULT_URDF = os.path.join(
    os.path.dirname(__file__), "..", "cat_tpu", "models", "assets", "go2.urdf"
)

DEFAULT_JOINT_POS = {
    "FL_hip_joint": 0.1, "FL_thigh_joint": 0.8, "FL_calf_joint": -1.5,
    "FR_hip_joint": -0.1, "FR_thigh_joint": 0.8, "FR_calf_joint": -1.5,
    "RL_hip_joint": 0.1, "RL_thigh_joint": 1.0, "RL_calf_joint": -1.5,
    "RR_hip_joint": -0.1, "RR_thigh_joint": 1.0, "RR_calf_joint": -1.5,
}


def main():
    urdf = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_URDF
    model = compile_urdf(
        urdf,
        armature=0.01,
        effort_limit=23.7,
        velocity_limit=30.0,
        default_joint_pos=DEFAULT_JOINT_POS,
        default_base_pos=(0.0, 0.0, 0.34),
    )
    out = os.path.join(
        os.path.dirname(__file__), "..", "cat_tpu", "models", "go2_model.json"
    )
    with open(out, "w") as f:
        f.write(model.to_json())
    print(f"bodies={model.nbody} joints={model.nj} cands={model.ncand} "
          f"reports={model.report_names}")
    print(f"total mass={model.mass.sum():.4f} kg")
    print(f"wrote {os.path.abspath(out)}")


if __name__ == "__main__":
    main()
