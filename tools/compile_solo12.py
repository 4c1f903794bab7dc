"""Compile the Solo12 URDF into cat_tpu/models/solo12_model.json.

Offline asset pipeline (run once; the JSON is committed so the repo is
standalone). Actuator overrides mirror the reference robot config
(reference: exts/cat_envs/cat_envs/assets/odri.py:43-84 — armature
3.6207e-4, effort limit 10, velocity limit 100, init pos z=0.3, joint
defaults HAA +-0.05 / HFE 0.4 / KFE -0.8).

Usage: python tools/compile_solo12.py [path/to/solo12_mpi.urdf]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cat_tpu.sim.urdf import compile_urdf  # noqa: E402

DEFAULT_URDF = (
    "/root/reference/exts/cat_envs/cat_envs/assets/Robots/odri/"
    "solo12_description/solo12_mpi.urdf"
)

DEFAULT_JOINT_POS = {
    "FL_HAA": 0.05, "FL_HFE": 0.4, "FL_KFE": -0.8,
    "FR_HAA": -0.05, "FR_HFE": 0.4, "FR_KFE": -0.8,
    "HR_HAA": -0.05, "HR_HFE": 0.4, "HR_KFE": -0.8,
    "HL_HAA": 0.05, "HL_HFE": 0.4, "HL_KFE": -0.8,
}


def main():
    urdf = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_URDF
    model = compile_urdf(
        urdf,
        armature=0.00036207,
        effort_limit=10.0,
        velocity_limit=100.0,
        default_joint_pos=DEFAULT_JOINT_POS,
        default_base_pos=(0.0, 0.0, 0.3),
    )
    out = os.path.join(
        os.path.dirname(__file__), "..", "cat_tpu", "models", "solo12_model.json"
    )
    with open(out, "w") as f:
        f.write(model.to_json())
    print(f"bodies={model.nbody} joints={model.nj} cands={model.ncand} "
          f"reports={model.report_names}")
    print(f"total mass={model.mass.sum():.4f} kg")
    print(f"wrote {os.path.abspath(out)}")


if __name__ == "__main__":
    main()
