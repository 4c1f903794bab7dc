"""Offline trajectory visualizer (replaces the reference's RecordVideo/RTX
rendering path, SURVEY.md §2.2 "Video recording": video capture is not on
the TPU training path; policies are visualized offline from logged qpos).

Reads play_traj.npz (written by scripts/play.py), reconstructs body/foot
positions with the model's FK, and renders (a) a PNG strip chart of base
height / foot heights / base xy, and (b) with --animate, a side-view
stick-figure GIF of the gait (matplotlib pillow writer; this image has no
ffmpeg, so GIF is the animation format).
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
    p.add_argument("--animate", action="store_true",
                   help="also render a side-view stick-figure GIF")
    p.add_argument("--fps", type=int, default=25)
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

    if args.animate:
        import matplotlib.animation as manim

        parent = np.asarray(model.parent)
        stride = max(1, T // 250)          # cap animation length
        frames = range(0, T, stride)
        body_o = np.stack(
            [np.asarray(body_positions(jnp.asarray(qpos[f]))[0])
             for f in frames]
        )  # (F, nbody, 3)

        figa, axa = plt.subplots(figsize=(6, 3.2), dpi=100)
        axa.set_xlabel("x (m)"); axa.set_ylabel("z (m)")
        axa.axhline(0.0, color="#52514e", lw=1)
        segs = [axa.plot([], [], lw=2, color="#2a78d6")[0]
                for _ in range(1, model.nbody)]
        axa.set_ylim(-0.02, 0.45)

        def draw(fi):
            o = body_o[fi]
            axa.set_xlim(o[0, 0] - 0.5, o[0, 0] + 0.5)
            for b in range(1, model.nbody):
                p_ = parent[b]
                segs[b - 1].set_data([o[p_, 0], o[b, 0]],
                                     [o[p_, 2], o[b, 2]])
            return segs

        anim = manim.FuncAnimation(figa, draw, frames=len(body_o))
        gif = os.path.splitext(out)[0] + ".gif"
        anim.save(gif, writer=manim.PillowWriter(fps=args.fps))
        print(f"wrote {gif}")


if __name__ == "__main__":
    main()
