"""Terrain: plane and heightfield support for the contact pipeline.

TPU-native replacement for Isaac Lab's TerrainImporter (SURVEY.md §2.2:
plane first, heightfield grid + height-scan later; BASELINE.json config #3
"Rough-terrain Solo12 with height-scan observations and terrain curriculum").

A Terrain is static data (numpy) baked into the jitted step:
  * kind="plane": z=0 everywhere.
  * kind="hfield": a (R, C) height grid with cell size `cell` centered at the
    origin; height/normal queries are bilinear-interpolated gathers — static
    shapes, fully fused.

Procedural generation mirrors the standard Isaac-Lab-style rough recipe:
difficulty rows x type columns of patches (random uniform noise, pyramid
slopes up/down, discrete obstacles), with flat spawn pads at patch centers.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Terrain:
    kind: str = "plane"                   # "plane" | "hfield"
    height: Optional[np.ndarray] = None   # (R, C) float32 meters
    cell: float = 0.1                     # grid cell size (m)
    # patch layout for curriculum spawning
    rows: int = 0                         # difficulty levels
    cols: int = 0                         # terrain types
    patch_m: float = 0.0                  # patch side length (m)

    @property
    def size_m(self) -> Tuple[float, float]:
        if self.kind == "plane":
            return (0.0, 0.0)
        r, c = self.height.shape
        return (r * self.cell, c * self.cell)

    def patch_origin(self, row: int, col: int) -> np.ndarray:
        """World xy of the center of patch (row, col)."""
        H, W = self.size_m
        x = (row + 0.5) * self.patch_m - H / 2.0
        y = (col + 0.5) * self.patch_m - W / 2.0
        return np.array([x, y])


def plane() -> Terrain:
    return Terrain(kind="plane")


def height_at(terrain: Terrain, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear terrain height at world xy; xy (..., 2) -> (...).

    Uses the same packed-cell single-gather scheme as height_grad_at (one
    4-wide gather per query instead of four scalar gathers — the height
    scan issues 187xN of these per control step)."""
    if terrain.kind == "plane":
        return jnp.zeros(xy.shape[:-1])
    h, _, _ = height_grad_at(terrain, xy)
    return h


# packed per-CELL corner table cache, keyed by Terrain identity (a strong
# ref keeps the id stable; terrains are few and long-lived). The table is
# ~4x the grid bytes (~8 MB at production size) — packing it once per
# Terrain instead of at every traced call site keeps retraces cheap and
# guarantees XLA constant dedup sees ONE buffer.
_PACKED_CACHE: dict = {}


def _packed_corners(terrain: Terrain) -> np.ndarray:
    """(R-1)(C-1) x 4 per-cell corner table: the four bilinear corners of a
    cell come back from ONE 4-wide gather instead of four scalar gathers —
    TPU gather cost scales with index count, not slice width."""
    ent = _PACKED_CACHE.get(id(terrain))
    if ent is None or ent[0] is not terrain:
        Hn = np.asarray(terrain.height)
        packed = np.ascontiguousarray(np.stack(
            [Hn[:-1, :-1], Hn[:-1, 1:], Hn[1:, :-1], Hn[1:, 1:]], axis=-1
        ).reshape(-1, 4))
        ent = (terrain, packed)
        _PACKED_CACHE[id(terrain)] = ent
    return ent[1]


def height_grad_at(terrain: Terrain, xy: jnp.ndarray):
    """Bilinear height AND analytic in-cell gradient at world xy.

    Returns (h, dhdx, dhdy), each (...). Shares ONE set of 4 table gathers
    between the height and the gradient (height_at + central-difference
    normal_at costs 20 gathers — 5 height_at calls); the gradient is the
    bilinear patch's own slope, which is exactly the surface the contact
    solver penetrates. Used by the hot contact path (surface_gap);
    normal_at keeps the smoothed central-difference normal for
    observations/diagnostics.
    """
    R, C = terrain.height.shape
    H4 = jnp.asarray(_packed_corners(terrain))
    u = xy[..., 0] / terrain.cell + R / 2.0 - 0.5
    v = xy[..., 1] / terrain.cell + C / 2.0 - 0.5
    u = jnp.clip(u, 0.0, R - 1.001)
    v = jnp.clip(v, 0.0, C - 1.001)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    fu = u - u0
    fv = v - v0
    cell = H4[u0 * (C - 1) + v0]                        # (..., 4)
    h00, h01, h10, h11 = (
        cell[..., 0], cell[..., 1], cell[..., 2], cell[..., 3]
    )
    h = (
        h00 * (1 - fu) * (1 - fv) + h01 * (1 - fu) * fv
        + h10 * fu * (1 - fv) + h11 * fu * fv
    )
    dhdx = ((h10 - h00) * (1 - fv) + (h11 - h01) * fv) / terrain.cell
    dhdy = ((h01 - h00) * (1 - fu) + (h11 - h10) * fu) / terrain.cell
    return h, dhdx, dhdy


def normal_at(terrain: Terrain, xy: jnp.ndarray) -> jnp.ndarray:
    """Unit surface normal at world xy; xy (..., 2) -> (..., 3)."""
    if terrain.kind == "plane":
        n = jnp.zeros(xy.shape[:-1] + (3,))
        return n.at[..., 2].set(1.0)
    eps = terrain.cell
    dx = (
        height_at(terrain, xy + jnp.array([eps, 0.0]))
        - height_at(terrain, xy - jnp.array([eps, 0.0]))
    ) / (2 * eps)
    dy = (
        height_at(terrain, xy + jnp.array([0.0, eps]))
        - height_at(terrain, xy - jnp.array([0.0, eps]))
    ) / (2 * eps)
    n = jnp.stack([-dx, -dy, jnp.ones_like(dx)], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def surface_gap(terrain: Terrain, p: jnp.ndarray,
                probe_r) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Signed gap from sphere centers p (..., 3) to the heightfield surface,
    robust near steep faces and step edges.

    The single-column vertical-gap formula phi = (z - h(xy)) * n_z measures
    distance to the tangent plane at the point's OWN column only — a sphere
    pressed horizontally into a steep face reads the low ground under its
    center and never sees the wall (VERDICT r3 weak #2). This probes K=5
    columns (center + 4 axis offsets of probe_r, the sphere radius): for
    each sample s_i = (xy_i, h_i) with surface normal n_i, the tangent-plane
    distance of the center is d_i = n_i . (p - s_i); the DEEPEST sample
    wins. Near convex edges this under-estimates the true distance slightly
    (both planes extend past the edge) — a conservative, stable
    approximation of PhysX's heightfield narrowphase.

    Returns (d (...,), n (..., 3)) — the winning gap (radius NOT yet
    subtracted) and its surface normal.
    """
    offs = jnp.asarray(
        [[0.0, 0.0], [1.0, 0.0], [-1.0, 0.0], [0.0, 1.0], [0.0, -1.0]],
        dtype=p.dtype,
    )                                                   # (5, 2)
    pr = jnp.broadcast_to(jnp.asarray(probe_r, p.dtype), p.shape[:-1])
    xy = p[..., None, :2] + offs * pr[..., None, None]  # (..., 5, 2)
    h, gx, gy = height_grad_at(terrain, xy)             # (..., 5) each
    inv = jax.lax.rsqrt(1.0 + gx * gx + gy * gy)
    n = jnp.stack([-gx * inv, -gy * inv, inv], axis=-1)  # (..., 5, 3)
    dxy = xy - p[..., None, :2]
    d = (
        -n[..., 0] * dxy[..., 0] - n[..., 1] * dxy[..., 1]
        + n[..., 2] * (p[..., None, 2] - h)
    )                                                   # (..., 5)
    i = jnp.argmin(d, axis=-1)
    d_min = jnp.take_along_axis(d, i[..., None], axis=-1)[..., 0]
    n_min = jnp.take_along_axis(n, i[..., None, None], axis=-2)[..., 0, :]
    return d_min, n_min


# ---------------------------------------------------------------------------
# procedural generation
# ---------------------------------------------------------------------------

def generate_rough(
    rows: int = 10,            # difficulty levels
    cols: int = 8,             # terrain types (cycled over 4 generators)
    patch_m: float = 8.0,
    cell: float = 0.1,
    seed: int = 0,
    # difficulty-interpolated (easy, hard) ranges; the defaults are scaled
    # for Solo12 (0.16 m legs, foot r 0.016 — roughly 1/3 of the ANYmal
    # scale Isaac Lab's ROUGH_TERRAINS_CFG targets)
    noise_amp: Tuple[float, float] = (0.01, 0.05),
    slope: Tuple[float, float] = (0.05, 0.25),
    step_h: Tuple[float, float] = (0.02, 0.08),
) -> Terrain:
    """Difficulty-graded patch grid: noise / slope up / slope down / steps.

    Isaac-Lab convention: every patch's BORDER sits at height 0, so adjacent
    patches join continuously (no inter-patch cliffs); pyramids rise (or
    sink) from the border toward a flat center platform, and the spawn pad
    at each patch center is flat at the platform height (spawn z therefore
    comes from a terrain height query, env._reset_sim).
    """
    rng = np.random.default_rng(seed)
    n = int(round(patch_m / cell))
    grid = np.zeros((rows * n, cols * n), dtype=np.float32)
    pad = max(2, n // 8)  # flat spawn pad at the patch center

    def lerp(lo_hi, d):
        return lo_hi[0] + (lo_hi[1] - lo_hi[0]) * d

    for r in range(rows):
        difficulty = (r + 1) / rows
        for c in range(cols):
            kind = c % 4
            if kind == 0:      # uniform noise (zero-mean; borders stay small)
                amp = lerp(noise_amp, difficulty)
                patch = rng.uniform(-amp, amp, size=(n, n))
            elif kind == 1:    # pyramid: hill rising from border to platform
                patch = _pyramid(n, cell, lerp(slope, difficulty), pad)
            elif kind == 2:    # inverted pyramid: pit
                patch = -_pyramid(n, cell, lerp(slope, difficulty), pad)
            else:              # discrete steps/obstacles
                patch = _steps(n, rng, lerp(step_h, difficulty))
            # flatten the center pad so spawns are safe
            c0 = n // 2
            patch[c0 - pad:c0 + pad, c0 - pad:c0 + pad] = patch[c0, c0]
            grid[r * n:(r + 1) * n, c * n:(c + 1) * n] = patch
    return Terrain(
        kind="hfield", height=grid.astype(np.float32), cell=cell,
        rows=rows, cols=cols, patch_m=patch_m,
    )


def _pyramid(n: int, cell: float, slope: float, pad: int) -> np.ndarray:
    """Height 0 at the patch border, rising at `slope` toward a flat center
    platform of half-width `pad` cells (Isaac Lab pyramid_sloped_terrain)."""
    ax = np.abs(np.arange(n) - n / 2 + 0.5) * cell
    d = np.maximum(ax[:, None], ax[None, :])    # Chebyshev dist from center
    edge = ax.max()
    platform = pad * cell
    rise = np.clip(edge - d, 0.0, edge - platform)
    return (rise * slope).astype(np.float32)


def _steps(n: int, rng, hmax: float) -> np.ndarray:
    blocks = 8
    bs = max(1, n // blocks)
    hs = rng.uniform(-hmax, hmax, size=(blocks + 1, blocks + 1))
    patch = np.zeros((n, n), dtype=np.float32)
    for i in range(blocks + 1):
        for j in range(blocks + 1):
            patch[i * bs:(i + 1) * bs, j * bs:(j + 1) * bs] = hs[i, j]
    return patch[:n, :n]
