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
    """Bilinear terrain height at world xy; xy (..., 2) -> (...)."""
    if terrain.kind == "plane":
        return jnp.zeros(xy.shape[:-1])
    H = jnp.asarray(terrain.height)
    R, C = terrain.height.shape
    u = xy[..., 0] / terrain.cell + R / 2.0 - 0.5
    v = xy[..., 1] / terrain.cell + C / 2.0 - 0.5
    u = jnp.clip(u, 0.0, R - 1.001)
    v = jnp.clip(v, 0.0, C - 1.001)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    fu = u - u0
    fv = v - v0
    h00 = H[u0, v0]
    h01 = H[u0, v0 + 1]
    h10 = H[u0 + 1, v0]
    h11 = H[u0 + 1, v0 + 1]
    return (
        h00 * (1 - fu) * (1 - fv) + h01 * (1 - fu) * fv
        + h10 * fu * (1 - fv) + h11 * fu * fv
    )


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


# ---------------------------------------------------------------------------
# procedural generation
# ---------------------------------------------------------------------------

def generate_rough(
    rows: int = 10,            # difficulty levels
    cols: int = 8,             # terrain types (cycled over 4 generators)
    patch_m: float = 8.0,
    cell: float = 0.1,
    seed: int = 0,
) -> Terrain:
    """Difficulty-graded patch grid: noise / slope up / slope down / steps."""
    rng = np.random.default_rng(seed)
    n = int(round(patch_m / cell))
    grid = np.zeros((rows * n, cols * n), dtype=np.float32)
    pad = max(2, n // 8)  # flat spawn pad at the patch center
    for r in range(rows):
        difficulty = (r + 1) / rows
        for c in range(cols):
            kind = c % 4
            if kind == 0:      # uniform noise
                amp = 0.025 + 0.075 * difficulty
                patch = rng.uniform(-amp, amp, size=(n, n))
            elif kind == 1:    # pyramid slope up
                slope = 0.1 + 0.3 * difficulty
                patch = _pyramid(n, cell, slope)
            elif kind == 2:    # pyramid slope down (inverted)
                slope = 0.1 + 0.3 * difficulty
                patch = -_pyramid(n, cell, slope)
            else:              # discrete steps/obstacles
                hmax = 0.03 + 0.12 * difficulty
                patch = _steps(n, rng, hmax)
            # flatten the center pad so spawns are safe
            c0 = n // 2
            patch[c0 - pad:c0 + pad, c0 - pad:c0 + pad] = patch[c0, c0]
            patch -= patch[c0, c0]  # spawn height = 0
            grid[r * n:(r + 1) * n, c * n:(c + 1) * n] = patch
    return Terrain(
        kind="hfield", height=grid.astype(np.float32), cell=cell,
        rows=rows, cols=cols, patch_m=patch_m,
    )


def _pyramid(n: int, cell: float, slope: float) -> np.ndarray:
    ax = np.abs(np.arange(n) - n / 2 + 0.5) * cell
    d = np.maximum(ax[:, None], ax[None, :])
    return ((d.max() - d) * slope).astype(np.float32)


def _steps(n: int, rng, hmax: float) -> np.ndarray:
    blocks = 8
    bs = max(1, n // blocks)
    hs = rng.uniform(-hmax, hmax, size=(blocks + 1, blocks + 1))
    patch = np.zeros((n, n), dtype=np.float32)
    for i in range(blocks + 1):
        for j in range(blocks + 1):
            patch[i * bs:(i + 1) * bs, j * bs:(j + 1) * bs] = hs[i, j]
    return patch[:n, :n]
