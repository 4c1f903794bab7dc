"""Pallas TPU kernel: fused Delassus assembly + PGS contact solve.

Production path for the contact NCP (SURVEY.md §7.3 hard part #1). The
pure-XLA solver fights TPU tiling no matter the layout: per-contact 3-row
blocks either live on lanes (42x pad waste: every rank-3 update rewrites a
64 MB padded buffer at N=4096 — profiled ~95 ms/control step) or need
unaligned lane slicing (~1000x slowdown). This kernel flips the layout:

  * grid over env tiles of TILE_N=128, envs on the LANE axis,
  * constraint rows (3nc) on sublanes: every per-contact quantity is a
    sublane row -> (TILE_N,) lane vector, every rank-3 update is three
    (3nc, TILE_N) VPU FMAs,
  * A = E M^-1 E^T assembled IN VMEM (never touches HBM) by nv broadcast
    FMAs; symmetry of A means column blocks == row blocks (contiguous),
  * all loops static (python-unrolled); impulses held as per-row values.

HBM traffic per substep: one pass over E/minvEt (~50 MB at N=4096) instead
of tens of GB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 128  # preferred env tile = lane width

# Scoped-VMEM budget for tile selection. The hardware limit is 16 MB; leave
# headroom for Mosaic double-buffering slack and unmodeled temps.
_VMEM_BUDGET = 12 * 2**20


def pick_tile(nc: int, nv: int) -> int:
    """Largest env tile whose kernel VMEM footprint fits the budget.

    Footprint model: A_scratch (n3, n3, tile) + double-buffered operand
    blocks (E, W, b, bias, active, mu, lam0, out) + unrolled stack temps
    (acc/w/lam/inv_d rows). At nc=36 (self-collision on) this picks 128;
    the full (n3, n3, tile) temp the r2 kernel also built is what pushed
    it to 22.4 MB and the compile failure recorded in BENCH_r02.json.
    """
    n3 = 3 * nc
    for tile in (128, 64, 32):
        scratch = n3 * n3 * tile * 4
        blocks = (2 * n3 * nv + 4 * n3 + 2 * nc + 1) * tile * 4
        stack = 5 * n3 * tile * 4
        if scratch + 2 * blocks + stack <= _VMEM_BUDGET:
            return tile
    return 32


def contact_row_dofs(model, anc_mask) -> tuple:
    """Static per-row nonzero dof sets of the contact Jacobian E.

    Terrain rows touch base(0..5) + the owning body's ancestor joints; pair
    rows touch base + the union of both bodies' ancestor joints (the base
    angular columns of a relative Jacobian do not cancel). Exact: the
    ancestor mask multiplies the remaining columns to zero.
    """
    m = np.asarray(anc_mask) != 0
    rows = []

    def ks_for(mask_row):
        return tuple(range(6)) + tuple(
            6 + j for j in range(mask_row.shape[0]) if mask_row[j]
        )

    for c in range(model.ncand_terrain):
        rows += [ks_for(m[model.cand_body[c]])] * 3
    for p in range(model.npair):
        mr = m[model.pair_body_a[p]] | m[model.pair_body_b[p]]
        rows += [ks_for(mr)] * 3
    return tuple(rows)


def _assemble_A(E_ref, W_ref, A_out, n3: int, nv: int, row_dofs: tuple):
    """A[i, j, n] = sum_k E[i, k, n] * W[k, j, n]  (envs on lanes).

    Row-block accumulation: building the full (n3, n3, tile) product as a
    jnp temp doubles the VMEM footprint (a ~6 MB stack allocation on top
    of A_scratch at nc=36 — the BENCH_r02 scoped-VMEM OOM). Accumulate
    each row block with a (n3, tile) temp and store it straight into
    scratch instead.

    row_dofs[r] (static) lists the velocity dofs with NONZERO E[r, k]:
    a quadruped contact row touches base(6) + one or two 3-dof legs, so
    skipping the exactly-zero k terms halves the assembly's serial VPU
    work — the dominant kernel cost alongside the PGS sweep.
    """
    for r in range(n3):
        ks = tuple(range(nv)) if row_dofs is None else row_dofs[r]
        acc = E_ref[r, ks[0], :][None, :] * W_ref[ks[0], :, :]
        for k in ks[1:]:
            acc = acc + E_ref[r, k, :][None, :] * W_ref[k, :, :]
        A_out[r] = acc


def _pgs_kernel(
    E_ref,        # (3nc, nv, TILE_N)
    W_ref,        # (nv, 3nc, TILE_N)  = M^-1 E^T
    b_ref,        # (3nc, TILE_N)
    bias_ref,     # (nc, TILE_N)
    active_ref,   # (nc, TILE_N)
    mu_ref,       # (1, TILE_N)
    lam0_ref,     # (3nc, TILE_N)
    lam_out_ref,  # (3nc, TILE_N)
    A_scratch,    # (3nc, 3nc, TILE_N) VMEM
    *,
    nc: int,
    nv: int,
    iterations: int,
    cfm: float,
    row_dofs: tuple = None,
):
    n3 = 3 * nc
    tile_n = E_ref.shape[-1]
    _assemble_A(E_ref, W_ref, A_scratch, n3, nv, row_dofs)

    mu = mu_ref[0, :]
    act = [active_ref[i, :] for i in range(nc)]
    bias = [bias_ref[i, :] for i in range(nc)]
    brow = [b_ref[r, :] for r in range(n3)]
    lam = [lam0_ref[3 * i + c, :] * act[i] for i in range(nc) for c in range(3)]

    # w = A @ lam  (sum of column scalings; A symmetric -> use rows)
    w = jnp.zeros((n3, tile_n), dtype=jnp.float32)
    for r in range(n3):
        w = w + A_scratch[r] * lam[r][None, :]

    inv_d = [
        1.0 / (A_scratch[r, r, :] + cfm) for r in range(n3)
    ]

    for _ in range(iterations):
        for i in range(nc):
            k = 3 * i
            v0 = w[k, :] + brow[k]
            v1 = w[k + 1, :] + brow[k + 1]
            v2 = w[k + 2, :] + brow[k + 2]
            l0, l1, l2 = lam[k], lam[k + 1], lam[k + 2]
            ln_new = jnp.maximum(l2 - (v2 + bias[i]) * inv_d[k + 2], 0.0)
            ln_new = ln_new * act[i]
            dn = ln_new - l2
            vt1 = v0 + A_scratch[k, k + 2, :] * dn
            vt2 = v1 + A_scratch[k + 1, k + 2, :] * dn
            lt1 = l0 - vt1 * inv_d[k]
            lt2 = l1 - vt2 * inv_d[k + 1]
            tn = jnp.sqrt(lt1 * lt1 + lt2 * lt2 + 1e-12)
            scale = jnp.minimum(1.0, mu * ln_new / tn) * act[i]
            n0, n1, n2 = lt1 * scale, lt2 * scale, ln_new
            d0, d1, d2 = n0 - l0, n1 - l1, n2 - l2
            # w += A[:, k+c] * d_c ; A symmetric -> rows are contiguous
            w = (
                w
                + A_scratch[k] * d0[None, :]
                + A_scratch[k + 1] * d1[None, :]
                + A_scratch[k + 2] * d2[None, :]
            )
            lam[k], lam[k + 1], lam[k + 2] = n0, n1, n2

    for r in range(n3):
        lam_out_ref[r, :] = lam[r]


def pgs_solve_batched(
    E: jnp.ndarray,        # (N, 3nc, nv)
    minvEt: jnp.ndarray,   # (N, nv, 3nc)
    b: jnp.ndarray,        # (N, 3nc)
    bias: jnp.ndarray,     # (N, nc)
    active: jnp.ndarray,   # (N, nc) float
    mu: jnp.ndarray,       # (N,)
    lam0: jnp.ndarray,     # (N, nc, 3)
    *,
    nc: int, nv: int, iterations: int = 8, cfm: float = 1e-4,
    interpret: bool = False, row_dofs: tuple = None,
) -> jnp.ndarray:
    """Batched PGS via the Pallas kernel (env-leading layout wrapper).

    Returns lam (N, nc, 3). Any N (padded internally to the tile).
    """
    N = E.shape[0]
    n3 = 3 * nc

    # env axis -> lanes
    E_t = E.transpose(1, 2, 0)         # (3nc, nv, N)
    W_t = minvEt.transpose(1, 2, 0)    # (nv, 3nc, N)
    b_t = b.T                          # (3nc, N)
    bias_t = bias.T
    active_t = active.T
    mu_t = mu[None, :]
    lam0_t = lam0.reshape(N, n3).T
    lam_t = pgs_solve_lanes(
        E_t, W_t, b_t, bias_t, active_t, mu_t, lam0_t,
        nc=nc, nv=nv, iterations=iterations, cfm=cfm, interpret=interpret,
        row_dofs=row_dofs,
    )
    return lam_t.T.reshape(N, nc, 3)


def pgs_solve_lanes(
    E_t: jnp.ndarray,      # (3nc, nv, N)  — envs already on lanes
    W_t: jnp.ndarray,      # (nv, 3nc, N)
    b_t: jnp.ndarray,      # (3nc, N)
    bias_t: jnp.ndarray,   # (nc, N)
    active_t: jnp.ndarray, # (nc, N)
    mu_t: jnp.ndarray,     # (1, N)
    lam0_t: jnp.ndarray,   # (3nc, N)
    *,
    nc: int, nv: int, iterations: int = 8, cfm: float = 1e-4,
    interpret: bool = False, row_dofs: tuple = None,
) -> jnp.ndarray:
    """Native-layout entry: no transposes in or out. Returns lam (3nc, N).

    Any env count is accepted: the trailing axis is zero-padded up to a
    multiple of the chosen tile (padded envs have active=0 so their
    impulses come out 0) and the pad is stripped from the result. This
    keeps off-tile configs (e.g. the 50-env PLAY rollout) on the Pallas
    path instead of silently falling back to the XLA mirror.
    """
    N = E_t.shape[-1]
    n3 = 3 * nc
    tile = pick_tile(nc, nv)
    pad = (-N) % tile
    if pad:
        padw = [(0, 0)] * (E_t.ndim - 1) + [(0, pad)]
        E_t, W_t = jnp.pad(E_t, padw[-3:]), jnp.pad(W_t, padw[-3:])
        pad2 = [(0, 0), (0, pad)]
        b_t, bias_t = jnp.pad(b_t, pad2), jnp.pad(bias_t, pad2)
        active_t, mu_t = jnp.pad(active_t, pad2), jnp.pad(mu_t, pad2)
        lam0_t = jnp.pad(lam0_t, pad2)
    Np = N + pad
    grid = (Np // tile,)

    kernel = functools.partial(
        _pgs_kernel, nc=nc, nv=nv, iterations=iterations, cfm=cfm,
        row_dofs=row_dofs,
    )
    lam_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n3, nv, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nv, n3, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nc, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nc, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n3, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n3, Np), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n3, n3, tile), jnp.float32),
        ],
        interpret=interpret,
    )(E_t, W_t, b_t, bias_t, active_t, mu_t, lam0_t)

    return lam_t[:, :N] if pad else lam_t


# --------------------------------------------------------------------------
# Block-Jacobi sweep structure (round-5 speed-of-light experiment)
# --------------------------------------------------------------------------
#
# The Gauss-Seidel sweep above is the kernel's latency wall (perf_r4.md:
# 27% of the HBM roofline bound; the serial chain is nc contacts x
# iterations, with 1-sublane-wide scalar math between every rank-3 FMA).
# The block-Jacobi variant restructures the sweep:
#
#   * the per-contact projection math runs on (g, TILE) 2D tiles — g
#     contacts solved simultaneously at full sublane width instead of one
#     at a time (block rows stacked from the interleaved layout by STATIC
#     addressing; operands and the assembled A keep their natural order);
#   * contacts are partitioned into `blocks`; contacts within a block update
#     Jacobi-style against the same accumulated velocity w (no intra-block
#     dependency), blocks update Gauss-Seidel-style against each other;
#   * an under-relaxation factor `omega` damps the simultaneous updates
#     (contacts sharing a rigid body — e.g. the 8 base-shell candidates —
#     overshoot under pure Jacobi);
#   * the w-updates of a block are 3g INDEPENDENT row FMAs (no interleaved
#     scalar ops), so the VPU pipeline stays full.
#
# blocks = ((0,1),(1,1),...,(nc-1,1)) with omega=1 reproduces the GS kernel
# bit-for-bit (tests/test_pgs_pallas.py); blocks = ((0,nc),) is pure Jacobi.


def _bj_sweeps(
    getrow, getel, b, bias, active, mu, lam0, *,
    nc: int, iterations: int, cfm: float, omega: float, blocks: tuple,
    cperm: tuple = None,
):
    """Shared block-Jacobi PGS core, INTERLEAVED operand order.

    getrow(r) -> (3nc, B) row r of the Delassus A (interleaved t1,t2,n
    per contact — the assembly's natural order); getel(r, c) -> (B,).
    b/lam0 (3nc, B) interleaved, bias/active (nc, B) natural contact
    order, mu (B,). cperm maps permuted position -> contact id; blocks
    index PERMUTED positions. Returns lam (3nc, B) interleaved.

    All permutation happens through STATIC row addressing (python ints
    at trace time) — no HBM-side gather/copy of E/W/b and no dynamic
    vector ops: the first cut permuted the operands outside the kernel
    (a full (3nc, nv, N) materialized copy of E and W per substep) and
    used `.at[slice].set` for partial-block writebacks, which failed to
    lower on real Mosaic (only g==nc variants compiled on-chip).

    Runs unchanged inside the Pallas kernel (refs behind getrow) and as
    the pure-XLA mirror (jnp array behind getrow) — one implementation
    to keep in sync, not two.
    """
    n3 = 3 * nc
    if cperm is None:
        cperm = tuple(range(nc))
    ids = [int(c) for c in cperm]

    act_rows = [active[i] for i in range(nc)]
    lam = [lam0[r] * act_rows[r // 3] for r in range(n3)]

    # w = A @ lam with 4-way partial accumulation (independent FMA streams)
    accs = [None, None, None, None]
    for r in range(n3):
        p = getrow(r) * lam[r][None, :]
        s = r % 4
        accs[s] = p if accs[s] is None else accs[s] + p
    w = (accs[0] + accs[1]) + (accs[2] + accs[3])

    # per-contact diagonal/coupling stacks (nc, B) in PERMUTED order
    inv_dt1 = 1.0 / (jnp.stack([getel(3 * c, 3 * c) for c in ids]) + cfm)
    inv_dt2 = 1.0 / (
        jnp.stack([getel(3 * c + 1, 3 * c + 1) for c in ids]) + cfm
    )
    inv_dn = 1.0 / (
        jnp.stack([getel(3 * c + 2, 3 * c + 2) for c in ids]) + cfm
    )
    c_t1n = jnp.stack([getel(3 * c, 3 * c + 2) for c in ids])
    c_t2n = jnp.stack([getel(3 * c + 1, 3 * c + 2) for c in ids])
    act_p = jnp.stack([active[c] for c in ids])
    bias_p = jnp.stack([bias[c] for c in ids])
    b_t1 = jnp.stack([b[3 * c] for c in ids])
    b_t2 = jnp.stack([b[3 * c + 1] for c in ids])
    b_n = jnp.stack([b[3 * c + 2] for c in ids])
    # lam components live as PYTHON LISTS of (B,) rows in permuted
    # position order; block writebacks are list surgery at trace time
    # (`.at[slice].set` does not lower on Mosaic for partial blocks, and
    # jnp.concatenate writebacks tripped a jax lowering-cache KeyError
    # on the full train program)
    lt1 = [lam[3 * c] for c in ids]
    lt2 = [lam[3 * c + 1] for c in ids]
    ln = [lam[3 * c + 2] for c in ids]

    for _ in range(iterations):
        for (i0, g) in blocks:
            sl = slice(i0, i0 + g)
            bids = ids[i0:i0 + g]
            # current w/lam rows of the block: static sublane stacks
            w_t1 = jnp.stack([w[3 * c] for c in bids])
            w_t2 = jnp.stack([w[3 * c + 1] for c in bids])
            w_n = jnp.stack([w[3 * c + 2] for c in bids])
            act = act_p[sl]
            ln_b = jnp.stack(ln[i0:i0 + g])
            lt1_b = jnp.stack(lt1[i0:i0 + g])
            lt2_b = jnp.stack(lt2[i0:i0 + g])
            vn = w_n + b_n[sl] + bias_p[sl]
            ln_new = jnp.maximum(ln_b - omega * vn * inv_dn[sl], 0.0) * act
            dn = ln_new - ln_b
            vt1 = w_t1 + b_t1[sl] + c_t1n[sl] * dn
            vt2 = w_t2 + b_t2[sl] + c_t2n[sl] * dn
            lt1_c = lt1_b - omega * vt1 * inv_dt1[sl]
            lt2_c = lt2_b - omega * vt2 * inv_dt2[sl]
            tn = jnp.sqrt(lt1_c * lt1_c + lt2_c * lt2_c + 1e-12)
            scale = jnp.minimum(1.0, mu[None, :] * ln_new / tn) * act
            n1, n2 = lt1_c * scale, lt2_c * scale
            d1, d2 = n1 - lt1_b, n2 - lt2_b

            # w += A[:, block cols] @ deltas — 3g independent row FMAs,
            # merged through 3 parallel partial accumulators. Accumulate
            # IN the loop (not via a list of products): materializing all
            # 3g (n3, B) products first blew the Mosaic scoped-VMEM stack
            # at g=nc (16.8 MB > 16 MB at tile 128).
            paccs = [None, None, None]
            for j, c in enumerate(bids):
                for t, p in enumerate((
                    getrow(3 * c) * d1[j][None, :],
                    getrow(3 * c + 1) * d2[j][None, :],
                    getrow(3 * c + 2) * dn[j][None, :],
                )):
                    paccs[t] = p if paccs[t] is None else paccs[t] + p
            for p in paccs:
                if p is not None:
                    w = w + p

            for j in range(g):
                lt1[i0 + j] = n1[j]
                lt2[i0 + j] = n2[j]
                ln[i0 + j] = ln_new[j]

    # back to interleaved row order via static addressing
    out = [None] * n3
    for p, c in enumerate(ids):
        out[3 * c] = lt1[p]
        out[3 * c + 1] = lt2[p]
        out[3 * c + 2] = ln[p]
    return jnp.stack(out)


def _pgs_kernel_bj(
    E_ref, W_ref, b_ref, bias_ref, active_ref, mu_ref, lam0_ref,
    lam_out_ref, A_scratch, *,
    nc: int, nv: int, iterations: int, cfm: float, omega: float,
    blocks: tuple, cperm: tuple = None, row_dofs: tuple = None,
):
    """Block-Jacobi kernel: same fused in-VMEM assembly (natural
    interleaved row order — identical to the GS kernel's), restructured
    sweep. The contact permutation is static addressing inside
    _bj_sweeps, so operands arrive untouched."""
    n3 = 3 * nc
    _assemble_A(E_ref, W_ref, A_scratch, n3, nv, row_dofs)
    lam = _bj_sweeps(
        lambda r: A_scratch[r],
        lambda r, c: A_scratch[r, c, :],
        b_ref[...], bias_ref[...], active_ref[...], mu_ref[0, :],
        lam0_ref[...],
        nc=nc, iterations=iterations, cfm=cfm, omega=omega, blocks=blocks,
        cperm=cperm,
    )
    for r in range(n3):
        lam_out_ref[r, :] = lam[r]


def plan_contact_blocks(model, n_blocks: int):
    """Partition contacts into n_blocks equal blocks, spreading contacts that
    share a rigid body across different blocks (same-body contacts are the
    strongly-coupled ones that make simultaneous Jacobi updates overshoot;
    cross-leg contacts couple only through the base).

    Returns (contact_perm, blocks) — contact_perm (nc,) reorders contacts so
    block k is the contiguous range [k*g, (k+1)*g); blocks = ((0,g),...).
    """
    bodies = [
        {int(model.cand_body[c])} for c in range(model.ncand_terrain)
    ] + [
        {int(model.pair_body_a[p]), int(model.pair_body_b[p])}
        for p in range(model.npair)
    ]
    nc = len(bodies)
    assert nc % n_blocks == 0, (nc, n_blocks)
    g = nc // n_blocks
    blocks: list = [[] for _ in range(n_blocks)]
    # place high-coupling contacts first (pairs touch two bodies)
    order = sorted(range(nc), key=lambda c: -len(bodies[c]))
    for c in order:
        open_blocks = [b for b in range(n_blocks) if len(blocks[b]) < g]
        best = min(
            open_blocks,
            key=lambda b: (
                sum(1 for o in blocks[b] if bodies[o] & bodies[c]),
                len(blocks[b]),
            ),
        )
        blocks[best].append(c)
    perm = tuple(c for blk in blocks for c in blk)
    return perm, tuple((k * g, g) for k in range(n_blocks))


def pgs_solve_lanes_bj(
    E_t: jnp.ndarray,      # (3nc, nv, N) — interleaved rows, envs on lanes
    W_t: jnp.ndarray,      # (nv, 3nc, N)
    b_t: jnp.ndarray,      # (3nc, N)
    bias_t: jnp.ndarray,   # (nc, N)
    active_t: jnp.ndarray, # (nc, N)
    mu_t: jnp.ndarray,     # (1, N)
    lam0_t: jnp.ndarray,   # (3nc, N)
    *,
    nc: int, nv: int, iterations: int = 5, cfm: float = 1e-4,
    omega: float = 1.0, contact_perm: tuple = None, blocks: tuple = None,
    row_dofs: tuple = None, interpret: bool = False,
) -> jnp.ndarray:
    """Block-Jacobi entry: interleaved in/out (drop-in for pgs_solve_lanes).

    Operands are passed through untouched — the contact permutation is
    static row addressing inside the kernel (the first cut's HBM-side
    permutation materialized full copies of E and W every substep).
    """
    N = E_t.shape[-1]
    n3 = 3 * nc
    if contact_perm is None:
        contact_perm = tuple(range(nc))
    if blocks is None:
        blocks = ((0, nc),)

    tile = pick_tile(nc, nv)
    pad = (-N) % tile
    if pad:
        padw = [(0, 0), (0, 0), (0, pad)]
        E_t, W_t = jnp.pad(E_t, padw), jnp.pad(W_t, padw)
        pad2 = [(0, 0), (0, pad)]
        b_t, bias_t = jnp.pad(b_t, pad2), jnp.pad(bias_t, pad2)
        active_t, mu_t = jnp.pad(active_t, pad2), jnp.pad(mu_t, pad2)
        lam0_t = jnp.pad(lam0_t, pad2)
    Np = N + pad

    kernel = functools.partial(
        _pgs_kernel_bj, nc=nc, nv=nv, iterations=iterations, cfm=cfm,
        omega=omega, blocks=blocks, cperm=tuple(contact_perm),
        row_dofs=row_dofs,
    )
    lam_out = pl.pallas_call(
        kernel,
        grid=(Np // tile,),
        in_specs=[
            pl.BlockSpec((n3, nv, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nv, n3, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nc, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nc, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n3, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n3, Np), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n3, n3, tile), jnp.float32),
        ],
        interpret=interpret,
    )(E_t, W_t, b_t, bias_t, active_t, mu_t, lam0_t)

    return lam_out[:, :N] if pad else lam_out


def pgs_lanes_xla_bj(
    E_t, W_t, b_t, bias_t, active_t, mu, lam0_t, *,
    nc: int, iterations: int, cfm: float, omega: float = 1.0,
    contact_perm: tuple = None, blocks: tuple = None,
) -> jnp.ndarray:
    """Pure-XLA mirror of the bj kernel (CPU tests / fallback): identical
    math via the shared _bj_sweeps core. mu is (N,)."""
    n3 = 3 * nc
    nv = E_t.shape[1]
    if contact_perm is None:
        contact_perm = tuple(range(nc))
    if blocks is None:
        blocks = ((0, nc),)
    A = jnp.zeros((n3, n3) + E_t.shape[-1:])
    for k in range(nv):
        A = A + E_t[:, k, :][:, None, :] * W_t[k, :, :][None, :, :]
    return _bj_sweeps(
        lambda r: A[r], lambda r, c: A[r, c],
        b_t, bias_t, active_t, mu, lam0_t,
        nc=nc, iterations=iterations, cfm=cfm, omega=omega, blocks=blocks,
        cperm=tuple(contact_perm),
    )
