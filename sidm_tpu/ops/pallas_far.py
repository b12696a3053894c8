"""Pallas TPU kernel for the work-queue walk: classify + far multipole.

One grid step = one (group, WC-node-chunk) work item from ops/wq_force.py.
The kernel fuses the opening-criterion classification with the
monopole+quadrupole far-field math on the rows it just loaded (the fused
engine's eval-at-discovery, forcetree.c:786-1377 semantics), and emits
the per-item segment/open/big key rows for the caller's compaction.

Schedule facts this design leans on (Pallas TPU pipeline semantics):

* input blocks whose index map repeats across consecutive grid steps are
  NOT re-fetched — a group's 2 KB target block is DMA'd once per group,
  not once per item (items of a group are consecutive by construction);
* output blocks revisited by consecutive steps stay resident in VMEM and
  are written back once when the index changes — the per-group (G, 8)
  accumulator pattern of grouped/ragged matmul kernels;
* node rows stream as (24, WC) f32 blocks (two sublane tiles), double-
  buffered by the pipeline while the VPU runs the ~50-pass pair math.

All math is f32 on the VPU: no MXU distance expansion, hence none of the
bf16-truncation hazards the XLA einsum formulation has to guard against
(see fused_force._PREC) — near-field style raw differencing everywhere.

Groups with no items at a level never visit their accumulator block, so
the caller must mask unvisited rows (Pallas does not zero-init outputs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..kernels import softened_inv_r3, softened_potential

IMAX = jnp.int32(2147483647)

# rows_t sublane layout (transposed pack_tree rows + walk extras)
_R_COM = 0          # 0..2 com xyz
_R_MASS = 3
_R_CNT = 4
_R_NSTART = 5
_R_CSTART = 6
_R_CCNT = 7
_R_QUAD = 8         # 8..13 quad xx yy zz xy xz yz
_R_EPS = 14
_R_BMAX2 = 15
_R_ID = 16          # local node id as exact f32 (for the big path)
_RT = 24            # padded to a multiple of 8 sublanes


def _far_kernel(g_ref, lvl_ref, rows_ref, tgt_ref, scal_ref,
                acc_ref, keys_ref, *, G, WC, theta2, use_relative,
                leaf_cap, last, need_pot):
    i = pl.program_id(0)
    g = g_ref[i]
    g_prev = g_ref[jnp.maximum(i - 1, 0)]
    first = (i == 0) | (g != g_prev)

    rows = rows_ref[0]                         # (_RT, WC)
    com = rows[_R_COM:_R_COM + 3]              # (3, WC)
    m = rows[_R_MASS:_R_MASS + 1]              # (1, WC)
    cnt = rows[_R_CNT:_R_CNT + 1]
    epsn = rows[_R_EPS:_R_EPS + 1]
    bmax2 = rows[_R_BMAX2:_R_BMAX2 + 1]

    s_l = lvl_ref[0, 0]
    # scal block is (1, 1, 8) VMEM (a (1, 8) SMEM block violates the
    # (8, 128)-tile rule on real TPUs); (1, 1) slices broadcast cleanly
    sc = scal_ref[0]                           # (1, 8)
    glo = (sc[:, 0:1], sc[:, 1:2], sc[:, 2:3])
    ghi = (sc[:, 3:4], sc[:, 4:5], sc[:, 5:6])
    oac = sc[:, 6:7]

    # ---- classification (fused_force._classify, non-periodic) ----
    r2b = jnp.zeros((1, WC), jnp.float32)
    for d in range(3):
        cd = com[d:d + 1]
        dx = jnp.maximum(jnp.maximum(glo[d] - cd, cd - ghi[d]), 0.0)
        r2b = r2b + dx * dx
    geo = s_l * s_l > theta2 * r2b
    if use_relative:
        rel = m * (s_l ** 4) > oac * r2b * r2b * r2b
        mac_open = jnp.where(oac > 0, rel, geo)
    else:
        mac_open = geo
    mac_open = mac_open | (r2b <= bmax2)
    live = cnt > 0
    is_leaf = cnt <= float(leaf_cap)
    far = live & ~mac_open
    seg = live & mac_open & is_leaf
    deep = live & mac_open & ~is_leaf
    if last:
        opn = jnp.zeros_like(deep)
        big = deep
    else:
        opn = deep
        big = jnp.zeros_like(deep)

    # ---- key emission ----
    nstart = rows[_R_NSTART:_R_NSTART + 1].astype(jnp.int32)
    ncnt = cnt.astype(jnp.int32)
    cstart = rows[_R_CSTART:_R_CSTART + 1].astype(jnp.int32)
    ccnt = rows[_R_CCNT:_R_CCNT + 1].astype(jnp.int32)
    ids = rows[_R_ID:_R_ID + 1].astype(jnp.int32)
    imax = jnp.int32(2147483647)
    sk = jnp.where(seg, nstart * 32 + jnp.minimum(ncnt, 31), imax)
    ok = jnp.where(opn, cstart * 16 + ccnt, imax)
    bk = jnp.where(big, ids, imax)
    keys_ref[0] = jnp.concatenate(
        [sk, ok, bk, jnp.full((1, WC), 2147483647, jnp.int32)], axis=0)

    # ---- far multipole (fused_force._far_tile, group-centered) ----
    tgt = tgt_ref[0]                            # (G, 8)
    te = tgt[:, 3:4]                            # (G, 1)
    mfar = jnp.where(far, m, 0.0)               # (1, WC)

    gc = (0.5 * (glo[0] + ghi[0]), 0.5 * (glo[1] + ghi[1]),
          0.5 * (glo[2] + ghi[2]))
    cc = [com[d:d + 1] - gc[d] for d in range(3)]       # centered (1, WC)
    xc = [tgt[:, d:d + 1] for d in range(3)]            # (G, 1)

    ny2 = cc[0] * cc[0] + cc[1] * cc[1] + cc[2] * cc[2]
    nx2 = xc[0] * xc[0] + xc[1] * xc[1] + xc[2] * xc[2]
    cross = xc[0] * cc[0] + xc[1] * cc[1] + xc[2] * cc[2]   # (G, WC)
    r2 = jnp.maximum(nx2 + ny2 - 2.0 * cross, 0.0)
    r = jnp.sqrt(r2)
    h = 2.8 * jnp.maximum(te, epsn)
    fac = mfar * softened_inv_r3(r, h)                      # (G, WC)

    fsum = jnp.sum(fac, axis=1, keepdims=True)              # (G, 1)
    da = [jnp.sum(fac * cc[d], axis=1, keepdims=True) - xc[d] * fsum
          for d in range(3)]
    if need_pot:
        dpot = jnp.sum(mfar * softened_potential(r, h), axis=1,
                       keepdims=True)
    else:
        dpot = jnp.zeros((G, 1), jnp.float32)

    # quadrupole, Newtonian range only (forcetree.c:1002-1060)
    newton = (r >= h) & (mfar > 0)
    r_safe = jnp.maximum(r, 1e-30)
    ir = jnp.where(newton, 1.0 / r_safe, 0.0)
    ir2 = ir * ir
    w5 = ir2 * ir2 * ir
    w7 = w5 * ir2

    q = [rows[_R_QUAD + j:_R_QUAD + j + 1] for j in range(6)]
    # u = Q . com_c per node (1, WC) rows
    u = [q[0] * cc[0] + q[3] * cc[1] + q[4] * cc[2],
         q[3] * cc[0] + q[1] * cc[1] + q[5] * cc[2],
         q[4] * cc[0] + q[5] * cc[1] + q[2] * cc[2]]
    s = u[0] * cc[0] + u[1] * cc[1] + u[2] * cc[2]          # (1, WC)
    xu = xc[0] * u[0] + xc[1] * u[1] + xc[2] * u[2]         # (G, WC)
    phi = [xc[0] * xc[0], xc[1] * xc[1], xc[2] * xc[2],
           2.0 * xc[0] * xc[1], 2.0 * xc[0] * xc[2],
           2.0 * xc[1] * xc[2]]                             # (G, 1)
    xqx = (phi[0] * q[0] + phi[1] * q[1] + phi[2] * q[2]
           + phi[3] * q[3] + phi[4] * q[4] + phi[5] * q[5])  # (G, WC)
    dqd = s - 2.0 * xu + xqx

    w5u = [jnp.sum(w5 * u[d], axis=1, keepdims=True) for d in range(3)]
    mw = [jnp.sum(w5 * q[j], axis=1, keepdims=True) for j in range(6)]
    qxv = [mw[0] * xc[0] + mw[3] * xc[1] + mw[4] * xc[2],
           mw[3] * xc[0] + mw[1] * xc[1] + mw[5] * xc[2],
           mw[4] * xc[0] + mw[5] * xc[1] + mw[2] * xc[2]]
    t7 = w7 * dqd
    t7sum = jnp.sum(t7, axis=1, keepdims=True)
    for d in range(3):
        da[d] = da[d] - w5u[d] + qxv[d] + 2.5 * (
            jnp.sum(t7 * cc[d], axis=1, keepdims=True) - xc[d] * t7sum)
    if need_pot:
        dpot = dpot - 0.5 * jnp.sum(dqd * w5, axis=1, keepdims=True)

    out = jnp.concatenate(
        [da[0], da[1], da[2], dpot, jnp.zeros((G, 4), jnp.float32)],
        axis=1)                                             # (G, 8)

    @pl.when(first)
    def _():
        acc_ref[0] = out

    @pl.when(jnp.logical_not(first))
    def _():
        acc_ref[0] = acc_ref[0] + out


@functools.partial(
    jax.jit, static_argnames=("G", "WC", "theta2", "use_relative",
                              "leaf_cap", "last", "need_pot", "interpret"))
def far_items(g_of, s_l, rows_t, tgt, scal, *, G, WC, theta2,
              use_relative, leaf_cap, last, need_pot, interpret=False):
    """Run the far kernel over a flattened item list.

    g_of: (CAP,) int32 group of each item (dump group ng for dead items;
    live items first, per-group runs consecutive). s_l: () cell size of
    the level. rows_t: (CAP, _RT, WC) transposed node rows (dead slots
    zeroed by the caller). tgt: (ngd, G, 8) [xc xyz, te, xr xyz, pad].
    scal: (ngd, 8) [glo xyz, ghi xyz, oac, pad].

    Returns (acc_out (ngd, G, 8) [ax ay az pot ...] — rows of UNVISITED
    groups are garbage, caller masks by item count — and keys
    (CAP, 4, WC) int32 [segk, openk, bigk, pad])."""
    cap = rows_t.shape[0]
    ngd = tgt.shape[0]
    lvl = jnp.reshape(s_l.astype(jnp.float32), (1, 1))
    scal = scal[:, None, :]                      # (ngd, 1, 8)

    kernel = functools.partial(
        _far_kernel, G=G, WC=WC, theta2=theta2,
        use_relative=use_relative, leaf_cap=leaf_cap, last=last,
        need_pot=need_pot)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(cap,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _RT, WC), lambda i, g: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, 8), lambda i, g: (g[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8), lambda i, g: (g[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, G, 8), lambda i, g: (g[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, WC), lambda i, g: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    acc_out, keys = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ngd, G, 8), jnp.float32),
            jax.ShapeDtypeStruct((cap, 4, WC), jnp.int32),
        ],
        interpret=interpret,
    )(g_of, lvl, rows_t, tgt, scal)
    return acc_out, keys


def pack_rows_t(rows, ids, dead):
    """(CAP, WC, 16) gathered node rows + (CAP, WC) local ids ->
    (CAP, _RT, WC) transposed kernel input (dead slots zeroed)."""
    cap, WC, _ = rows.shape
    rows = jnp.where(dead[..., None], 0.0, rows)
    idf = jnp.where(dead, 0.0, ids.astype(jnp.float32))
    rt = jnp.concatenate([rows, idf[..., None],
                          jnp.zeros((cap, WC, _RT - 17), jnp.float32)],
                         axis=-1)
    return jnp.transpose(rt, (0, 2, 1))


def pack_tgt_scal(xc, te, xr, glo, ghi, oac):
    """Per-group target/scalar tables with one trailing dump row."""
    ng, G, _ = xc.shape
    tgt = jnp.concatenate([xc, te[..., None], xr,
                           jnp.zeros((ng, G, 1), jnp.float32)], axis=-1)
    tgt = jnp.concatenate([tgt, jnp.zeros((1, G, 8), jnp.float32)])
    scal = jnp.concatenate([glo, ghi, oac[:, None],
                            jnp.zeros((ng, 1), jnp.float32)], axis=-1)
    scal = jnp.concatenate([scal, jnp.zeros((1, 8), jnp.float32)])
    return tgt, scal
