"""Pallas TPU kernel for the work-queue near pass (leaf-segment pairs).

One grid step = one (group, SC-segment-chunk) near item from
ops/wq_force.py. The caller pre-extracts the 16-particle packed rows
into per-item field planes (x, y, z, mass, eps on S = SC*32 lanes, with
the window/liveness mask already folded into the mass plane — exactly
fused_force._near_tile's extraction); the kernel runs the raw-coordinate
pair math (forcetree.c softened pairwise force, h = 2.8 eps) against the
group's G targets and revisit-accumulates into the per-group output
block, sharing the (ngd, G, 8) accumulator layout and target table of
ops/pallas_far.py.

Raw differencing keeps the near-field accuracy story of the fused
engine (see fused_force notes: group-centered expansions lose >1e-2 on
tight pairs); everything is f32 VPU math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..kernels import softened_inv_r3, softened_potential


def _near_kernel(g_ref, fld_ref, tgt_ref, acc_ref, *, G, S, need_pot):
    i = pl.program_id(0)
    g = g_ref[i]
    g_prev = g_ref[jnp.maximum(i - 1, 0)]
    first = (i == 0) | (g != g_prev)

    fld = fld_ref[0]                       # (8, S)
    yx = fld[0:1]                          # (1, S)
    yy = fld[1:2]
    yz = fld[2:3]
    ym = fld[3:4]                          # masked mass
    yeps = fld[4:5]

    tgt = tgt_ref[0]                       # (G, 8)
    te = tgt[:, 3:4]
    xr = [tgt[:, 4 + d:5 + d] for d in range(3)]    # raw positions (G, 1)

    d0 = xr[0] - yx                        # (G, S)
    d1 = xr[1] - yy
    d2 = xr[2] - yz
    r2 = d0 * d0 + d1 * d1 + d2 * d2
    r = jnp.sqrt(r2)
    h = 2.8 * jnp.maximum(te, yeps)
    fac = ym * softened_inv_r3(r, h)
    ax = -jnp.sum(fac * d0, axis=1, keepdims=True)
    ay = -jnp.sum(fac * d1, axis=1, keepdims=True)
    az = -jnp.sum(fac * d2, axis=1, keepdims=True)
    if need_pot:
        dpot = jnp.sum(ym * softened_potential(r, h), axis=1,
                       keepdims=True)
    else:
        dpot = jnp.zeros((G, 1), jnp.float32)
    out = jnp.concatenate([ax, ay, az, dpot,
                           jnp.zeros((G, 4), jnp.float32)], axis=1)

    @pl.when(first)
    def _():
        acc_ref[0] = out

    @pl.when(jnp.logical_not(first))
    def _():
        acc_ref[0] = acc_ref[0] + out


@functools.partial(
    jax.jit, static_argnames=("G", "S", "need_pot", "interpret"))
def near_items(g_of, fields, tgt, *, G, S, need_pot, interpret=False):
    """Run the near kernel over one super-block of flattened items.

    g_of: (SB,) int32 group of each item (dump row ngd-1 for dead).
    fields: (SB, 8, S) f32 [x, y, z, mass(masked), eps, pad3].
    tgt: (ngd, G, 8) shared target table (pallas_far.pack_tgt_scal).

    Returns acc_out (ngd, G, 8) [ax ay az pot ...]; rows of groups with
    no items in THIS block are garbage — the caller masks them."""
    sb = fields.shape[0]
    ngd = tgt.shape[0]

    kernel = functools.partial(_near_kernel, G=G, S=S, need_pot=need_pot)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(sb,),
        in_specs=[
            pl.BlockSpec((1, 8, S), lambda i, g: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, 8), lambda i, g: (g[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, 8), lambda i, g: (g[i], 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ngd, G, 8), jnp.float32),
        interpret=interpret,
    )(g_of, fields, tgt)


def pack_near_fields(ent, part16):
    """(SB, SC) packed segment keys -> (SB, 8, S) field planes with the
    window mask folded into the mass plane (fused_force._near_tile's
    extraction, hoisted out of the kernel)."""
    sb, sc = ent.shape
    imax = jnp.int32(2147483647)
    live = ent != imax
    e = jnp.where(live, ent, 0)
    start = e >> 5
    cnt = jnp.where(live, e & 31, 0)
    row0 = start >> 4
    off = start & 15

    nrows = part16.shape[0]
    rid = jnp.stack([row0, jnp.minimum(row0 + 1, nrows - 1)], axis=-1)
    g = part16[rid.reshape(-1)].reshape(sb, sc, 2, 128)
    slot = jnp.arange(32, dtype=jnp.int32)
    ok = (slot[None, None, :] >= off[:, :, None]) \
        & (slot[None, None, :] < (off + cnt)[:, :, None]) \
        & live[:, :, None]
    S = sc * 32

    def field(f):
        return jnp.concatenate([g[..., 0, 16 * f:16 * (f + 1)],
                                g[..., 1, 16 * f:16 * (f + 1)]],
                               axis=-1).reshape(sb, S)

    ym = jnp.where(ok.reshape(sb, S), field(3), 0.0)
    return jnp.stack([field(0), field(1), field(2), ym, field(4),
                      jnp.zeros((sb, S), jnp.float32),
                      jnp.zeros((sb, S), jnp.float32),
                      jnp.zeros((sb, S), jnp.float32)], axis=1)
