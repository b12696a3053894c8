"""Direct-summation gravity: the O(N^2) accuracy oracle and small-N force path.

TPU-native counterpart of ``force_treeevaluate_direct`` (nbody/forcetree.c:
1896-1975) and the potential part of ``compute_potential`` (nbody/potential.c).
Fully vectorized and tiled: targets are processed in blocks via ``lax.map``
and sources streamed in chunks via ``lax.scan`` so peak memory is
O(block * chunk) regardless of N.

Softening follows the reference: pairwise spline length
h_ij = 2.8 * max(eps_type_i, eps_type_j) (forcetree.c:1914-1917), Newtonian
beyond h_ij.  Periodic runs use the minimum image plus the tabulated Ewald
correction (ewald.c) supplied by the caller.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..kernels import softened_inv_r3, softened_potential


def _min_image(d, box):
    if box is None:
        return d
    return d - box * jnp.round(d / box)


def direct_gravity(
    pos: jax.Array,            # (N,3) predicted positions
    mass: jax.Array,           # (N,)  0 for padding
    eps: jax.Array,            # (N,)  per-particle Plummer softening
    *,
    box: Optional[float] = None,
    ewald=None,                # optional EwaldTable for periodic correction
    target_block: int = 1024,
    source_chunk: int = 8192,
    with_potential: bool = True,
):
    """Return (accel (N,3), pot (N,)) — raw internal-unit force (no G factor).

    Padding particles (mass 0) contribute nothing and receive garbage values
    that the caller masks. Self-interaction contributes zero force; the self
    potential is removed as in potential.c:136.
    """
    n = pos.shape[0]
    nb = -(-n // target_block)
    npad_t = nb * target_block
    nc = -(-n // source_chunk)
    npad_s = nc * source_chunk

    pos_t = jnp.pad(pos, ((0, npad_t - n), (0, 0)))
    eps_t = jnp.pad(eps, (0, npad_t - n), constant_values=1.0)
    pos_s = jnp.pad(pos, ((0, npad_s - n), (0, 0)))
    mass_s = jnp.pad(mass, (0, npad_s - n))
    eps_s = jnp.pad(eps, (0, npad_s - n), constant_values=1.0)

    pos_sc = pos_s.reshape(nc, source_chunk, 3)
    mass_sc = mass_s.reshape(nc, source_chunk)
    eps_sc = eps_s.reshape(nc, source_chunk)

    def one_block(args):
        tp, te = args  # (B,3), (B,)

        def scan_body(carry, chunk):
            acc, pot = carry
            sp, sm, se = chunk
            d = sp[None, :, :] - tp[:, None, :]          # (B,S,3)
            d = _min_image(d, box)
            r2 = jnp.sum(d * d, axis=-1)
            r = jnp.sqrt(r2)
            h = 2.8 * jnp.maximum(te[:, None], se[None, :])
            f = softened_inv_r3(r, h) * sm[None, :]       # (B,S)
            acc = acc + jnp.einsum("bs,bsd->bd", f, d)
            if with_potential:
                pot = pot + jnp.sum(softened_potential(r, h) * sm[None, :],
                                    axis=-1)
            if ewald is not None:
                fc = ewald.force_correction(d)            # (B,S,3)
                acc = acc + jnp.sum(sm[None, :, None] * fc, axis=1)
                if with_potential:
                    pot = pot + jnp.sum(sm[None, :] * ewald.pot_correction(d),
                                        axis=-1)
            return (acc, pot), None

        acc0 = jnp.zeros((target_block, 3), pos.dtype)
        pot0 = jnp.zeros((target_block,), pos.dtype)
        (acc, pot), _ = lax.scan(scan_body, (acc0, pot0),
                                 (pos_sc, mass_sc, eps_sc))
        return acc, pot

    acc, pot = lax.map(one_block,
                       (pos_t.reshape(nb, target_block, 3),
                        eps_t.reshape(nb, target_block)))
    acc = acc.reshape(npad_t, 3)[:n]
    pot = pot.reshape(npad_t)[:n]
    # remove self-potential: wp(0) = -2.8 -> phi_self = -2.8*m/h (potential.c:136)
    if with_potential:
        # the Ewald self term psi(0) (periodic lattice self-energy) stays, as
        # in the reference tree walk
        pot = pot + mass / eps
    return acc, pot
