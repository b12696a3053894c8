"""Prototype: interlaced CIC deposit/gather for the PM long-range force.

Error reference: exact lattice force (pm_check2 oracle) minus the exact
screened short-range = exact long-range. Compares baseline PM, deposit
interlacing, and deposit+gather interlacing at mesh 64/128.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from sidm_tpu.ops import pm

N = 1024
BOX = 100.0
EPS = 0.15


def pm_accel_variant(kern, pos, mass, mode):
    """mode: 0 baseline, 1 deposit interlace, 2 deposit+gather interlace."""
    n = kern.n
    box = kern.box
    h = box / n
    pos = jnp.remainder(pos, box)

    def fwd(p):
        rho = pm.cic_deposit(p, mass, box, n)
        return pm._dft3(rho, jnp.zeros_like(rho), kern.fmat_r, kern.fmat_i)

    re1, im1 = fwd(pos)
    if mode >= 1:
        re2, im2 = fwd(jnp.remainder(pos + 0.5 * h, box))
        # combine: rho2 samples the field at x - h/2; alias-cancel with
        # the phase e^{i (kx+ky+kz) h/2}
        k1 = kern.kvec
        ph = 0.5 * h * (k1[:, None, None] + k1[None, :, None]
                        + k1[None, None, :])
        c, s = jnp.cos(ph), jnp.sin(ph)
        re = 0.5 * (re1 + re2 * c - im2 * s)
        im = 0.5 * (im1 + re2 * s + im2 * c)
    else:
        re, im = re1, im1

    phi_r = re * kern.greens
    phi_i = im * kern.greens
    br, bi = kern.fmat_r, -kern.fmat_i
    kx = kern.kvec[:, None, None]
    ky = kern.kvec[None, :, None]
    kz = kern.kvec[None, None, :]
    fields = []
    fields2 = []
    for kc in (kx, ky, kz):
        ar = kc * phi_i
        ai = -kc * phi_r
        rr, _ = pm._dft3(ar, ai, br, bi)
        fields.append(rr.reshape(-1))
        if mode == 2:
            # field at the half-shifted grid points: multiply by
            # e^{+i(kx+ky+kz)h/2} before the inverse transform
            k1 = kern.kvec
            ph = 0.5 * h * (k1[:, None, None] + k1[None, :, None]
                            + k1[None, None, :])
            c, s = jnp.cos(ph), jnp.sin(ph)
            rr2, _ = pm._dft3(ar * c - ai * s, ar * s + ai * c, br, bi)
            fields2.append(rr2.reshape(-1))
    zero = jnp.zeros(n ** 3, jnp.float32)
    f4 = jnp.stack(fields + [zero], axis=-1)
    out = pm.cic_gather(f4, pos, box, n)[..., :3]
    if mode == 2:
        f42 = jnp.stack(fields2 + [zero], axis=-1)
        # grid2 point j sits at x_j + h/2: gather with pos shifted by -h/2
        out2 = pm.cic_gather(f42, jnp.remainder(pos - 0.5 * h, box),
                             box, n)[..., :3]
        out = 0.5 * (out + out2)
    return out


def main():
    rng = np.random.default_rng(7)
    pos = rng.uniform(0, BOX, (N, 3)).astype(np.float32)
    pos[:N // 2] = (50.0 + rng.standard_normal((N // 2, 3)) * 4.0) % BOX
    pos = jnp.asarray(pos)
    mass = jnp.asarray(rng.uniform(0.5, 1.5, N).astype(np.float32))
    eps = jnp.full(N, EPS, jnp.float32)

    # exact total (cache from pm_check2 logic)
    from sidm_tpu.ops.ewald import _ewald_force_grid
    from sidm_tpu.kernels import softened_inv_r3
    d = pos[None, :, :] - pos[:, None, :]
    d = d - BOX * jnp.round(d / BOX)
    r = jnp.sqrt(jnp.sum(d * d, -1))
    hsoft = 2.8 * jnp.maximum(eps[:, None], eps[None, :])
    off = 1.0 - jnp.eye(N)
    acc_tot = jnp.einsum("ts,tsd->td",
                         softened_inv_r3(r, hsoft) * mass[None, :] * off, d)
    du = d / BOX
    accs = []
    for i in range(0, N, 64):
        fc = _ewald_force_grid(du[i:i+64])
        accs.append(jnp.einsum("ts,tsd->td", mass[None, :] * off[i:i+64],
                               -fc) / BOX**2)
    acc_tot = acc_tot + jnp.concatenate(accs)

    for n_mesh, asmth in [(64, 2.0), (128, 2.0), (64, 1.5), (128, 1.5)]:
        kern = pm.build_pm_kernel(BOX, n=n_mesh, asmth=asmth, rcut_fac=6.0)
        # exact long-range = total - exact screened short
        fac = pm.short_range_fac(r, hsoft, kern.alpha) * mass[None, :] * off
        fac = jnp.where(r <= kern.rcut, fac, 0.0)
        acc_long_ref = acc_tot - jnp.einsum("ts,tsd->td", fac, d)
        scale = jnp.percentile(jnp.linalg.norm(acc_tot, axis=1), 50)
        for mode, name in [(0, "base"), (1, "dep-int"), (2, "dep+gat-int")]:
            accl = pm_accel_variant(kern, pos, mass, mode)
            rel = jnp.linalg.norm(accl - acc_long_ref, axis=1) \
                / jnp.maximum(jnp.linalg.norm(acc_tot, axis=1), scale)
            print(f"mesh {n_mesh:4d} asmth {asmth:3.1f} {name:<12s} "
                  f"p99 {float(jnp.percentile(rel, 99)):.2e} "
                  f"max {float(jnp.max(rel)):.2e}", flush=True)


if __name__ == "__main__":
    main()
