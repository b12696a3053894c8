"""Particle-mesh long-range gravity for periodic boxes (TreePM split).

TPU-native replacement for the reference's per-interaction Ewald table
lookups (nbody/ewald.c, applied per pair in forcetree.c:921-930,1076-1082).
Instead of correcting every tree interaction toward the periodic lattice
sum, the total periodic force is split Ewald-style:

  a_total(i) = a_short(i) + a_long(i)

* ``a_short``: spline-softened pair forces multiplied by the real-space
  Ewald screen ``erfc(a r) + (2 a r/sqrt(pi)) exp(-a^2 r^2)``, evaluated at
  the minimum image and truncated at ``r_cut`` — this runs in the fused
  tree walk, whose frontier now dies at r_cut (ops/fused_force.py).
* ``a_long``: the k-space Gaussian-filtered Poisson solve on a mesh, i.e.
  the force field of the density convolved with exp(-k^2/(4 a^2)),
  computed here.

The sum reproduces the full Ewald lattice force (what the reference's
tree + table-correction computes) up to the mesh's band-limit and the
erfc truncation — both controlled by ``asmth``/``rcut`` (GADGET-2's
TreePM constants; asmth=1.25 cells, rcut=4.5 asmth are the classic
defaults).

TPU-first implementation choices:

* The 3D transforms are COMPLEX MATMUL DFTs, not FFT custom calls: the
  per-axis DFT matrix is (n, n) with n = 128..256, so each axis transform
  is one MXU-shaped (n^2, n) x (n, n) contraction at HIGHEST precision
  (~5-10 ms for the 12 transforms of a 256^3 force solve — cheaper than
  risking unsupported FFT lowering, and exact to f32).
* CIC deposit uses NO scatter-adds (TPU scatter-add runs ~60x off
  bandwidth): particles are sorted by their CIC base cell, the 8 corner
  weights are range-summed per occupied cell with the blocked prefix
  structure from ops.tree (block_prefix/range_sum), and each corner plane
  is written with a UNIQUE-index scatter then rolled into place.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.scipy.special import erf
from scipy.special import erf as erf_np

from .tree import block_prefix, range_sum

_PREC = lax.Precision.HIGHEST
_SQRT_PI = float(np.sqrt(np.pi))


class PMKernel(NamedTuple):
    """Precomputed mesh operator for one (box, n, asmth) combination.

    Registered as a custom pytree below: the array fields are children,
    the scalar split constants are STATIC aux data (n drives shapes, so
    the kernel can be passed through jit boundaries directly).
    """
    fmat_r: jax.Array     # (n, n) forward DFT cos
    fmat_i: jax.Array     # (n, n) forward DFT -sin
    greens: jax.Array     # (n, n, n) -4pi exp(-k^2/4a^2)/(k^2 W^2 V)
    kvec: jax.Array       # (n,) physical k per axis index (signed)
    box: float
    n: int
    alpha: float          # Ewald split scale 1/(2 asmth h)
    rcut: float           # short-range truncation radius
    pot_self: float       # mesh potential of a unit mass at its own
                          # position (subtracted to match the reference's
                          # psi(0) self-term convention)
    interlace: bool       # half-cell interlaced deposit AND gather:
                          # cancels the leading CIC alias images on both
                          # sides (4-5x lower force error; the deposit-
                          # only variant is useless — the GATHER aliasing
                          # dominates, measured in scripts/pm_interlace.py)


jax.tree_util.register_pytree_node(
    PMKernel,
    lambda k: ((k.fmat_r, k.fmat_i, k.greens, k.kvec),
               (k.box, k.n, k.alpha, k.rcut, k.pot_self, k.interlace)),
    lambda aux, ch: PMKernel(*ch, *aux),
)


def short_range_screen(r, alpha):
    """Real-space Ewald screen S(r) multiplying the Newtonian pair force:
    f_short = S(r)/r^2 (ewald.c:332-381 real-lattice term, n=0 image)."""
    x = alpha * r
    return jax.scipy.special.erfc(x) + (2.0 / _SQRT_PI) * x * jnp.exp(-x * x)


def short_range_fac(r, h, alpha):
    """Screened softened force factor: acc += m * fac * d.

    Equals softened_inv_r3(r, h) + (S(r) - 1)/r^3 exactly; the second
    term is series-stabilized for alpha*r -> 0 so the kick is finite at
    r = 0 (relative error of the series < 1e-7 below the switch point).
    """
    from ..kernels import softened_inv_r3

    x = alpha * r
    x2 = x * x
    # g(r) = (1 - S(r))/r^3 = alpha^3 * (erf(x) - 2x/sqrt(pi) e^{-x^2})/x^3
    small = x < 0.2
    xs = jnp.maximum(x, 1e-12)
    g_dir = (erf(xs) - (2.0 / _SQRT_PI) * xs * jnp.exp(-x2)) / (xs * xs * xs)
    g_ser = (4.0 / (3.0 * _SQRT_PI)) * (1.0 - 0.6 * x2 + (3.0 / 14.0) * x2 * x2)
    g = alpha ** 3 * jnp.where(small, g_ser, g_dir)
    return softened_inv_r3(r, h) - g


def short_range_pot(r, h, alpha):
    """Screened softened pair potential: pot += m * this.

    softened_potential(r, h) + erf(alpha r)/r, finite (2a/sqrt(pi)) at 0.
    """
    from ..kernels import softened_potential

    x = alpha * r
    xs = jnp.maximum(x, 1e-12)
    e_dir = erf(xs) / jnp.maximum(r, 1e-30)
    e_ser = alpha * (2.0 / _SQRT_PI) * (1.0 - x * x / 3.0)
    e = jnp.where(x < 0.1, e_ser, e_dir)
    return softened_potential(r, h) + e


def build_pm_kernel(box: float, n: int = 128, asmth: float = 1.25,
                    rcut_fac: float = 4.5,
                    interlace: bool = True) -> PMKernel:
    """Greens function, DFT matrices and split constants for one box."""
    h = box / n
    alpha = 1.0 / (2.0 * asmth * h)
    rcut = rcut_fac * asmth * h

    p = np.arange(n)
    ang = -2.0 * np.pi / n * np.outer(p, p)
    fmat_r = jnp.asarray(np.cos(ang), jnp.float32)
    fmat_i = jnp.asarray(np.sin(ang), jnp.float32)

    m = np.where(p > n // 2, p - n, p).astype(np.float64)   # signed modes
    k1 = 2.0 * np.pi / box * m
    # CIC window per axis: sinc^2(pi m / n)
    s = np.sinc(m / n)          # sin(pi x)/(pi x)
    w1 = s * s
    kx = k1[:, None, None]
    ky = k1[None, :, None]
    kz = k1[None, None, :]
    k2 = kx * kx + ky * ky + kz * kz
    w2 = (w1[:, None, None] * w1[None, :, None] * w1[None, None, :]) ** 2
    with np.errstate(divide="ignore", invalid="ignore"):
        g = -4.0 * np.pi * np.exp(-k2 / (4.0 * alpha * alpha)) \
            / (k2 * w2 * box ** 3)
    g[0, 0, 0] = 0.0            # uniform background (the pi/alpha^2 term)
    kern = PMKernel(fmat_r=fmat_r, fmat_i=fmat_i,
                    greens=jnp.asarray(g, jnp.float32),
                    kvec=jnp.asarray(k1, jnp.float32),
                    box=float(box), n=int(n), alpha=float(alpha),
                    rcut=float(rcut), pot_self=0.0,
                    interlace=bool(interlace))
    # mesh self-potential of a unit mass (generic off-grid position):
    # subtracted per particle so the total matches the reference's
    # psi(0)/box lattice self-energy convention (ewald.c:104-105)
    probe = jnp.asarray([[0.3811 * box, 0.5377 * box, 0.2629 * box]],
                        jnp.float32)
    _, pot = pm_accel(kern, probe, jnp.ones(1, jnp.float32),
                      with_potential=True)
    return kern._replace(pot_self=float(pot[0]))


def _axis_dft(re, im, fr, fi, axis, prec=_PREC):
    """One complex DFT along ``axis`` via two-real-matmul contraction."""
    re_m = jnp.moveaxis(re, axis, -1)
    im_m = jnp.moveaxis(im, axis, -1)

    def mm(a, b):
        return jnp.einsum("...q,pq->...p", a, b, precision=prec,
                          preferred_element_type=jnp.float32)

    out_r = mm(re_m, fr) - mm(im_m, fi)
    out_i = mm(re_m, fi) + mm(im_m, fr)
    return jnp.moveaxis(out_r, -1, axis), jnp.moveaxis(out_i, -1, axis)


def _dft3(re, im, fr, fi):
    for ax in range(3):
        re, im = _axis_dft(re, im, fr, fi, ax)
    return re, im


def _cic_corners(pos, box, n):
    """CIC base cell, per-axis fractions, flat base id. pos wrapped."""
    h = box / n
    f = pos / h - 0.5
    i0 = jnp.floor(f).astype(jnp.int32)
    w = f - i0                    # weight of the +1 corner per axis
    i0 = jnp.remainder(i0, n)
    return i0, w


def _flat(i0, n):
    return (i0[..., 0] * n + i0[..., 1]) * n + i0[..., 2]


def cic_deposit(pos, mass, box: float, n: int):
    """Mass-per-cell grid (n, n, n) by sort + blocked range sums.

    No scatter-adds: particles are sorted by base cell; the 8 corner
    weights are range-summed per occupied cell (exact segment sums via
    block_prefix) and written with unique-index scatters, one plane per
    corner, then rolled to the corner offset.
    """
    npart = pos.shape[0]
    i0, w = _cic_corners(pos, box, n)
    c = _flat(i0, n)
    order = jnp.argsort(c)
    cs = c[order]
    ws = w[order]
    ms = mass[order]

    wx = jnp.stack([1.0 - ws[:, 0], ws[:, 0]], 1)          # (N, 2)
    wy = jnp.stack([1.0 - ws[:, 1], ws[:, 1]], 1)
    wz = jnp.stack([1.0 - ws[:, 2], ws[:, 2]], 1)
    wxy = (wx[:, :, None] * wy[:, None, :]).reshape(npart, 4)
    vals = (wxy[:, :, None] * wz[:, None, :]).reshape(npart, 8) \
        * ms[:, None]                                       # corner = dx*4+dy*2+dz

    bp = block_prefix(vals)
    boundary = jnp.concatenate([jnp.ones(1, bool), cs[1:] != cs[:-1]])
    idx = jnp.arange(npart, dtype=jnp.int32)
    # segment starts (unique positions), ends = next start
    seg = jnp.cumsum(boundary.astype(jnp.int32)) - 1
    nseg_cap = npart
    start_buf = jnp.full(nseg_cap + 1, npart, jnp.int32).at[
        jnp.where(boundary, seg, nseg_cap)].set(idx)
    starts = start_buf[:nseg_cap]
    ends = jnp.concatenate([starts[1:], jnp.full(1, npart, jnp.int32)])
    ends = jnp.minimum(ends, npart)
    sums = range_sum(bp, starts, ends)                      # (N, 8)
    cell_id = cs[jnp.minimum(starts, npart - 1)]
    live = ends > starts
    scat = jnp.where(live, cell_id, n ** 3)                 # dump slot

    rho = jnp.zeros((n, n, n), jnp.float32)
    for k in range(8):
        dxo, dyo, dzo = (k >> 2) & 1, (k >> 1) & 1, k & 1
        plane = jnp.zeros(n ** 3 + 1, jnp.float32).at[scat].set(
            jnp.where(live, sums[:, k], 0.0))[:n ** 3].reshape(n, n, n)
        rho = rho + jnp.roll(plane, (dxo, dyo, dzo), axis=(0, 1, 2))
    return rho


def cic_gather(field4, pos, box: float, n: int):
    """Interpolate packed (n^3, 4) [ax, ay, az, pot] rows at positions."""
    i0, w = _cic_corners(pos, box, n)
    out = jnp.zeros(pos.shape[:-1] + (4,), jnp.float32)
    for k in range(8):
        dxo, dyo, dzo = (k >> 2) & 1, (k >> 1) & 1, k & 1
        ic = jnp.stack([jnp.remainder(i0[..., 0] + dxo, n),
                        jnp.remainder(i0[..., 1] + dyo, n),
                        jnp.remainder(i0[..., 2] + dzo, n)], -1)
        wk = (jnp.where(dxo, w[..., 0], 1.0 - w[..., 0])
              * jnp.where(dyo, w[..., 1], 1.0 - w[..., 1])
              * jnp.where(dzo, w[..., 2], 1.0 - w[..., 2]))
        out = out + wk[..., None] * field4[_flat(ic, n)]
    return out


@partial(jax.jit, static_argnames=("with_potential",))
def pm_accel(kern: PMKernel, pos, mass, *, with_potential: bool = False):
    """Long-range acceleration (and optional potential) for all particles.

    Returns (acc (N,3), pot (N,)). Raw internal units (no G), matching
    ops.direct conventions. pot has the per-particle mesh self term left
    IN; the caller subtracts mass*pot_self and adds the reference's
    psi(0)/box term (see simulation potential assembly).

    With kern.interlace the density is deposited on the grid AND a
    half-cell-shifted copy (combined in k space with the alias-cancelling
    phase), and forces are gathered from both the grid and the shifted
    grid points — cancelling the leading CIC alias images on both sides
    (p99 force error 5.7e-4 vs 2.7e-3 at mesh 128, asmth 2).
    """
    n = kern.n
    box = kern.box
    h = box / n
    pos = jnp.remainder(pos, box)

    def fwd(p):
        rho = cic_deposit(p, mass, box, n)
        return _dft3(rho, jnp.zeros_like(rho), kern.fmat_r, kern.fmat_i)

    re, im = fwd(pos)
    if kern.interlace:
        k1 = kern.kvec
        ph = 0.5 * h * (k1[:, None, None] + k1[None, :, None]
                        + k1[None, None, :])
        cph, sph = jnp.cos(ph), jnp.sin(ph)
        re2, im2 = fwd(jnp.remainder(pos + 0.5 * h, box))
        re, im = (0.5 * (re + re2 * cph - im2 * sph),
                  0.5 * (im + re2 * sph + im2 * cph))
    phi_r = re * kern.greens
    phi_i = im * kern.greens

    # inverse transform = forward with conjugated matrices; fold the
    # conjugation into operand swaps (B = F*, so re' = Fr re + Fi im ...)
    br, bi = kern.fmat_r, -kern.fmat_i

    def solve(shift):
        """Real-space [ax, ay, az, pot] rows; shift: also phase-rotate to
        the half-cell grid points before the inverse transform."""
        fields = []
        kx = kern.kvec[:, None, None]
        ky = kern.kvec[None, :, None]
        kz = kern.kvec[None, None, :]
        hats = [(kc * phi_i, -kc * phi_r) for kc in (kx, ky, kz)]
        if with_potential:
            hats.append((phi_r, phi_i))
        for ar, ai in hats:
            if shift:
                ar, ai = ar * cph - ai * sph, ar * sph + ai * cph
            rr, _ = _dft3(ar, ai, br, bi)
            fields.append(rr.reshape(-1))
        if not with_potential:
            fields.append(jnp.zeros(n ** 3, jnp.float32))
        return jnp.stack(fields, axis=-1)                   # (n^3, 4)

    out = cic_gather(solve(False), pos, box, n)
    if kern.interlace:
        out2 = cic_gather(solve(True), jnp.remainder(pos - 0.5 * h, box),
                          box, n)
        out = 0.5 * (out + out2)
    return out[..., :3], out[..., 3]


# ---------------------------------------------------------------------------
# Vacuum (isolated) PM: zero-padded Hockney-Eastwood convolution.
#
# The periodic kernel above is an analytic k-space Green's function — its
# convolution is the PERIODIC lattice sum. Isolated halos need the free-
# space solution, so the padded-grid Green's function is instead the DFT
# of the REAL-SPACE screened kernel -erf(alpha r)/r sampled on the 2n
# grid (minimum-image on the doubled box): cyclic convolution with it is
# EXACT linear convolution for any pair inside the physical n-region,
# and the same TreePM split (short = screened pairs under rcut in the
# tree engines with pbc=(0, alpha, rcut), long = this mesh) reproduces
# the open-boundary force to mesh accuracy. This replaces nothing in the
# reference (GADGET-1.1 has no PM at all) — it is the TPU-side choice
# that moves the far field of isolated runs from tree multipoles onto
# the MXU's matmul DFTs.


class PMKernelFree(NamedTuple):
    fmat_r: jax.Array     # (2n, 2n) forward DFT cos on the padded grid
    fmat_i: jax.Array     # (2n, 2n) forward DFT -sin
    greens: jax.Array     # (2n,2n,2n) DFT[-erf(ar)/r]/(2n)^3 / W_cic^2
    kvec: jax.Array       # (2n,) physical k of the padded grid (signed)
    origin: jax.Array     # (3,) physical position of grid point (0,0,0)
    box: float            # physical span of the n-region (L)
    n: int                # physical mesh size (padded arrays are 2n)
    alpha: float
    rcut: float
    pot_self: float
    interlace: bool


jax.tree_util.register_pytree_node(
    PMKernelFree,
    lambda k: ((k.fmat_r, k.fmat_i, k.greens, k.kvec, k.origin),
               (k.box, k.n, k.alpha, k.rcut, k.pot_self, k.interlace)),
    lambda aux, ch: PMKernelFree(*ch, *aux),
)


def build_pm_kernel_free(center, radius: float, n: int = 128,
                         asmth: float = 1.25, rcut_fac: float = 4.5,
                         interlace: bool = True) -> PMKernelFree:
    """Free-space mesh kernel covering the sphere (center, radius).

    The physical span L solves L = 2*radius + 2*(rcut + 2h) with
    h = L/n: margin so every particle (and its interlaced half-cell
    images) deposits without wrap and the short-range ball never reaches
    the padding region."""
    pad_cells = 2.0 * (rcut_fac * asmth + 2.0)
    L = 2.0 * float(radius) / max(1.0 - pad_cells / n, 0.5)
    h = L / n
    alpha = 1.0 / (2.0 * asmth * h)
    rcut = rcut_fac * asmth * h
    m = 2 * n

    p = np.arange(m)
    ang = -2.0 * np.pi / m * np.outer(p, p)
    fmat_r = jnp.asarray(np.cos(ang), jnp.float32)
    fmat_i = jnp.asarray(np.sin(ang), jnp.float32)

    # real-space screened kernel on the doubled box (minimum image)
    imi = ((p + n) % m) - n                       # [-n, n)
    r1 = np.abs(imi).astype(np.float64) * h
    rx = r1[:, None, None]
    ry = r1[None, :, None]
    rz = r1[None, None, :]
    r = np.sqrt(rx * rx + ry * ry + rz * rz)
    with np.errstate(divide="ignore", invalid="ignore"):
        g = -erf_np(alpha * r) / r
    g[0, 0, 0] = -2.0 * alpha / _SQRT_PI
    g = jnp.asarray(g, jnp.float32)

    # one padded-grid DFT at build time (real even kernel -> real spectrum)
    gr, gi = _dft3(g, jnp.zeros_like(g), fmat_r, fmat_i)
    mm = np.where(p > m // 2, p - m, p).astype(np.float64)
    s = np.sinc(mm / m)
    w1 = s * s
    w2 = (w1[:, None, None] * w1[None, :, None] * w1[None, None, :]) ** 2
    greens = gr / jnp.asarray(w2 * m ** 3, jnp.float32)

    k1 = 2.0 * np.pi / (m * h) * mm
    center = np.asarray(center, np.float64)
    origin = jnp.asarray(center - 0.5 * L, jnp.float32)
    kern = PMKernelFree(fmat_r=fmat_r, fmat_i=fmat_i, greens=greens,
                        kvec=jnp.asarray(k1, jnp.float32), origin=origin,
                        box=float(L), n=int(n), alpha=float(alpha),
                        rcut=float(rcut), pot_self=0.0,
                        interlace=bool(interlace))
    probe = jnp.asarray([center + np.array([0.0811, 0.0377, -0.0629])
                         * radius], jnp.float32)
    _, pot = pm_accel_free(kern, probe, jnp.ones(1, jnp.float32),
                           with_potential=True)
    return kern._replace(pot_self=float(pot[0]))


@partial(jax.jit, static_argnames=("with_potential",))
def pm_accel_free(kern: PMKernelFree, pos, mass, *,
                  with_potential: bool = False):
    """Long-range acceleration (and optional potential), open boundaries.

    Same conventions as pm_accel: raw internal units, per-particle mesh
    self term left in pot."""
    n = kern.n
    m = 2 * n
    box = kern.box
    h = box / n
    # clamp guard: build_pm_kernel_free's margin keeps real particles
    # >= 2h from the region edge; the clamp only ever moves escapers
    q = jnp.clip(pos - kern.origin[None, :], 1.6 * h, box - 1.6 * h)

    def fwd(p):
        rho = cic_deposit(p, mass, box, n)
        rho_p = jnp.zeros((m, m, m), jnp.float32).at[:n, :n, :n].set(rho)
        return _dft3(rho_p, jnp.zeros_like(rho_p), kern.fmat_r,
                     kern.fmat_i)

    re, im = fwd(q)
    if kern.interlace:
        k1 = kern.kvec
        ph = 0.5 * h * (k1[:, None, None] + k1[None, :, None]
                        + k1[None, None, :])
        cph, sph = jnp.cos(ph), jnp.sin(ph)
        re2, im2 = fwd(q + 0.5 * h)
        re, im = (0.5 * (re + re2 * cph - im2 * sph),
                  0.5 * (im + re2 * sph + im2 * cph))
    phi_r = re * kern.greens
    phi_i = im * kern.greens

    br, bi = kern.fmat_r, -kern.fmat_i

    def solve(shift):
        fields = []
        kx = kern.kvec[:, None, None]
        ky = kern.kvec[None, :, None]
        kz = kern.kvec[None, None, :]
        hats = [(kc * phi_i, -kc * phi_r) for kc in (kx, ky, kz)]
        if with_potential:
            hats.append((phi_r, phi_i))
        for ar, ai in hats:
            if shift:
                ar, ai = ar * cph - ai * sph, ar * sph + ai * cph
            rr, _ = _dft3(ar, ai, br, bi)
            fields.append(rr[:n, :n, :n].reshape(-1))
        if not with_potential:
            fields.append(jnp.zeros(n ** 3, jnp.float32))
        return jnp.stack(fields, axis=-1)

    out = cic_gather(solve(False), q, box, n)
    if kern.interlace:
        out2 = cic_gather(solve(True), q - 0.5 * h, box, n)
        out = 0.5 * (out + out2)
    return out[..., :3], out[..., 3]
