"""Replicate the REAL far pass with toggles: full, math-off, gather-off.

Run: python scripts/farpass_micro.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from functools import partial

def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    jax.block_until_ready(leaves)
    float(leaves[-1].ravel()[0].astype(jnp.float32))

def timeit(label, fn, *a, reps=3):
    t0 = time.time(); sync(fn(*a)); tc = time.time() - t0
    t0 = time.time()
    for _ in range(reps): sync(fn(*a))
    dt = (time.time() - t0) / reps
    print(f"{label:<46s} {dt*1e3:9.1f} ms  (c+1 {tc:.1f}s)", flush=True)
    return dt

def main():
    from sidm_tpu.ops import list_force as lf
    from sidm_tpu.ops import fused_force as ff
    from sidm_tpu.ops.fused_force import _far_tile
    from sidm_tpu.ops.tree import build_octree
    from sidm_tpu.io import ics
    N = 1 << 20
    z = np.load(f"/dev/shm/listtune_{N}.npz")
    far = jnp.asarray(z["far"]); nf = jnp.asarray(z["nf"])
    pidx = jnp.asarray(z["pidx"]); gvalid = jnp.asarray(z["gvalid"])
    ng, LF = far.shape
    G = pidx.shape[1]
    pos, vel, mass = ics.nfw(N, rho0=1.49e-4, rs=11.14356, G=43007.1,
                             seed=12345)
    pos = jnp.asarray(pos, jnp.float32); mass = jnp.asarray(mass, jnp.float32)
    eps = jnp.full(N, 0.3, jnp.float32)
    tree = build_octree(pos, mass, eps, jnp.ones(N, bool), box=0.0,
                        depth=ff.default_depth(N))
    ftree = ff.pack_tree(tree)
    tbl, _ = lf.flat_tables(ftree)
    print(f"ng={ng} LF={LF} tbl={tbl.shape}", flush=True)

    GBf, FC = 256, 512
    NBf = ng // GBf
    gt = tree.pos_s[pidx]
    te = jnp.where(gvalid, tree.eps_s[pidx], 1.0)
    big = jnp.asarray(1e30, jnp.float32)
    glo = jnp.min(jnp.where(gvalid[..., None], gt, big), axis=1)
    ghi = jnp.max(jnp.where(gvalid[..., None], gt, -big), axis=1)
    gc = jnp.where(jnp.any(gvalid, axis=1)[:, None], 0.5*(glo+ghi), 0.0)
    xc = jnp.where(gvalid[..., None], gt - gc[:, None, :], 0.0)

    @partial(jax.jit, static_argnames=("mode",))
    def far_pass(tbl, far, nf, xc, te, gc, mode):
        of = jnp.argsort(-nf)
        far_s = far[of]
        xc_s, te_s, gc_s = xc[of], te[of], gc[of]
        bi_f, ci_f, ni = lf._item_schedule(nf[of].reshape(NBf, GBf), FC,
                                           NBf * (LF // FC + 1))
        def item(state):
            i, acc = state
            bi, ci = bi_f[i], ci_f[i]
            g0 = bi * GBf
            ids = lax_ds(far_s, (g0, ci * FC), (GBf, FC))
            deadf = ids == lf.IMAX
            idc = jnp.clip(ids, 0, tbl.shape[0] - 1)
            if mode == "nogather":
                rows = jnp.broadcast_to(tbl[:1], (GBf, FC, 16)) * 1.0
                rows = rows + ids[..., None] * 0.0
            else:
                rows = tbl[idc]
            rows = rows.at[..., 3].set(jnp.where(deadf, 0.0, rows[..., 3]))
            if mode == "nomath":
                da = jnp.sum(rows, axis=1)[:, :3][:, None, :] * jnp.ones((1, G, 1))
            else:
                teb = lax_ds(te_s, (g0, 0), (GBf, G))
                xcb = lax_ds(xc_s, (g0, 0, 0), (GBf, G, 3))
                gcb = lax_ds(gc_s, (g0, 0), (GBf, 3))
                da, _ = _far_tile(rows, xcb, teb, gcb, need_pot=False)
            acc = lax_dus(acc, lax_ds(acc, (g0, 0, 0), (GBf, G, 3)) + da,
                          (g0, 0, 0))
            return i + 1, acc
        from jax import lax
        global lax_ds, lax_dus
        lax_ds = lax.dynamic_slice; lax_dus = lax.dynamic_update_slice
        acc0 = jnp.zeros((ng, G, 3), jnp.float32)
        _, acc = jax.lax.while_loop(lambda s: s[0] < ni, item,
                                    (jnp.int32(0), acc0))
        return acc

    from jax import lax
    global lax_ds, lax_dus
    lax_ds = lax.dynamic_slice; lax_dus = lax.dynamic_update_slice

    for mode in ("full", "nomath", "nogather"):
        timeit(f"real far pass [{mode}]", far_pass, tbl, far, nf, xc, te,
               gc, mode)

if __name__ == "__main__":
    main()
