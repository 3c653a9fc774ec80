"""Counter-based randomness on the torus.

The Go reference uses ``math/rand`` (utils/utils.go:31-49, tlwe/tlwe.go:37-44).
Here everything is a pure function of an explicit ``jax.random`` key, so keygen
and encryption are reproducible, jittable and batchable.  Distributional
semantics match the reference: uniform uint32 masks, Gaussian noise with
standard deviation ``alpha`` (in torus units, i.e. fraction of the torus).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .torus import TORUS, f32_to_torus_traced


def uniform_torus(key: jax.Array, shape) -> jax.Array:
    """Uniform torus elements (rng.Uint32() in tlwe/tlwe.go:42)."""
    return jax.random.bits(key, shape=shape, dtype=jnp.uint32)


def gaussian_torus(key: jax.Array, mu_torus, stddev: float, shape) -> jax.Array:
    """mu + F64ToTorus(N(0,1) * stddev)  (utils/utils.go:31-34)."""
    noise = jax.random.normal(key, shape=shape, dtype=jnp.float32) * jnp.float32(stddev)
    return jnp.asarray(mu_torus, TORUS) + f32_to_torus_traced(noise)


def binary_key(key: jax.Array, n: int) -> jax.Array:
    """Uniform binary secret key bits in {0,1} as uint32 (key/key.go:25-39)."""
    return jax.random.bernoulli(key, 0.5, (n,)).astype(TORUS)


def block_binary_key(key: jax.Array, n: int, block_size: int) -> jax.Array:
    """Block-binary secret key: Hamming weight <= 1 per length-``block_size``
    block, each block uniform over its block_size+1 weight-<=1 patterns.

    This is the key distribution required by block blind rotation — the
    algorithm the reference's parameters advertise (TRGSWLv1Params.BlockSize,
    params/params.go:77,110 "3-4x faster") but never implement (SURVEY.md
    #13).  A ragged final block of r = n mod block_size bits is sampled the
    same way over its r+1 patterns.
    """
    bs = block_size
    full, rem = divmod(n, bs)
    k1, k2 = jax.random.split(key)
    u = jax.random.randint(k1, (full,), 0, bs + 1)      # bs == "empty block"
    bits = (u[:, None] == jnp.arange(bs)).astype(TORUS).reshape(full * bs)
    if rem:
        v = jax.random.randint(k2, (), 0, rem + 1)
        bits = jnp.concatenate(
            [bits, (v == jnp.arange(rem)).astype(TORUS)])
    return bits
