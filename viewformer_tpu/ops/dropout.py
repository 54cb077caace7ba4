"""RNG-primitive-free dropout via integer hashing.

Noise comes from a xxhash-style integer mix of (key, element index) — plain
elementwise integer ops. Two uses:
  1. IN-KERNEL dropout for the fused Pallas attention backward
     (ops/attention_pallas.py): the mask regenerates from (seeds, index)
     inside both the forward and backward kernels, so no dropout residual
     is stored — this is what keeps default training (dropout 0.1) on the
     fused path.
  2. `dropout_impl='hash'` on MIGT / the trainers swaps the residual/MLP
     dropouts too (useful when bisecting compiler issues involving RNG
     primitives).
Marginal distribution is Bernoulli(1-rate) with uniform hash quality;
jax.random dropout remains the default everywhere else.

History note: this module was first written to dodge a backend compiler
crash attributed to RNG primitives in large backward graphs. Later bisection
(tools/repro_rng_backward_crash.py) showed the crash is driven by the
un-rematerialized backward graph SIZE, not RNG: full-size MIGT grad at
batch 40 fails with rng, hash, or NO dropout alike, and compiles with remat
in all three cases. Remat (the trainers' default) is the actual fix; the
in-kernel use above is why this module stays.
"""
import math

import jax
import jax.numpy as jnp

_PRIME1 = jnp.uint32(2654435761)
_PRIME2 = jnp.uint32(2246822519)
_PRIME3 = jnp.uint32(3266489917)


def _key_words(key):
    data = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
    if data.shape[0] == 1:
        return data[0], data[0] ^ _PRIME3
    return data[0], data[1]


def hash_uniform(key, shape):
    """Uniform [0, 1) floats of `shape` from an integer hash of the key and
    element indices."""
    k0, k1 = _key_words(key)
    n = int(math.prod(shape)) if shape else 1
    idx = jax.lax.broadcasted_iota(jnp.uint32, (n, 1), 0).reshape(-1)
    h = idx * _PRIME1 + k0
    h = h ^ (h >> 15)
    h = h * _PRIME2
    h = h ^ (h >> 13) ^ k1
    h = h * _PRIME3
    h = h ^ (h >> 16)
    return ((h >> 8).astype(jnp.float32) / jnp.float32(1 << 24)).reshape(shape)


def hash_dropout(key, x, rate):
    """Inverted dropout with hash noise; identity when rate <= 0."""
    if rate <= 0.0:
        return x
    keep = hash_uniform(key, x.shape) >= rate
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros((), x.dtype))
