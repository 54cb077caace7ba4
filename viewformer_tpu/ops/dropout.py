"""RNG-primitive-free dropout via integer hashing.

The axon dev tunnel's TPU compiler crashes on any RNG primitive (threefry or
rbg) inside large BACKWARD graphs (full-size MIGT grad-with-dropout; the
deterministic grad and the forward-with-dropout compile fine). This module
provides an equivalent dropout whose noise comes from a xxhash-style integer
mix of (key, element index) — plain elementwise integer ops that any
compiler handles. Marginal distribution is Bernoulli(1-rate) with uniform
hash quality; select with `dropout_impl='hash'` on MIGT / the trainers.
jax.random dropout remains the default everywhere else.
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
