"""Vector quantizers as pure functions over explicit state pytrees.

Covers the reference's QuantizeEMA (the one the model uses) and the non-EMA
Quantize with commitment loss; the reference's third variant `QuantizeOld`
(utils_th.py:127) is an unused legacy duplicate and is intentionally not
ported.

Parity targets: the EMA quantizer of /root/reference/viewformer/models/
utils.py:40-177 (tf) and utils_th.py:8-72 (torch): bias-corrected EMA of
cluster sizes and embedding sums with a step counter, Laplace-smoothed
normalization, straight-through estimator.

TPU-native distribution note: the reference hand-all-reduces the EMA
statistics across replicas (ref models/utils.py:151-154,
utils_th.py:51-52). Here the statistics are computed with full-array
semantics inside pjit — with the batch sharded over the mesh's 'data' axis,
XLA inserts the all-reduce automatically, which is exactly the psum the
reference does by hand. No explicit collective is needed unless running under
shard_map (then wrap with jax.lax.psum over 'data').
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp


class QuantizerState(NamedTuple):
    """EMA codebook state. embeddings is [embedding_dim, num_embeddings]
    (column-major codebook, matching the reference layout)."""
    embeddings: jax.Array
    ema_cluster_size_hidden: jax.Array
    ema_dw_hidden: jax.Array
    counter: jax.Array


def init_quantizer_state(key, embedding_dim, num_embeddings, dtype=jnp.float32):
    """Uniform(-sqrt(3), sqrt(3)) init like the reference."""
    limit = jnp.sqrt(3.0)
    embeddings = jax.random.uniform(key, (embedding_dim, num_embeddings),
                                    dtype, minval=-limit, maxval=limit)
    return QuantizerState(
        embeddings=embeddings,
        ema_cluster_size_hidden=jnp.zeros((num_embeddings,), dtype),
        ema_dw_hidden=jnp.zeros((embedding_dim, num_embeddings), dtype),
        counter=jnp.zeros((), jnp.int64 if jax.config.x64_enabled else jnp.int32),
    )


def nearest_codes(embeddings, inputs):
    """Nearest-codebook-entry indices for [..., D] inputs against [D, N].

    Distance expansion |x|^2 - 2 x.W + |w|^2 computed on the MXU; the |x|^2
    term is constant per input and dropped from the argmin."""
    flat = inputs.reshape(-1, embeddings.shape[0]).astype(jnp.float32)
    # full-f32 matmul: code assignment near Voronoi boundaries must not flip
    # under the default (bf16-pass) matmul precision
    scores = 2.0 * jnp.dot(flat, embeddings, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST) \
        - jnp.sum(embeddings.astype(jnp.float32) ** 2, 0)[None, :]
    indices = jnp.argmax(scores, axis=1)
    return indices.reshape(inputs.shape[:-1])


def embed_code(embeddings, indices):
    """Indices [...] -> codebook vectors [..., D]."""
    return jnp.take(embeddings.T, indices, axis=0)


def quantize_ema(state, inputs, *, training, decay=0.99, epsilon=1e-5):
    """EMA vector quantization.

    inputs: [..., D] activations. Returns (quantized [..., D] with
    straight-through gradient, e_latent_loss scalar, indices [...],
    new_state). When training=False the state is returned unchanged."""
    embedding_dim = state.embeddings.shape[0]
    num_embeddings = state.embeddings.shape[1]
    flat = inputs.reshape(-1, embedding_dim).astype(jnp.float32)

    indices = nearest_codes(state.embeddings, inputs)
    quantized = embed_code(state.embeddings, indices).astype(inputs.dtype)
    e_latent_loss = jnp.mean(
        (jax.lax.stop_gradient(quantized.astype(jnp.float32)) - inputs.astype(jnp.float32)) ** 2)

    if training:
        onehot = jax.nn.one_hot(indices.reshape(-1), num_embeddings, dtype=jnp.float32)
        # Global-batch statistics: under pjit with inputs sharded on 'data',
        # these reductions produce the cross-replica sums implicitly.
        embed_onehot_sum = jnp.sum(onehot, axis=0)
        embed_sum = jnp.dot(flat.T, onehot, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)

        ema_cluster_size_hidden = state.ema_cluster_size_hidden + \
            (embed_onehot_sum - state.ema_cluster_size_hidden) * (1 - decay)
        ema_dw_hidden = state.ema_dw_hidden + \
            (embed_sum - state.ema_dw_hidden) * (1 - decay)
        counter = state.counter + 1

        # bias correction (ref models/utils.py:105-115)
        correction = 1.0 - decay ** counter.astype(jnp.float32)
        ema_cluster_size = ema_cluster_size_hidden / correction
        ema_dw = ema_dw_hidden / correction

        # Laplace smoothing of cluster sizes
        n = jnp.sum(ema_cluster_size)
        smoothed = (ema_cluster_size + epsilon) / (n + num_embeddings * epsilon) * n
        embeddings = ema_dw / smoothed

        new_state = QuantizerState(embeddings, ema_cluster_size_hidden, ema_dw_hidden, counter)
    else:
        new_state = state

    # Straight-through estimator
    quantized = inputs + jax.lax.stop_gradient(quantized - inputs)
    return quantized, e_latent_loss, indices, new_state


def quantize_vq(embeddings, inputs, beta=0.25):
    """Non-EMA quantizer with commitment loss (ref models/utils.py:180-261):
    loss = |sg(q) - x|^2 + beta * |q - sg(x)|^2, embeddings trainable."""
    indices = nearest_codes(embeddings, inputs)
    quantized = embed_code(embeddings, indices).astype(inputs.dtype)
    x = inputs.astype(jnp.float32)
    q = quantized.astype(jnp.float32)
    e_latent_loss = jnp.mean((jax.lax.stop_gradient(q) - x) ** 2)
    q_latent_loss = jnp.mean((q - jax.lax.stop_gradient(x)) ** 2)
    loss = e_latent_loss + beta * q_latent_loss
    quantized = inputs + jax.lax.stop_gradient(quantized - inputs)
    return quantized, loss, indices
