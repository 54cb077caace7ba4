#!/usr/bin/env python
"""Benchmark: 128px novel-view frames/sec/chip (encode + one-shot generate +
decode), the BASELINE.json primary metric.

Measures the full reference inference path on real hardware: encode all S=20
context frames through the VQ-GAN tower, one MIGT transformer pass predicting
the query frame's full 8x8 token grid (single-shot, matching reference
inference — see BASELINE.md note on decode semantics), decode the generated
frame. Models are the full-size reference configs (VQ-GAN ch=128 @128px;
MIGT 12L/768d/12H over 20x64 tokens), bf16 compute.

vs_baseline uses an analytic estimate of the reference stacks on A100 (no
published numbers exist; BASELINE.json "published" is empty): ~40 novel
views/sec/A100 for the same batched encode(20f)+transformer+decode path,
derived from public taming-transformers VQGAN throughput (~800 img/s encode
at 128px fp16 => 40 seq/s) with the transformer pass overlapping. Replace
with a measured number when available.
"""
import json
import time

import numpy as np

ESTIMATED_A100_REFERENCE_FPS = 40.0


def main():
    import os

    import jax
    import jax.numpy as jnp

    # persistent XLA compile cache: first run pays compile, reruns are fast
    cache_dir = os.path.expanduser('~/.cache/viewformer_tpu/xla_cache')
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from viewformer_tpu.config import MIGTConfig, VQGANConfig
    from viewformer_tpu.models import AutoModel

    codebook_config = VQGANConfig()
    transformer_config = MIGTConfig()
    S = transformer_config.sequence_size
    B = 8  # sequences per call -> 160 images through the conv tower

    codebook = AutoModel.from_config(codebook_config, dtype=jnp.bfloat16)
    transformer = AutoModel.from_config(transformer_config, dtype=jnp.bfloat16)

    # init on CPU (on-device init would recompile both towers just to draw
    # random numbers), then transfer
    cpu = jax.devices('cpu')[0]
    with jax.default_device(cpu):
        rng = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(rng, 3)
        dummy_img = jnp.zeros((1, 128, 128, 3), jnp.float32)
        codebook_vars = codebook.init({'params': k1, 'quantizer': k2}, dummy_img,
                                      training=False)
        dummy_poses = jnp.zeros((1, S, 7), jnp.float32)
        dummy_tokens = jnp.zeros((1, S, 8, 8), jnp.int32)
        transformer_vars = transformer.init(k3, dummy_poses, dummy_tokens,
                                            compute_losses=False)
    device = jax.devices()[0]
    codebook_vars = jax.device_put(codebook_vars, device)
    transformer_vars = jax.device_put(transformer_vars, device)

    from viewformer_tpu.evaluate.transformer import make_generate_batch_predictions
    predict = make_generate_batch_predictions(transformer, transformer_vars,
                                              codebook, codebook_vars)

    images = jnp.asarray(np.random.RandomState(0).rand(B, S, 128, 128, 3) * 2 - 1,
                         jnp.float32)
    q = np.random.RandomState(1).randn(B, S, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    cameras = jnp.asarray(np.concatenate([np.random.RandomState(2).randn(B, S, 3), q], -1),
                          jnp.float32)

    # warmup / compile
    out = predict(images, cameras)
    jax.block_until_ready(out)
    out = predict(images, cameras)
    jax.block_until_ready(out)

    iters = 20
    start = time.perf_counter()
    for _ in range(iters):
        out = predict(images, cameras)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start

    frames_per_sec = B * iters / elapsed
    n_chips = jax.device_count()
    value = frames_per_sec / n_chips
    print(json.dumps({
        'metric': '128px novel-view frames/sec/chip (encode+generate+decode)',
        'value': round(value, 3),
        'unit': 'frames/s/chip',
        'vs_baseline': round(value / ESTIMATED_A100_REFERENCE_FPS, 3),
    }))


if __name__ == '__main__':
    main()
