#!/usr/bin/env python
"""Measure the full-size transformer train step across batch sizes on TPU.

Times make_transformer_train_step (grad + AdamW, remat, fused dropout
kernels, bf16 compute) at reference model size for a batch sweep, reporting
ms/step and sequences/sec/chip. The state threads on-device between calls
(donated); only the scalar loss is fetched each iteration, so the timing
loop is compute-bound, not tunnel-bound.

Usage: python tools/train_step_sweep.py [--batches 5,10,20] [--iters 8]
"""
import argparse
import sys
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batches', default='5,10,20')
    parser.add_argument('--iters', type=int, default=8)
    parser.add_argument('--no-dropout', action='store_true')
    args = parser.parse_args()

    sys.path.insert(0, __file__.rsplit('/', 2)[0])
    import jax
    import jax.numpy as jnp

    from viewformer_tpu.config import MIGTConfig
    from viewformer_tpu.train.transformer import (create_transformer_optimizer,
                                                  init_transformer_state,
                                                  make_transformer_train_step)

    config = MIGTConfig(dropout=0.0 if args.no_dropout else 0.1)
    optimizer, _ = create_transformer_optimizer(config)
    S, L = config.sequence_size, config.token_image_size

    for batch in map(int, args.batches.split(',')):
        with jax.default_device(jax.devices('cpu')[0]):
            model, state = init_transformer_state(
                config, jax.random.PRNGKey(0), optimizer, jnp.bfloat16,
                dropout_impl='hash', remat=True)
        state = jax.device_put(state, jax.devices()[0])
        step_fn = make_transformer_train_step(model, config, optimizer)
        rs = np.random.RandomState(0)
        poses = rs.randn(batch, S, 7).astype(np.float32)
        poses[..., 3:] /= np.linalg.norm(poses[..., 3:], axis=-1, keepdims=True)
        tokens = rs.randint(0, config.n_embeddings, (batch, S, L, L))
        data = (jax.device_put(jnp.asarray(poses)), jax.device_put(jnp.asarray(tokens)))
        rng = jax.random.PRNGKey(1)

        t0 = time.time()
        state, metrics = step_fn(state, data, rng)
        loss = float(np.asarray(metrics['loss']))
        compile_s = time.time() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, metrics = step_fn(state, data, rng)
            loss = float(np.asarray(metrics['loss']))  # sync: scalar fetch only
        dt = (time.perf_counter() - t0) / args.iters
        print(f'batch {batch:3d}: {dt * 1000:7.1f} ms/step  '
              f'{batch / dt:7.1f} seq/s/chip  (loss {loss:.3f}, '
              f'compile {compile_s:.0f}s)', flush=True)
        del state, data


if __name__ == '__main__':
    main()
