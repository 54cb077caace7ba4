#!/usr/bin/env python
"""Perf experiments for the driver bench (bench.py main metric).

Measures, on the real chip:
  1. per-stage times (encode / generate / decode), each fetched to host
  2. the current serialized loop (dispatch -> fetch -> dispatch ...)
  3. a pipelined loop (keep k outputs in flight; fetch i while i+1..i+k run)
  4. batch-size sweep

Not part of the driver contract — a scratch tool behind bench.py changes.
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--depth', type=int, default=2, help='in-flight outputs')
    ap.add_argument('--stages', action='store_true')
    ap.add_argument('--gen-compare', action='store_true',
                    help='time prefill+generate vs one-shot generate (bf16)')
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    from viewformer_tpu.config import MIGTConfig, VQGANConfig
    from viewformer_tpu.models import AutoModel

    S, B = 20, args.batch
    codebook = AutoModel.from_config(VQGANConfig(), dtype=jnp.bfloat16)
    transformer = AutoModel.from_config(MIGTConfig(), dtype=jnp.bfloat16)
    cpu = jax.devices('cpu')[0]
    with jax.default_device(cpu):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        codebook_vars = codebook.init({'params': k1, 'quantizer': k2},
                                      jnp.zeros((1, 128, 128, 3), jnp.float32),
                                      training=False)
        transformer_vars = transformer.init(
            k3, jnp.zeros((1, S, 7), jnp.float32),
            jnp.zeros((1, S, 8, 8), jnp.int32), compute_losses=False)
    device = jax.devices()[0]
    cvars = jax.device_put({'params': codebook_vars['params'],
                            'quantizer': codebook_vars['quantizer']}, device)
    tvars = jax.device_put({'params': transformer_vars['params']}, device)

    @jax.jit
    def encode_fn(cvars, images):
        flat = images[:, :-1].reshape((B * (S - 1),) + images.shape[2:])
        _q, _l, codes = codebook.apply(cvars, flat, training=False,
                                       method=type(codebook).encode)
        return codes.reshape(B, S - 1, 8, 8).astype(jnp.int32)

    from viewformer_tpu.models.migt_incremental import (generate_frame,
                                                        prefill_cache)

    to_bf16 = lambda t: jax.tree.map(  # noqa: E731
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, t)
    tvars = to_bf16(tvars)

    @jax.jit
    def generate_fn(tvars, cameras, codes):
        padded_codes = jnp.concatenate([codes, jnp.zeros_like(codes[:, :1])], 1)
        cache = prefill_cache(transformer, tvars['params'], padded_codes,
                              cameras, dtype=jnp.bfloat16, valid_frames=S - 1)
        logits = generate_frame(transformer, tvars['params'], cache,
                                cameras[:, -1])
        return jnp.argmax(logits, -1)

    @jax.jit
    def oneshot_generate_fn(tvars, cameras, codes):
        masked = jnp.concatenate(
            [codes, jnp.full_like(codes[:, :1], transformer.mask_token)], 1)
        out = transformer.apply(tvars, cameras, masked, compute_losses=False)
        return jnp.argmax(out['logits'], -1)[:, -1]

    @jax.jit
    def decode_fn(cvars, generated_codes):
        dec = codebook.apply(cvars, generated_codes, method=type(codebook).decode_code)
        return ((jnp.clip(dec, -1, 1) / 2 + 0.5) * 255.0 + 0.5).astype(jnp.uint8)

    encode = functools.partial(encode_fn, cvars)
    generate = functools.partial(generate_fn, tvars)
    decode = functools.partial(decode_fn, cvars)

    images = jax.device_put(
        jnp.asarray(np.random.RandomState(0).rand(B, S, 128, 128, 3) * 2 - 1,
                    jnp.float32), device)
    q = np.random.RandomState(1).randn(B, S, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    cameras = jax.device_put(
        jnp.asarray(np.concatenate([np.random.RandomState(2).randn(B, S, 3), q], -1),
                    jnp.float32), device)

    def pipeline(images, cameras):
        return decode(generate(cameras, encode(images)))

    t0 = time.time()
    np.asarray(pipeline(images, cameras))
    print(f'compile+warm: {time.time() - t0:.1f}s', flush=True)
    np.asarray(pipeline(images, cameras))

    iters = args.iters

    if args.gen_compare:
        codes = encode(images)
        np.asarray(codes)
        for name, fn in (('prefill+generate',
                          lambda: generate_fn(tvars, cameras, codes)),
                         ('one-shot',
                          lambda: oneshot_generate_fn(tvars, cameras, codes))):
            np.asarray(fn())
            inflight = None
            t0 = time.perf_counter()
            for _ in range(iters):
                nxt = fn()
                if inflight is not None:
                    np.asarray(inflight)
                inflight = nxt
            np.asarray(inflight)
            dt = (time.perf_counter() - t0) / iters
            print(f'generate[{name}]: {dt * 1000:.1f} ms/call '
                  f'({B / dt:.1f} seq/s)', flush=True)
        return

    if args.stages:
        codes = encode(images)
        np.asarray(codes)
        gen = generate(cameras, codes)
        np.asarray(gen)
        for name, fn in (('encode', lambda: encode(images)),
                         ('generate', lambda: generate(cameras, codes)),
                         ('decode', lambda: decode(gen))):
            # pipelined per-stage loop: measures device time of the stage
            # alone (fetch of the previous call overlaps the next dispatch)
            np.asarray(fn())
            inflight = None
            t0 = time.perf_counter()
            for _ in range(iters):
                nxt = fn()
                if inflight is not None:
                    np.asarray(inflight)
                inflight = nxt
            np.asarray(inflight)
            dt = (time.perf_counter() - t0) / iters
            print(f'{name}: {dt * 1000:.1f} ms/call pipelined '
                  f'({B / dt:.1f} seq/s)', flush=True)

    # serialized loop (current bench.py)
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(pipeline(images, cameras))
    dt = time.perf_counter() - t0
    print(f'serialized: {B * iters / dt:.1f} frames/s ({dt / iters * 1000:.1f} ms/iter)',
          flush=True)

    # pipelined loop
    for depth in (1, args.depth, 4):
        inflight = []
        t0 = time.perf_counter()
        for _ in range(iters):
            inflight.append(pipeline(images, cameras))
            if len(inflight) > depth:
                np.asarray(inflight.pop(0))
        while inflight:
            np.asarray(inflight.pop(0))
        dt = time.perf_counter() - t0
        print(f'pipelined(depth={depth}): {B * iters / dt:.1f} frames/s '
              f'({dt / iters * 1000:.1f} ms/iter)', flush=True)


if __name__ == '__main__':
    main()
