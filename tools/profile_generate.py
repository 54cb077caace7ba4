#!/usr/bin/env python
"""Ablation breakdown of the prefill+generate stage (bench.py's generate).

The tunnel exposes no xprof viewer, so this measures component costs by
compiling variants: full, attention-as-identity (matmul-only), dense
attention, prefill-only, generate-only. Timings use the one-in-flight
pipelined loop (fetch overlapped)."""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from viewformer_tpu.config import MIGTConfig
    from viewformer_tpu.models import AutoModel
    from viewformer_tpu.models import migt_incremental as inc

    S, B = 20, 32
    transformer = AutoModel.from_config(MIGTConfig(), dtype=jnp.bfloat16)
    cpu = jax.devices('cpu')[0]
    with jax.default_device(cpu):
        tvars = transformer.init(
            jax.random.PRNGKey(0), jnp.zeros((1, S, 7), jnp.float32),
            jnp.zeros((1, S, 8, 8), jnp.int32), compute_losses=False)
    to_bf16 = lambda t: jax.tree.map(  # noqa: E731
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, t)
    params = jax.device_put(to_bf16(tvars['params']), jax.devices()[0])

    rs = np.random.RandomState(0)
    codes = jax.device_put(jnp.asarray(
        rs.randint(0, 1024, (B, S - 1, 8, 8)), jnp.int32))
    q = rs.randn(B, S, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    cameras = jax.device_put(jnp.asarray(
        np.concatenate([rs.randn(B, S, 3), q], -1), jnp.float32))
    padded = jnp.concatenate([codes, jnp.zeros_like(codes[:, :1])], 1)

    def timed(name, fn, iters=15):
        t0 = time.time()
        np.asarray(fn())
        compile_s = time.time() - t0
        inflight = None
        t0 = time.perf_counter()
        for _ in range(iters):
            nxt = fn()
            if inflight is not None:
                np.asarray(inflight)
            inflight = nxt
        np.asarray(inflight)
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f'{name}: {dt:.1f} ms (compile {compile_s:.0f}s)', flush=True)

    @jax.jit
    def full(params, cameras, padded):
        cache = inc.prefill_cache(transformer, params, padded, cameras,
                                  dtype=jnp.bfloat16, valid_frames=S - 1)
        return jnp.argmax(
            inc.generate_frame(transformer, params, cache, cameras[:, -1]), -1)

    @jax.jit
    def prefill_only(params, cameras, padded):
        cache = inc.prefill_cache(transformer, params, padded, cameras,
                                  dtype=jnp.bfloat16, valid_frames=S - 1)
        return cache['k'].sum()  # force materialization, tiny output

    @jax.jit
    def prefill_dense(params, cameras, padded):
        cache = inc.prefill_cache(transformer, params, padded, cameras,
                                  dtype=jnp.bfloat16, valid_frames=S - 1,
                                  use_fused=False)
        return cache['k'].sum()

    @jax.jit
    def generate_only(params, cache, cameras):
        return jnp.argmax(
            inc.generate_frame(transformer, params, cache, cameras[:, -1]), -1)

    cache = jax.jit(lambda p, c, pa: inc.prefill_cache(
        transformer, p, pa, c, dtype=jnp.bfloat16, valid_frames=S - 1))(
        params, cameras, padded)
    jax.block_until_ready(cache['k'])

    timed('full prefill+generate', lambda: full(params, cameras, padded))
    timed('prefill only (fused attn)', lambda: prefill_only(params, cameras, padded))
    timed('prefill only (dense attn)', lambda: prefill_dense(params, cameras, padded))
    timed('generate only', lambda: generate_only(params, cache, cameras))


if __name__ == '__main__':
    main()
