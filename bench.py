#!/usr/bin/env python
"""Benchmark: 128px novel-view frames/sec/chip (encode + one-shot generate +
decode), the BASELINE.json primary metric.

Measures the full reference inference path on real hardware: encode all S=20
context frames through the VQ-GAN tower, one MIGT transformer pass predicting
the query frame's full 8x8 token grid (single-shot, matching reference
inference — see BASELINE.md note on decode semantics), decode the generated
frame. Models are the full-size reference configs (VQ-GAN ch=128 @128px;
MIGT 12L/768d/12H over 20x64 tokens), bf16 compute, fused Pallas attention.

The pipeline is three jitted programs (encode / generate / decode) chained on
device — same device work as one giant jit, far faster to compile, and the
natural serving decomposition (context encoding is reusable across queries).
The timed loop keeps ONE batch in flight so the host download of finished
frames overlaps the device rendering the next batch (see inline note).

vs_baseline uses an analytic estimate of the reference stacks on A100 (no
published numbers exist; BASELINE.json "published" is empty): ~40 novel
views/sec/A100 for the same batched encode(20f)+transformer+decode path,
derived from public taming-transformers VQGAN throughput (~800 img/s encode
at 128px fp16 => 40 seq/s) with the transformer pass overlapping. Replace
with a measured number when available.
"""
import json
import os
import time

import numpy as np

ESTIMATED_A100_REFERENCE_FPS = 40.0
S = 20
B = 32  # sequences per call -> 608 context images through the conv tower
# B=48 measured identical fps (117.2 vs 118.4, 2026-08-17): compute-bound.


def _enable_compile_cache():
    """Persistent XLA compile cache (same dir as the CLI): cold full-size
    compiles through the tunnel cost minutes and vary with backend load —
    warm runs keep the whole bench within the driver's budget."""
    import jax
    cache_dir = os.path.expanduser('~/.cache/viewformer_tpu/xla_cache')
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)


def main(verbose=False):
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from viewformer_tpu.config import MIGTConfig, VQGANConfig
    from viewformer_tpu.models import AutoModel

    def log(msg):
        if verbose:
            print(f'[{time.strftime("%H:%M:%S")}] {msg}', flush=True)

    codebook = AutoModel.from_config(VQGANConfig(), dtype=jnp.bfloat16)
    transformer = AutoModel.from_config(MIGTConfig(), dtype=jnp.bfloat16)

    # init on CPU (on-device init would compile both towers just to draw
    # random numbers), then transfer
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
    codebook_vars = jax.device_put(codebook_vars, device)
    transformer_vars = jax.device_put(transformer_vars, device)
    log('params initialized')

    import functools

    cvars = {'params': codebook_vars['params'], 'quantizer': codebook_vars['quantizer']}
    # bf16 transformer weights: the prefill/generate path does raw matmuls
    # with the param arrays (models/migt_incremental.py), so the serving
    # dtype is the PARAM dtype — same convention as --serve below
    to_bf16 = lambda t: jax.tree.map(  # noqa: E731
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, t)
    tvars = {'params': to_bf16(transformer_vars['params'])}

    # variables are jit ARGUMENTS — closure-captured arrays get baked into the
    # HLO as constants and compile time explodes at full model size
    @functools.partial(jax.jit, donate_argnums=())
    def encode_fn(cvars, images):
        # only the S-1 context frames need encoding: the query frame enters
        # the transformer as mask tokens (one-shot generation semantics)
        flat = images[:, :-1].reshape((B * (S - 1),) + images.shape[2:])
        _q, _l, codes = codebook.apply(cvars, flat, training=False,
                                       method=type(codebook).encode)
        return codes.reshape(B, S - 1, 8, 8).astype(jnp.int32)

    # Exact fast form of the reference's one-shot generate: the one-shot pass
    # computes generation-branch logits for EVERY frame and discards all but
    # the query's; prefill (stream-0 tower over the 19 context frames, one
    # block-causal pass) + a single 64-token query branch computes only
    # what's kept. Same outputs (tests/test_migt_incremental.py pins
    # prefill+generate == one-shot); ~2x less transformer work.
    from viewformer_tpu.models.migt_incremental import (generate_frame,
                                                        prefill_cache)

    @jax.jit
    def generate_fn(tvars, cameras, codes):
        # pad the 19 context frames to 20 with a trailing dummy frame:
        # block-causal => it cannot affect the real frames' K/V, and T=20
        # tiles 5x wider in the fused kernel than prime T=19
        padded_codes = jnp.concatenate([codes, jnp.zeros_like(codes[:, :1])], 1)
        cache = prefill_cache(transformer, tvars['params'], padded_codes,
                              cameras, dtype=jnp.bfloat16,
                              valid_frames=S - 1)
        logits = generate_frame(transformer, tvars['params'], cache,
                                cameras[:, -1])
        return jnp.argmax(logits, -1)

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

    t0 = time.time()
    codes = encode(images)
    jax.block_until_ready(codes)
    log(f'encode compiled ({time.time() - t0:.1f}s)')
    t0 = time.time()
    gen = generate(cameras, codes)
    jax.block_until_ready(gen)
    log(f'generate compiled ({time.time() - t0:.1f}s)')
    t0 = time.time()
    img = decode(gen)
    jax.block_until_ready(img)
    log(f'decode compiled ({time.time() - t0:.1f}s)')

    def full_pipeline(images, cameras):
        return decode(generate(cameras, encode(images)))

    # NOTE: block_until_ready does not actually synchronize under the axon
    # tunnel platform — fetch results to host each iteration instead (also
    # the realistic serving path: generated frames must reach the host).
    np.asarray(full_pipeline(images, cameras))  # warm

    # Steady-state loop with one batch in flight: dispatch batch i+1 before
    # fetching batch i, so the ~90ms host download of the finished frames
    # (B*128*128*3 uint8 through the tunnel) overlaps the device rendering
    # the next batch. This is the realistic serving schedule — the device
    # never idles waiting for the host to drain — and every produced frame
    # still reaches host memory inside the timed region. Measured: 1.5x over
    # the serialized dispatch->fetch->dispatch loop; depth>1 adds nothing
    # (fetch time < compute time, so depth 1 already hides it).
    iters = 20
    inflight = None
    t0 = time.perf_counter()
    for _ in range(iters):
        nxt = full_pipeline(images, cameras)
        if inflight is not None:
            out = np.asarray(inflight)
        inflight = nxt
    out = np.asarray(inflight)
    elapsed = time.perf_counter() - t0
    assert out.shape == (B, 128, 128, 3)

    frames_per_sec = B * iters / elapsed
    value = frames_per_sec / jax.device_count()
    print(json.dumps({
        'metric': '128px novel-view frames/sec/chip (encode+generate+decode)',
        'value': round(value, 3),
        'unit': 'frames/s/chip',
        'vs_baseline': round(value / ESTIMATED_A100_REFERENCE_FPS, 3),
    }))


def serve(verbose=False):
    """Opt-in second mode (`bench.py --serve`): steady-state chained serving
    throughput via the KV-cache incremental path (models/migt_incremental.py).

    Scenario: a 19-frame context is cached once; each step generates a novel
    view for a new query pose (one 64-token branch pass over the cache) and
    decodes it — O(T) per frame where the reference re-runs the entire
    sequence per chained frame (O(T^2); ref
    evaluate_transformer_multictx_allimg.py:146-171 keep_last_frame)."""
    import functools

    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from viewformer_tpu.config import MIGTConfig, VQGANConfig
    from viewformer_tpu.models import AutoModel
    from viewformer_tpu.models.migt_incremental import (generate_frame,
                                                        prefill_cache)

    def log(msg):
        if verbose:
            print(f'[{time.strftime("%H:%M:%S")}] {msg}', flush=True)

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
    # bf16 weights + bf16 KV cache: serving config (accumulations stay f32
    # inside the kernels via preferred_element_type)
    to_bf16 = lambda t: jax.tree.map(  # noqa: E731
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, t)
    tparams = jax.device_put(to_bf16(transformer_vars['params']), device)
    cvars = jax.device_put({'params': codebook_vars['params'],
                            'quantizer': codebook_vars['quantizer']}, device)
    log('params initialized')

    @jax.jit
    def build_cache(tparams, tokens, poses):
        # batched prefill: one block-causal pass over all context frames
        # (== scanning extend_cache, tested; far fewer dispatched steps)
        return prefill_cache(transformer, tparams, tokens, poses,
                             max_frames=S, dtype=jnp.bfloat16)

    @jax.jit
    def serve_step(tparams, cvars, cache, query_pose):
        logits = generate_frame(transformer, tparams, cache, query_pose)
        codes = jnp.argmax(logits, -1)
        dec = codebook.apply(cvars, codes, method=type(codebook).decode_code)
        return ((jnp.clip(dec, -1, 1) / 2 + 0.5) * 255.0 + 0.5).astype(jnp.uint8)

    rs = np.random.RandomState(0)
    tokens = jax.device_put(jnp.asarray(
        rs.randint(0, transformer.config.n_embeddings, (B, S - 1, 8, 8)), jnp.int32),
        device)
    q = rs.randn(B, S, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    poses = jax.device_put(jnp.asarray(
        np.concatenate([rs.randn(B, S, 3), q], -1), jnp.float32), device)

    t0 = time.time()
    cache = build_cache(tparams, tokens, poses[:, :-1])
    np.asarray(cache['n'])
    log(f'cache built: 19 context frames ({time.time() - t0:.1f}s)')

    t0 = time.time()
    np.asarray(serve_step(tparams, cvars, cache, poses[:, -1]))  # compile+warm
    log(f'serve_step compiled ({time.time() - t0:.1f}s)')

    # same one-in-flight overlap as main(): next frame renders while the
    # previous one downloads
    iters = 30
    inflight = None
    t0 = time.perf_counter()
    for _ in range(iters):
        nxt = serve_step(tparams, cvars, cache, poses[:, -1])
        if inflight is not None:
            out = np.asarray(inflight)
        inflight = nxt
    out = np.asarray(inflight)
    elapsed = time.perf_counter() - t0
    assert out.shape == (B, 128, 128, 3)

    value = B * iters / elapsed / jax.device_count()
    print(json.dumps({
        'metric': '128px novel-view frames/sec/chip (KV-cache incremental serve)',
        'value': round(value, 3),
        'unit': 'frames/s/chip',
        'vs_baseline': round(value / ESTIMATED_A100_REFERENCE_FPS, 3),
    }))


if __name__ == '__main__':
    import sys
    unknown = set(sys.argv[1:]) - {'-v', '--serve'}
    if unknown:
        print(f'bench.py: unknown argument(s): {" ".join(sorted(unknown))} '
              f'(supported: --serve, -v)', file=sys.stderr)
        sys.exit(2)
    if '--serve' in sys.argv:
        serve(verbose='-v' in sys.argv)
    else:
        main(verbose='-v' in sys.argv)
