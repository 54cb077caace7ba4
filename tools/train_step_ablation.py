#!/usr/bin/env python
"""Locate where the full-size transformer train step's time goes.

TRANSFORMER40_r05 measured 0.391 updates/s at B=40 = 26.6% hardware MFU
*including* remat recompute in the FLOP count (tools/bench_flops.json is
cost-analyzed on the remat=True step) — i.e. the MXU is idle ~73% of the
step, so the bottleneck is NOT the algorithmic FLOP count. The tunnel
exposes no xprof viewer (see tools/profile_generate.py), so this measures
component costs the established way: compile ablated variants of the exact
production step and diff the timings.

Variants (full-size MIGT 12L/768d, B=40, S=20, remat, bf16):
  full          the production step (hash dropout 0.1)        [baseline]
  no_dropout    dropout=0 (fused kernels, no in-kernel mask)
  dense_attn    XLA dense attention path instead of Pallas
  no_loc        localization_weight=0 (single-branch stream set)
  fwd_only      loss value only, no grad / no optimizer
  dots          remat_policy=dots (save matmul outputs)

Timing methodology: state threads on-device (donated jit), only the scalar
loss is fetched per iteration (tunnel-safe sync; see train_step_sweep.py).
Each variant runs in its OWN subprocess: instantiating a second
identically-shaped train step in one jax-0.9 process trips an
executable-reuse bug ("Execution supplied 114 buffers but compiled program
expected 118") on the reused step's second invocation — repro'd minimal
with and without donation, not fixed by jax.clear_caches(). Subprocesses
also dodge cross-variant HBM fragmentation; budget for occasional axon
client-init stalls between variants (CLAUDE.md).

Usage on the TPU host (serialize with other chip jobs — 1-core host):
  python tools/train_step_ablation.py [--iters 6] [--variants full,dots]
Writes tools/train_step_ablation.json unless --no-write.
"""
import argparse
import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_variant(name, *, dropout, use_fused, localization, grad,
                remat_policy, iters, batch, tiny=False):
    import jax
    import jax.numpy as jnp

    from viewformer_tpu.config import MIGTConfig
    from viewformer_tpu.models import migt as migt_mod
    from viewformer_tpu.train.transformer import (
        create_transformer_optimizer, init_transformer_state,
        make_transformer_train_step)
    from viewformer_tpu.utils.schedules import Schedule

    jax.clear_caches()  # variants reuse module names; stale lowered-fn cache
    # entries otherwise execute an executable compiled for another variant
    # ("supplied N buffers but compiled program expected M").
    if tiny:  # CPU smoke-test configuration only
        config = MIGTConfig(dropout=dropout, n_layer=2, d_model=48, n_head=2,
                            n_embeddings=32, sequence_size=6, n_loss_skip=1,
                            token_image_size=2)
    else:
        config = MIGTConfig(dropout=dropout)
    if not localization:
        config.localization_weight = Schedule.from_str('0')
    optimizer, _ = create_transformer_optimizer(config)
    S, L = config.sequence_size, config.token_image_size

    orig_attn = migt_mod.multi_end_block_attention
    if not use_fused:
        migt_mod.multi_end_block_attention = functools.partial(
            orig_attn, use_fused=False)
    try:
        with jax.default_device(jax.devices('cpu')[0]):
            model, state = init_transformer_state(
                config, jax.random.PRNGKey(0), optimizer, jnp.bfloat16,
                dropout_impl='hash', remat=True, remat_policy=remat_policy)
        state = jax.device_put(state, jax.devices()[0])

        rs = np.random.RandomState(0)
        poses = rs.randn(batch, S, 7).astype(np.float32)
        poses[..., 3:] /= np.linalg.norm(poses[..., 3:], axis=-1,
                                         keepdims=True)
        tokens = rs.randint(0, config.n_embeddings, (batch, S, L, L))
        data = (jax.device_put(jnp.asarray(poses)),
                jax.device_put(jnp.asarray(tokens)))
        rng = jax.random.PRNGKey(1)

        if grad:
            step_fn = make_transformer_train_step(model, config, optimizer)

            def one(state):
                state, metrics = step_fn(state, data, rng)
                return state, metrics['loss']
        else:
            @jax.jit
            def loss_fn(params, step):
                out = model.apply(
                    {'params': params}, data[0], data[1],
                    compute_losses=True, deterministic=False, step=step,
                    rngs={'dropout': rng, 'pose_noise': rng})
                return jnp.mean(out['loss'])  # per-example in the model

            def one(state):
                return state, loss_fn(state.params, state.step)

        t0 = time.time()
        state, loss = one(state)
        loss = float(np.asarray(loss))
        compile_s = time.time() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            state, loss = one(state)
            loss = float(np.asarray(loss))  # sync: scalar fetch only
        step_s = (time.perf_counter() - t0) / iters
    finally:
        migt_mod.multi_end_block_attention = orig_attn
    del state, data
    return {'step_s': round(step_s, 4), 'seq_per_s': round(batch / step_s, 1),
            'compile_s': round(compile_s, 1), 'loss': round(loss, 4)}


VARIANTS = {
    'full': dict(dropout=0.1, use_fused=True, localization=True, grad=True,
                 remat_policy=None),
    'no_dropout': dict(dropout=0.0, use_fused=True, localization=True,
                       grad=True, remat_policy=None),
    'dense_attn': dict(dropout=0.1, use_fused=False, localization=True,
                       grad=True, remat_policy=None),
    'no_loc': dict(dropout=0.1, use_fused=True, localization=False,
                   grad=True, remat_policy=None),
    'fwd_only': dict(dropout=0.1, use_fused=True, localization=True,
                     grad=False, remat_policy=None),
    'dots': dict(dropout=0.1, use_fused=True, localization=True, grad=True,
                 remat_policy='dots'),
    'attn_remat': dict(dropout=0.1, use_fused=True, localization=True,
                       grad=True, remat_policy='attn'),
    'attn_mlp_remat': dict(dropout=0.1, use_fused=True, localization=True,
                           grad=True, remat_policy='attn_mlp'),
}


def run_inner(args):
    """One variant in this process; prints a single RESULT: json line."""
    sys.path.insert(0, REPO)
    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    spec = VARIANTS[args.variants]
    try:
        res = run_variant(args.variants, iters=args.iters, batch=args.batch,
                          tiny=args.tiny, **spec)
        res['device'] = str(jax.devices()[0])
    except Exception as e:  # noqa: BLE001 — record per-variant failures
        res = {'error': f'{type(e).__name__}: {e}'[:400]}
    print('RESULT: ' + json.dumps(res), flush=True)


def main():
    import subprocess
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=6)
    ap.add_argument('--batch', type=int, default=40)
    ap.add_argument('--variants', default=','.join(VARIANTS))
    ap.add_argument('--cpu', action='store_true')
    ap.add_argument('--tiny', action='store_true',
                    help='2L/48d smoke config (CPU correctness check only)')
    ap.add_argument('--no-write', action='store_true')
    ap.add_argument('--inner', action='store_true',
                    help='(internal) run the single variant in-process')
    ap.add_argument('--timeout', type=float, default=3600,
                    help='per-variant wall clock cap (compile + init stall)')
    args = ap.parse_args()

    if args.inner:
        run_inner(args)
        return

    results = {}
    device = None
    for name in args.variants.split(','):
        if name not in VARIANTS:
            raise SystemExit(f'unknown variant {name!r}')
        print(f'--- {name}: compiling + timing (subprocess) ...', flush=True)
        cmd = [sys.executable, os.path.abspath(__file__), '--inner',
               '--variants', name, '--iters', str(args.iters),
               '--batch', str(args.batch)]
        cmd += ['--cpu'] if args.cpu else []
        cmd += ['--tiny'] if args.tiny else []
        t0 = time.time()
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=args.timeout)
            line = [l for l in proc.stdout.splitlines()
                    if l.startswith('RESULT: ')]
            if line:
                results[name] = json.loads(line[-1][len('RESULT: '):])
                device = results[name].pop('device', device)
            else:
                results[name] = {'error': 'no RESULT line; tail: ' +
                                 (proc.stdout + proc.stderr)[-400:]}
        except subprocess.TimeoutExpired:
            results[name] = {'error': f'timeout>{args.timeout}s'}
        results[name].setdefault('wall_s', round(time.time() - t0, 1))
        print(f'{name}: {json.dumps(results[name])}', flush=True)

    report = {'batch': args.batch, 'iters': args.iters,
              'device': device, 'variants': results}
    print(json.dumps(report, indent=1))
    if not (args.no_write or args.cpu or args.tiny):
        out = os.path.join(REPO, 'tools', 'train_step_ablation.json')
        with open(out, 'w') as f:
            json.dump(report, f, indent=1)
        print('wrote', out)


if __name__ == '__main__':
    main()
