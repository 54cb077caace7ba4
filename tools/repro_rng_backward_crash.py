#!/usr/bin/env python
"""Repro/bisect tool for the TPU-backend compiler crash on large
un-rematerialized backward graphs (see CLAUDE.md round-2 ledger).

Measured matrix on the axon v5e backend (2026-08-16), `--migt` mode
(full-size MIGT train step, 12L/768d, S=20):

    batch  remat  dropout   result
      4     no     rng      COMPILE OK
     40     no     rng      FAILED (HTTP 500, tpu_compile_helper rc=1)
     40     no     hash     FAILED (same)
     40     no     none     FAILED (same)
     40     yes    rng      COMPILE OK
    dense stacks (--depth 48 --width 1024 --batch 2560, grad + rng dropout)
                            COMPILE OK  -> the real MIGT graph is required

Conclusion: the crash is driven by backward-graph SIZE without remat, not
by RNG primitives (the original round-1 attribution). `remat=True` (the
trainers' default) is the required workaround at full size.

2026-08-17 re-check: --migt --batch 40 (no remat) no longer 500s quickly —
it ran >25 min without finishing compilation (killed by timeout). The
failure mode changed from fast compiler error to pathologically slow
compile; either way the un-rematerialized full-size graph is unusable and
remat remains the required default. Bound re-runs with `timeout`.

Usage on the target backend:
  python tools/repro_rng_backward_crash.py --migt --batch 40            # crash?
  python tools/repro_rng_backward_crash.py --migt --batch 40 --remat    # OK?
Exits 0 if compilation succeeds, 1 on compiler failure (prints the error
head). Re-run after backend upgrades to detect when remat stops being
necessary; `--depth/--width/--batch` bisect the threshold. The dense-stack
mode (no --migt) is kept as the negative control.

Watchdog mode (the one-command re-check after backend upgrades):
  python tools/repro_rng_backward_crash.py --watchdog
runs the canonical probe (--migt --batch 40, no remat) in a bounded
subprocess and appends ONE line to tools/backend_crash_history.jsonl with
the backend version and the outcome (ok / compile_failed / timeout). The
day it records "ok", drop the remat default and reclaim the recompute tax.
"""
import argparse
import sys


def build(depth, width, remat, hash_dropout):
    import jax
    import jax.numpy as jnp

    def layer(x, w, key):
        h = x @ w
        if hash_dropout:
            sys.path.insert(0, __file__.rsplit('/', 2)[0])
            from viewformer_tpu.ops.dropout import hash_dropout as hd
            h = hd(key, h, 0.1)
        else:
            keep = jax.random.bernoulli(key, 0.9, h.shape)
            h = jnp.where(keep, h / 0.9, jnp.zeros((), h.dtype))
        return jnp.tanh(h)

    if remat:
        layer = jax.checkpoint(layer)

    def loss(ws, x, key):
        for i, w in enumerate(ws):
            x = layer(x, w, jax.random.fold_in(key, i))
        return jnp.sum(x * x)

    return jax.jit(jax.grad(loss))


def migt_repro(args):
    """Grad of the real MIGT forward with dropout, remat off — the original
    crashing graph (scale down with --depth/--width/--batch to bisect)."""
    import sys as _sys
    _sys.path.insert(0, __file__.rsplit('/', 2)[0])
    import jax
    import jax.numpy as jnp
    import numpy as np

    from viewformer_tpu.config import MIGTConfig
    from viewformer_tpu.train.transformer import (create_transformer_optimizer,
                                                  init_transformer_state,
                                                  make_transformer_train_step)

    config = MIGTConfig(n_layer=args.depth, d_model=args.width,
                        n_head=max(1, args.width // 64))
    if args.no_dropout:
        import dataclasses
        config = dataclasses.replace(config, dropout=0.0)
    print(f'MIGT n_layer={config.n_layer} d_model={config.d_model} '
          f'B={args.batch} S={config.sequence_size} remat={args.remat} '
          f'dropout_impl={"hash" if args.hash else "rng"}', flush=True)
    optimizer, _ = create_transformer_optimizer(config)
    model, state = init_transformer_state(
        config, jax.random.PRNGKey(0), optimizer,
        dtype=jnp.bfloat16, dropout_impl='hash' if args.hash else 'rng',
        remat=args.remat)
    step_fn = make_transformer_train_step(model, config, optimizer, donate=False)
    rs = np.random.RandomState(0)
    poses = rs.randn(args.batch, config.sequence_size, 7).astype(np.float32)
    poses[..., 3:] /= np.linalg.norm(poses[..., 3:], axis=-1, keepdims=True)
    tokens = rs.randint(0, config.n_embeddings,
                        (args.batch, config.sequence_size,
                         config.token_image_size, config.token_image_size))
    batch = (jnp.asarray(poses), jnp.asarray(tokens))
    try:
        lowered = step_fn.lower(state, batch, jax.random.PRNGKey(1))
        lowered.compile()
    except Exception as e:  # noqa: BLE001
        print(f'COMPILE FAILED: {type(e).__name__}: {str(e)[:800]}')
        sys.exit(1)
    print('COMPILE OK')
    sys.exit(0)


def watchdog(probe_timeout):
    """Run the canonical crashing probe bounded, append one history line."""
    import datetime
    import json
    import os
    import subprocess
    import time

    import jax
    import jaxlib

    dev = jax.devices()[0]
    info = {
        'date': datetime.date.today().isoformat(),
        'jax': jax.__version__,
        'jaxlib': jaxlib.__version__,
        'backend': jax.default_backend(),
        'device': getattr(dev, 'device_kind', str(dev)),
        'platform_version': getattr(dev.client, 'platform_version', ''),
        'probe': 'migt 12L/768d B=40 S=20 no-remat rng-dropout compile',
    }
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), '--migt', '--batch', '40'],
            capture_output=True, text=True, timeout=probe_timeout)
        if proc.returncode == 0:
            info['result'] = 'ok'
        else:
            info['result'] = 'compile_failed'
            tail = (proc.stdout + proc.stderr).strip().splitlines()
            info['error_head'] = tail[-1][:200] if tail else ''
    except subprocess.TimeoutExpired:
        info['result'] = f'timeout>{probe_timeout}s'
    info['seconds'] = round(time.time() - t0, 1)
    history = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           'backend_crash_history.jsonl')
    with open(history, 'a') as f:
        f.write(json.dumps(info) + '\n')
    print(json.dumps(info))
    if info['result'] == 'ok':
        print('BACKEND FIXED: the un-rematerialized full-size graph now '
              'compiles — consider dropping remat=True as the trainer default '
              '(halves the recompute tax).')
    else:
        print('Backend still requires remat at full size (expected).')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--depth', type=int, default=24)
    ap.add_argument('--width', type=int, default=768)
    ap.add_argument('--batch', type=int, default=1280)
    ap.add_argument('--remat', action='store_true')
    ap.add_argument('--hash', action='store_true')
    ap.add_argument('--cpu', action='store_true')
    ap.add_argument('--migt', action='store_true',
                    help='use the real MIGT train step instead of the dense stack')
    ap.add_argument('--no-dropout', action='store_true',
                    help='(with --migt) dropout=0: isolates graph size from RNG')
    ap.add_argument('--watchdog', action='store_true',
                    help='bounded probe + one JSONL history line '
                         '(tools/backend_crash_history.jsonl)')
    ap.add_argument('--probe-timeout', type=int, default=600)
    args = ap.parse_args()

    if args.watchdog:
        watchdog(args.probe_timeout)
        return

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    if args.migt:
        migt_repro(args)
        return
    print(f'backend={jax.default_backend()} depth={args.depth} '
          f'width={args.width} batch={args.batch} remat={args.remat} '
          f'hash={args.hash}', flush=True)

    grad_fn = build(args.depth, args.width, args.remat, args.hash)
    rs = np.random.RandomState(0)
    ws = [jnp.asarray(rs.randn(args.width, args.width), jnp.float32)
          for _ in range(args.depth)]
    x = jnp.asarray(rs.randn(args.batch, args.width), jnp.float32)
    key = jax.random.PRNGKey(0)
    try:
        lowered = grad_fn.lower(ws, x, key)
        lowered.compile()
    except Exception as e:  # noqa: BLE001 — report any compiler failure
        print(f'COMPILE FAILED: {type(e).__name__}: {str(e)[:500]}')
        sys.exit(1)
    print('COMPILE OK')
    sys.exit(0)


if __name__ == '__main__':
    main()
