#!/usr/bin/env python
"""Reference codebook recipe at global batch 352 on one chip (VERDICT r2
directive #5).

The reference trains its VQ-GAN at global batch 352 over 8 GPUs
(ref README.md:199-208 — 44/GPU). This demonstrates the same GLOBAL batch on
a single v5e chip via optax.MultiSteps gradient accumulation (micro-batch 44
x 8 accumulation = exactly 352), at full reference model size (ch=128,
@128px, n_embed=1024), bf16 + remat, and records the measured step time +
device memory so the recipe's single-chip feasibility is pinned by numbers
rather than asserted.

Run on the TPU host: `python tools/codebook_352_demo.py`
(`--cpu --tiny` for a harness smoke test). Writes CODEBOOK352_r03.json.
"""
import argparse
import json
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--micro-batch', type=int, default=44)
    ap.add_argument('--accumulate', type=int, default=8)
    ap.add_argument('--updates', type=int, default=3,
                    help='timed optimizer updates (each = accumulate micro steps)')
    ap.add_argument('--cpu', action='store_true')
    ap.add_argument('--tiny', action='store_true')
    ap.add_argument('--out', default=os.path.join(REPO, 'CODEBOOK352_r03.json'))
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    cache_dir = os.path.expanduser('~/.cache/viewformer_tpu/xla_cache')
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    import jax.numpy as jnp
    import numpy as np

    import sys
    sys.path.insert(0, REPO)
    from viewformer_tpu.config import VQGANConfig
    from viewformer_tpu.train.codebook import (create_codebook_optimizer,
                                               init_codebook_state,
                                               make_codebook_train_step)

    if args.tiny:
        config = VQGANConfig(ch=32, ch_mult=[1, 2], num_res_blocks=1,
                             attn_resolutions=[], z_channels=32, embed_dim=8,
                             n_embed=16, image_size=16, perceptual_weight=0.0)
    else:
        # full reference recipe minus the env-blocked LPIPS term
        config = VQGANConfig(perceptual_weight=0.0)
    optimizer = create_codebook_optimizer(config, args.accumulate)
    model, state = init_codebook_state(config, jax.random.PRNGKey(0),
                                       optimizer, jnp.bfloat16, remat=True)
    step_fn = make_codebook_train_step(model, config, optimizer, donate=True)

    size = config.image_size
    rs = np.random.RandomState(0)
    device = jax.devices()[0]
    batch = jax.device_put(jnp.asarray(
        rs.rand(args.micro_batch, size, size, 3) * 2 - 1, jnp.float32), device)

    t0 = time.time()
    state, metrics = step_fn(state, batch)
    np.asarray(metrics['total_loss'])  # axon: fetch, don't block_until_ready
    compile_s = time.time() - t0

    micro_steps = args.updates * args.accumulate
    t0 = time.time()
    for _ in range(micro_steps):
        state, metrics = step_fn(state, batch)
        np.asarray(metrics['total_loss'])
    elapsed = time.time() - t0

    mem = {}
    try:
        stats = device.memory_stats() or {}
        for k in ('bytes_in_use', 'peak_bytes_in_use', 'bytes_limit'):
            if k in stats:
                mem[k + '_gib'] = round(stats[k] / 2**30, 2)
    except Exception:
        pass

    micro_s = elapsed / micro_steps
    report = {
        'recipe': f'global batch {args.micro_batch * args.accumulate} = '
                  f'{args.micro_batch} micro x {args.accumulate} MultiSteps '
                  f'accumulation (ref README.md:199-208: batch 352 on 8 GPUs)',
        'model': 'full-size VQGAN ch=128 @128px bf16 remat' if not args.tiny
                 else 'tiny smoke config',
        'backend': jax.default_backend(),
        'compile_s': round(compile_s, 1),
        'micro_step_s': round(micro_s, 4),
        'optimizer_update_s': round(micro_s * args.accumulate, 3),
        'images_per_s': round(args.micro_batch / micro_s, 1),
        'memory': mem,
        'optimizer_updates_timed': args.updates,
    }
    print(json.dumps(report, indent=1))
    if not (args.tiny or args.cpu):
        with open(args.out, 'w') as f:
            json.dump(report, f, indent=1)
        print('wrote', args.out)


if __name__ == '__main__':
    main()
