#!/usr/bin/env python
"""Reference codebook recipe at global batch 352 on one chip (VERDICT r2
directive #5).

The reference trains its VQ-GAN at global batch 352 over 8 GPUs
(ref README.md:199-208 — 44/GPU). This demonstrates the same GLOBAL batch on
a single v5e chip via optax.MultiSteps gradient accumulation (micro-batch 44
x 8 accumulation = exactly 352), at full reference model size (ch=128,
@128px, n_embed=1024), bf16 + remat, through the PRODUCTION trainer (CLI
`train codebook` with --accumulate-grad-batches + --steps-per-call on a real
dataset) — and records sustained micro-steps/s, images/s and the effective
optimizer-update period from the trainer's own metrics.jsonl timestamps.

Why the trainer and not a synthetic step loop: through the axon tunnel a
synthetic Python timing loop that fetches per-call outputs pays a
multi-second device->host state-materialization tax per dispatch and
underreports the chip ~25x (probed r3: threaded step_fn calls cost 13-17s
each while the real trainer sustained 115 img/s the same hour). The scanned
trainer path (state threaded on-device across lax.scan, outputs fetched only
on the logging cadence) is both the production path and the honest number.

Run on the TPU host: `python tools/codebook_352_demo.py` (needs a generated
colors dataset, see --dataset; ~6 min). `--cpu --tiny` for a harness smoke
test. Writes CODEBOOK352_r05.json (earlier rounds kept for history).
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--dataset', default='/tmp/quality_r05/img',
                    help='an existing image dataset (the quality-gate '
                         'workdir by default; any colors dataset works)')
    ap.add_argument('--job-dir', default='/tmp/cb352_job')
    ap.add_argument('--micro-batch', type=int, default=44)
    ap.add_argument('--accumulate', type=int, default=8)
    ap.add_argument('--total-steps', type=int, default=400,
                    help='micro steps (400 = 50 optimizer updates at x8)')
    ap.add_argument('--epochs', type=int, default=4,
                    help='>=3 epoch boundaries so the FIRST (which pays the '
                         'one-time eval-step compile) can be reported apart '
                         'from steady-state boundaries')
    ap.add_argument('--steps-per-call', type=int, default=40,
                    help='micro steps per scanned dispatch (40 = 5 updates)')
    ap.add_argument('--cpu', action='store_true')
    ap.add_argument('--tiny', action='store_true')
    ap.add_argument('--out', default=os.path.join(REPO, 'CODEBOOK352_r05.json'))
    args = ap.parse_args()

    env = dict(os.environ)
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')

    if args.tiny:
        model_flags = ['--ch', '32', '--num-res-blocks', '1', '--n-embed',
                       '64', '--embed-dim', '8', '--image-size', '32']
        args.micro_batch, args.accumulate = 4, 2
        args.total_steps, args.steps_per_call = 8, 4
    else:
        model_flags = []  # full-size VQGANConfig defaults (ch=128 @128px)

    import shutil
    for sub in ('last', 'best'):  # always a FRESH training run
        shutil.rmtree(os.path.join(args.job_dir, sub), ignore_errors=True)
    import glob
    for f in (['metrics.jsonl', 'config.json', 'last_aux.json']
              + [os.path.basename(p) for p in
                 glob.glob(os.path.join(args.job_dir, 'aux-*.json'))]):
        try:
            os.remove(os.path.join(args.job_dir, f))
        except OSError:
            pass

    ds = args.dataset
    if args.tiny:
        # tiny smoke needs its own 32px fixture regardless of --dataset
        ds = os.path.join(args.job_dir, 'img')
        if not os.path.exists(os.path.join(ds, 'info.json')):
            cmd = [sys.executable, '-m', 'viewformer_tpu', '--platform',
                   'cpu', 'dataset', 'generate', '--loader', 'colors',
                   '--loader-num-sequences', '8', '--loader-sequence-size',
                   '8', '--loader-image-size', '32',
                   '--output', os.path.join(ds, 'colors'),
                   '--max-sequences-per-shard', '8', '--split', 'train',
                   '--split', 'test']
            subprocess.run(cmd, env=env, cwd=REPO, check=True)
    elif not os.path.exists(os.path.join(ds, 'info.json')):
        raise SystemExit(f'no dataset at {ds}; generate one first '
                         '(tools/quality_gate_colors.py does)')

    cmd = [sys.executable, '-m', 'viewformer_tpu']
    if args.cpu:
        cmd += ['--platform', 'cpu']
    cmd += ['train', 'codebook', '--dataset', ds, '--job-dir', args.job_dir,
            '--total-steps', str(args.total_steps),
            '--batch-size', str(args.micro_batch),
            '--accumulate-grad-batches', str(args.accumulate),
            '--steps-per-call', str(args.steps_per_call),
            '--log-every', str(args.steps_per_call),
            '--epochs', str(args.epochs),
            '--perceptual-weight', '0'] + model_flags
    t0 = time.time()
    proc = subprocess.run(cmd, env=env, cwd=REPO, text=True,
                          capture_output=True, timeout=5400)
    wall = time.time() - t0
    if proc.returncode != 0:
        raise RuntimeError('train codebook failed:\n' + proc.stdout[-2000:]
                           + proc.stderr[-4000:])

    # sustained rate from consecutive TRAIN windows (--log-every ==
    # steps-per-call -> one window per dispatch). Windows that straddle an
    # epoch boundary contain validation + a checkpoint save (a ~1min block
    # at full size: val-pipeline spin-up + D2H of the ~1GB train state
    # through the tunnel); measure them separately so the train rate isn't
    # polluted — both numbers are reported.
    entries = []
    with open(os.path.join(args.job_dir, 'metrics.jsonl')) as f:
        for line in f:
            rec = json.loads(line)
            if 'train/total_loss' in rec:
                entries.append(('train', rec['step'], rec['time']))
            elif 'val/total_loss' in rec:
                entries.append(('val', rec['step'], rec['time']))
    trains = [(s, t) for kind, s, t in entries if kind == 'train']
    if len(trains) < 2:
        trains.insert(0, (0, 0.0))  # tiny smoke: window includes compile
    val_steps = {s for kind, s, t in entries if kind == 'val'}
    # windows NOT containing a validation block, skipping the compile window
    clean, boundary = [], []
    for (s0, t0_), (s1, t1_) in zip(trains[:-1], trains[1:]):
        window = (s1 - s0, t1_ - t0_)
        if any(s0 < v <= s1 or s0 <= v < s1 for v in val_steps):
            boundary.append(window)
        else:
            clean.append(window)
    if not clean:
        clean = [(trains[-1][0] - trains[0][0], trains[-1][1] - trains[0][1])]
    steps = sum(s for s, _ in clean)
    secs = sum(t for _, t in clean)
    micro_per_s = steps / secs
    # per-boundary overhead (window time minus the train work it contains).
    # The FIRST boundary pays the one-time eval-step compile through the
    # tunnel; steady-state boundaries show what an epoch actually costs.
    overheads = [round(t - s / micro_per_s, 1) for s, t in boundary]
    epoch_overhead = sum(overheads)
    report = {
        'recipe': f'global batch {args.micro_batch * args.accumulate} = '
                  f'{args.micro_batch} micro x {args.accumulate} MultiSteps '
                  f'accumulation (ref README.md:199-208: batch 352 on 8 GPUs)',
        'model': ('full-size VQGAN ch=128 @128px bf16 remat' if not args.tiny
                  else 'tiny smoke config'),
        'path': f'production trainer, --steps-per-call {args.steps_per_call} '
                f'({args.steps_per_call // args.accumulate} optimizer '
                f'updates per dispatch), real input pipeline (uint8 wire)',
        'micro_steps_measured': steps,
        'sustained_micro_steps_per_s': round(micro_per_s, 3),
        'sustained_images_per_s': round(micro_per_s * args.micro_batch, 1),
        'optimizer_update_s': round(args.accumulate / micro_per_s, 2),
        'epoch_boundary_overhead_s': round(epoch_overhead, 1),
        'epoch_boundary_overheads_s': overheads,
        'epoch_boundary_note': 'first boundary includes the one-time '
                               'eval-step compile; later entries are the '
                               'steady-state per-epoch validation cost',
        'total_wall_s_incl_compile': round(wall, 1),
    }
    # achieved TFLOP/s + MFU from the committed XLA-cost-analysis train-step
    # constant (tools/baseline_flops.py; round-5 directive: training MFU)
    if not args.tiny:
        try:
            with open(os.path.join(REPO, 'tools', 'bench_flops.json')) as f:
                gflops_per_image = json.load(f)['codebook_train_gflops_per_image']
            achieved = micro_per_s * args.micro_batch * gflops_per_image * 1e9
            report['train_gflops_per_image'] = gflops_per_image
            report['achieved_tflops_per_s'] = round(achieved / 1e12, 1)
            report['mfu_vs_v5e_bf16_peak'] = round(achieved / 197e12, 3)
        except (OSError, KeyError, ValueError) as e:
            print(f'MFU fields omitted ({e!r}); regenerate with '
                  'tools/baseline_flops.py', file=sys.stderr)
    print(json.dumps(report, indent=1))
    if not (args.tiny or args.cpu):
        with open(args.out, 'w') as f:
            json.dump(report, f, indent=1)
        print('wrote', args.out)


if __name__ == '__main__':
    main()
