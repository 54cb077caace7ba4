#!/usr/bin/env python
"""Colors quality gate at scale on TPU (VERDICT r2 directive #2).

Runs the COMPLETE product pipeline through the CLI at full reference model
sizes on the hermetic colors fixture — dataset generate -> train codebook
(6k steps) -> generate-codes -> train transformer (4k steps) -> evaluate
transformer — and gates on end-to-end QUALITY, not just "it trains":

    psnr      >= --min-psnr   (default 22.0 — ratcheted after the lr-scaled
                               2026-08-18 run measured 26.14; the old 17.0
                               was calibrated on the off-recipe-lr protocol)
    loc-angle <= --max-ori    (default 0.02 rad — measured 0.0154)

The step defaults (6k/4k) are the configuration the thresholds were
calibrated against. A 2k/2k run measured only 12.1 dB (2026-08-18): the
codebook caps everything downstream that early, so shorter-horizon runs
fail the gate by under-training, not by regression — keep steps and
thresholds in lockstep when changing either.

plus the paper's signature behavioral property: PSNR must increase with
context size. One `evaluate transformer-multictx` pass produces the
per-context-size table (the branch streams evaluate every context size in
a single forward — ref evaluate_transformer_multictx.py:13-34,125-138).
The gate asserts (a) no adjacent pair dips more than --mono-slack (screens
inversions; pairs carry ~+-0.4 dB noise at 24 eval sequences) and (b)
PSNR(ctx max) - PSNR(ctx 1) >= --min-ctx-gain (the sharp signal: measured
+7.2 dB; a branching-attention mask bug that leaks future frames or drops
context flattens the curve to ~0 gain).

This is the only end-to-end *accuracy* evidence obtainable offline (round 1
measured PSNR 12.4->13.4 and ori 0.18->0.08 in just 400 steps at smaller
scale). Writes QUALITY_r04.json with the full results.json + the table.

Run on the TPU host: `python tools/quality_gate_colors.py` (~80-100 min
through the tunnel at the 6k/4k defaults). `--quick` shrinks everything
for a CPU harness check.
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, env, platform=None, timeout=7200, log=None):
    cmd = [sys.executable, '-m', 'viewformer_tpu']
    if platform:
        cmd += ['--platform', platform]
    cmd += args
    t0 = time.time()
    print('>>', ' '.join(args[:6]), '...', flush=True)
    proc = subprocess.run(cmd, env=env, cwd=REPO, text=True,
                          capture_output=True, timeout=timeout)
    if proc.returncode != 0:
        raise RuntimeError(f'CLI failed ({args[:3]}):\n'
                           + proc.stdout[-2000:] + proc.stderr[-4000:])
    dt = time.time() - t0
    print(f'   done in {dt:.0f}s', flush=True)
    if log is not None:
        log[args[0] + ('/' + args[1] if not args[1].startswith('-') else '')] \
            = round(dt, 1)
    return proc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--workdir', default='/tmp/quality_r04')
    ap.add_argument('--codebook-steps', type=int, default=6000)
    ap.add_argument('--transformer-steps', type=int, default=4000)
    ap.add_argument('--min-psnr', type=float, default=22.0,
                    help='ratcheted to 22 after the lr-scaled 2026-08-18 run '
                         'measured 26.1 (was 17, calibrated on the old '
                         'off-recipe-lr protocol that measured 18.2)')
    ap.add_argument('--max-ori', type=float, default=0.02)
    ap.add_argument('--mono-slack', type=float, default=0.75,
                    help='allowed per-pair PSNR dip (dB) in the context-size '
                         'check; adjacent pairs carry ~+-0.4 dB noise at 24 '
                         'eval sequences (measured), so this only screens '
                         'inversions — min-ctx-gain carries the real signal')
    ap.add_argument('--min-ctx-gain', type=float, default=2.0,
                    help='required PSNR(ctx max) - PSNR(ctx 1) rise in dB '
                         '(measured: 7.2; a branch-mask bug gives ~0)')
    ap.add_argument('--regate', metavar='REPORT.json',
                    help='recompute the gate verdict from an existing report '
                         '(threshold iteration without re-running ~80 min of '
                         'training) and rewrite --out')
    ap.add_argument('--quick', action='store_true')
    ap.add_argument('--out', default=os.path.join(REPO, 'QUALITY_r04.json'))
    args = ap.parse_args()

    if args.regate:
        with open(args.regate) as f:
            report = json.load(f)
        ok = _apply_gate(report, report['transformer_eval'],
                         report['codebook_eval'], report['multictx_eval'], args)
        with open(args.out, 'w') as f:
            json.dump(report, f, indent=1)
        print('wrote', args.out, flush=True)
        print('QUALITY GATE ' + ('PASSED' if ok else 'FAILED'), flush=True)
        sys.exit(0 if ok else 1)

    wd = args.workdir
    os.makedirs(wd, exist_ok=True)
    env = dict(os.environ)
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')

    if args.quick:
        image_size, n_seq, seq_len = 32, 12, 8
        cb_steps, tr_steps = 8, 8
        cb_extra = ['--ch', '32', '--num-res-blocks', '1', '--n-embed', '64',
                    '--embed-dim', '8', '--batch-size', '4', '--epochs', '2',
                    '--image-size', '32', '--perceptual-weight', '0']
        tr_extra = ['--d-model', '32', '--n-layer', '1', '--n-head', '2',
                    '--sequence-size', '4', '--token-image-size', '2',
                    '--n-loss-skip', '1', '--batch-size', '2', '--epochs', '2']
        platform = 'cpu'
        eval_n = 4
    else:
        image_size, n_seq, seq_len = 128, 200, 20
        cb_steps, tr_steps = args.codebook_steps, args.transformer_steps
        # full-size VQ-GAN defaults (ch=128, n_embed=1024); perceptual 0
        # because LPIPS weights are env-blocked (PARITY_RUNBOOK.md §2).
        # lr scaled to the batch this gate actually uses: the reference's
        # 1.584e-3 is 4.5e-6/image x batch 352 (the taming-transformers
        # base_lr*batch rule); at batch 32 that rule gives 1.44e-4. Running
        # batch 32 at the batch-352 lr made training chaotic — val PSNR
        # swung 13.9->12.1->13.6 across 600-step windows in the 2026-08-18
        # run while round 3 got a lucky 17.5 trajectory from the same config.
        cb_extra = ['--batch-size', '32', '--epochs', '10',
                    '--learning-rate', '1.44e-4',
                    '--steps-per-call', '10', '--perceptual-weight', '0']
        # full-size MIGT defaults (12L/768d); batch 10 compute-bound on one
        # chip (tools/train_step_sweep.py); lr raised for the short horizon
        tr_extra = ['--batch-size', '10', '--epochs', '10',
                    '--steps-per-call', '20', '--learning-rate', '3e-4']
        platform = None  # default = the real TPU chip
        eval_n = 24

    report = {'config': {'image_size': image_size, 'n_sequences': n_seq,
                         'codebook_steps': cb_steps,
                         'transformer_steps': tr_steps},
              'timings_s': {}}
    log = report['timings_s']
    ds = os.path.join(wd, 'img')

    if not os.path.exists(os.path.join(ds, 'info.json')):
        run_cli(['dataset', 'generate', '--loader', 'colors',
                 '--loader-num-sequences', str(n_seq),
                 '--loader-sequence-size', str(seq_len),
                 '--loader-image-size', str(image_size),
                 '--output', os.path.join(ds, 'colors'),
                 '--max-sequences-per-shard', '32',
                 '--split', 'train', '--split', 'test'],
                env, platform='cpu', log=log)

    # FRESH training runs: a stale job dir silently resumes (the trainers'
    # resume-by-default is right for production, wrong for a gate — the
    # 2026-08-18 rerun resumed its 6k-step codebook from a previous 2k-step
    # attempt's checkpoint instead of training from scratch)
    import shutil
    cb_job = os.path.join(wd, 'codebook')
    shutil.rmtree(cb_job, ignore_errors=True)
    run_cli(['train', 'codebook', '--dataset', ds, '--job-dir', cb_job,
             '--total-steps', str(cb_steps)] + cb_extra,
            env, platform=platform, log=log)

    codes = os.path.join(wd, 'codes')
    shutil.rmtree(codes, ignore_errors=True)
    run_cli(['generate-codes', '--dataset', ds, '--output', codes,
             '--model', cb_job, '--batch-size', '64'],
            env, platform=platform, log=log)

    tr_job = os.path.join(wd, 'transformer')
    shutil.rmtree(tr_job, ignore_errors=True)
    run_cli(['train', 'transformer', '--dataset', codes,
             '--codebook-model', cb_job, '--job-dir', tr_job,
             '--total-steps', str(tr_steps)] + tr_extra,
            env, platform=platform, log=log)

    eval_dir = os.path.join(wd, 'eval')
    run_cli(['evaluate', 'transformer', '--loader', 'dataset',
             '--loader-path', ds, '--loader-split', 'test',
             '--transformer-model', tr_job, '--codebook-model', cb_job,
             '--job-dir', eval_dir, '--batch-size', str(min(eval_n, 8)),
             '--num-eval-sequences', str(eval_n),
             '--num-store-images', '8'],
            env, platform=platform, log=log)

    cb_eval_dir = os.path.join(wd, 'eval_codebook')
    run_cli(['evaluate', 'codebook', '--loader', 'dataset',
             '--loader-path', ds, '--loader-split', 'test',
             '--codebook-model', cb_job, '--job-dir', cb_eval_dir,
             '--batch-size', '16', '--num-eval-images', str(eval_n * 4)],
            env, platform=platform, log=log)

    # multictx: one pass produces PSNR for EVERY context size (the paper's
    # signature table) — the monotonicity assertion below is a sharp
    # end-to-end check of the branching-attention masks
    mc_dir = os.path.join(wd, 'eval_multictx')
    run_cli(['evaluate', 'transformer-multictx', '--loader', 'dataset',
             '--loader-path', ds, '--loader-split', 'test',
             '--transformer-model', tr_job, '--codebook-model', cb_job,
             '--job-dir', mc_dir, '--batch-size', str(min(eval_n, 8)),
             '--num-eval-sequences', str(eval_n),
             '--num-store-images', '0'],
            env, platform=platform, log=log)

    with open(os.path.join(eval_dir, 'results.json')) as f:
        results = json.load(f)
    with open(os.path.join(cb_eval_dir, 'results.json')) as f:
        cb_results = json.load(f)
    with open(os.path.join(mc_dir, 'results.json')) as f:
        mc_results = json.load(f)
    report['transformer_eval'] = results
    report['codebook_eval'] = cb_results
    report['multictx_eval'] = mc_results

    _apply_gate(report, results, cb_results, mc_results, args)

    if not args.quick:
        with open(args.out, 'w') as f:
            json.dump(report, f, indent=1)
        print('wrote', args.out, flush=True)
        if not report['ok']:
            print('QUALITY GATE FAILED', flush=True)
            sys.exit(1)
        print('QUALITY GATE PASSED', flush=True)
    else:
        report['ok'] = None  # quick mode checks the harness, not quality
        print(json.dumps({'quick_psnr': results.get('psnr')}), flush=True)


def _apply_gate(report, results, cb_results, mc_results, args):
    psnr_by_ctx = {ctx: m.get('psnr') for ctx, m in mc_results.items()}
    curve = [psnr_by_ctx[k] for k in sorted(psnr_by_ctx)]
    # Context-size check, calibrated on the 2026-08-18 measured curve
    # (18.9 -> 26.1 dB over ctx 1..19 at 24 eval sequences): adjacent pairs
    # carry ~+-0.4 dB finite-sample noise, so the per-pair slack only
    # screens catastrophic inversions; the sharp signal is the OVERALL rise
    # (min_ctx_gain) — a branch-mask bug that leaks future frames or drops
    # context flattens the curve to ~0 gain, it does not produce a +2 dB
    # rise with one noisy dip.
    mono_ok = (len(curve) >= 2 and all(v is not None for v in curve)
               and all(curve[i + 1] >= curve[i] - args.mono_slack
                       for i in range(len(curve) - 1))
               and curve[-1] - curve[0] >= args.min_ctx_gain)
    report['gate'] = {'min_psnr': args.min_psnr, 'max_ori': args.max_ori,
                      'mono_slack': args.mono_slack,
                      'min_ctx_gain': args.min_ctx_gain,
                      'psnr': results.get('psnr'),
                      'loc_angle': results.get('loc-angle'),
                      'psnr_by_context': psnr_by_ctx,
                      'ctx_gain': (round(curve[-1] - curve[0], 3)
                                   if curve and None not in (curve[0], curve[-1])
                                   else None),
                      'psnr_monotone_in_context': bool(mono_ok)}
    print(json.dumps(report['gate']), flush=True)
    report['ok'] = bool(results['psnr'] >= args.min_psnr
                        and results['loc-angle'] <= args.max_ori
                        and mono_ok)
    return report['ok']


if __name__ == '__main__':
    main()
