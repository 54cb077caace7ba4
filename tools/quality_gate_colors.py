#!/usr/bin/env python
"""Colors quality gate at scale on TPU (VERDICT r2 directive #2).

Runs the COMPLETE product pipeline through the CLI at full reference model
sizes on the hermetic colors fixture — dataset generate -> train codebook
(6k steps) -> generate-codes -> train transformer (4k steps) -> evaluate
transformer — and gates on end-to-end QUALITY, not just "it trains":

    psnr      >= --min-psnr   (default 24.2 — two-seed r5 calibration:
                               worst seed 25.0 minus seed spread 0.41 minus
                               0.4 dB eval noise; see QUALITY_r05.json)
    loc-angle <= --max-ori    (default 0.0194 rad — worst seed 0.0161 +
                               spread + margin, same calibration)

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
scale). Writes QUALITY_r05_seed<seed>.json with the full results.json + the
table (+ the finetune-continuation leg).

Round-5 protocol (two-seed variance, VERDICT r4 weak #1):
    python tools/quality_gate_colors.py --seed 42
    python tools/quality_gate_colors.py --seed 1337
    python tools/quality_gate_colors.py --combine QUALITY_r05_seed42.json \
        QUALITY_r05_seed1337.json --out QUALITY_r05.json

Run on the TPU host (~80-100 min per seed through the tunnel at the 6k/4k
defaults). `--quick` shrinks everything for a CPU harness check.
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
    ap.add_argument('--workdir', default=None,
                    help='default: /tmp/quality_r05 (full) or '
                         '/tmp/quality_r05_quick (--quick) — separate dirs '
                         'because the cached dataset differs in size')
    ap.add_argument('--seed', type=int, default=42,
                    help='training seed (init + data order). The dataset is '
                         'shared across seeds; job dirs for non-default '
                         'seeds get a _s<seed> suffix. Round-5 protocol: '
                         'run twice (42 and 1337), then --combine both '
                         'reports to derive evidence-based thresholds')
    ap.add_argument('--codebook-steps', type=int, default=6000)
    ap.add_argument('--transformer-steps', type=int, default=4000)
    ap.add_argument('--finetune-steps', type=int, default=1000,
                    help='finetune-transformer leg length (0 disables): '
                         'continues the gate transformer for N more steps at '
                         'an overridden lr (ref README.md:308-323 finetune '
                         'semantics), asserting the step counter/schedules '
                         'continue from the restored step and eval PSNR '
                         'stays within noise of the base run')
    # Threshold derivation (round 5, two-seed evidence — QUALITY_r05.json):
    # seeds 42/1337 at the 6k/4k config measured PSNR 25.00/25.40 (spread
    # 0.41 dB), ctx gain 5.84/5.51 (spread 0.34), ori 0.0160/0.0161. Floors
    # = worst seed − seed spread − eval noise (0.4 dB per curve endpoint):
    # min_psnr 24.2, min_ctx_gain 4.4, max_ori 0.0194 — emitted by
    # --combine as thresholds_derived and adopted here as defaults.
    ap.add_argument('--min-psnr', type=float, default=24.2,
                    help='worst-seed(25.0) - seed spread(0.41) - eval noise '
                         '(0.4) from the two-seed r5 calibration; r4 one-run '
                         'value was 22')
    ap.add_argument('--max-ori', type=float, default=0.0194,
                    help='worst seed 0.0161 + spread 0.0001, rounded up with '
                         'margin to 0.0194 (two-seed r5 calibration)')
    ap.add_argument('--mono-slack', type=float, default=0.75,
                    help='allowed per-pair PSNR dip (dB) in the context-size '
                         'check; adjacent pairs carry ~+-0.4 dB noise at 24 '
                         'eval sequences (measured), so this only screens '
                         'inversions — min-ctx-gain carries the real signal')
    ap.add_argument('--min-ctx-gain', type=float, default=4.4,
                    help='worst-seed gain(5.51) - spread(0.34) - 2x endpoint '
                         'noise(0.8) from the two-seed r5 calibration; a '
                         'branch-mask bug gives ~0')
    ap.add_argument('--regate', metavar='REPORT.json',
                    help='recompute the gate verdict from an existing report '
                         '(threshold iteration without re-running ~80 min of '
                         'training); requires an explicit --out so the '
                         'committed artifact cannot be clobbered by a '
                         'threshold experiment')
    ap.add_argument('--combine', nargs=2, metavar='REPORT.json',
                    help='merge two per-seed reports into one artifact with '
                         'run-to-run spread + worst-seed gate values; '
                         'requires an explicit --out')
    ap.add_argument('--quick', action='store_true')
    ap.add_argument('--out', default=None,
                    help='default: QUALITY_r05_seed<seed>.json at the repo '
                         'root (run mode); required for --regate/--combine')
    args = ap.parse_args()

    if args.regate or args.combine:
        if args.out is None:
            # an unnamed regate once silently overwrote the committed
            # passing artifact with a FAILED threshold experiment
            ap.error('--regate/--combine require an explicit --out')
    elif args.out is None:
        args.out = os.path.join(REPO, f'QUALITY_r05_seed{args.seed}.json')

    if args.combine:
        sys.exit(_combine(args))

    if args.regate:
        with open(args.regate) as f:
            report = json.load(f)
        missing = [k for k in ('transformer_eval', 'codebook_eval',
                               'multictx_eval') if k not in report]
        if missing:
            sys.exit(f'--regate: report lacks eval sections {missing} '
                     '(pre-r04 or --quick report?)')
        ok = _apply_gate(report, report['transformer_eval'],
                         report['codebook_eval'], report['multictx_eval'], args)
        with open(args.out, 'w') as f:
            json.dump(report, f, indent=1)
        print('wrote', args.out, flush=True)
        print('QUALITY GATE ' + ('PASSED' if ok else 'FAILED'), flush=True)
        sys.exit(0 if ok else 1)

    wd = args.workdir or ('/tmp/quality_r05_quick' if args.quick
                          else '/tmp/quality_r05')
    os.makedirs(wd, exist_ok=True)
    env = dict(os.environ)
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')

    if args.quick:
        image_size, n_seq, seq_len = 32, 12, 8
        cb_steps, tr_steps = 8, 8
        args.finetune_steps = min(args.finetune_steps, 4)
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
                         'transformer_steps': tr_steps,
                         'seed': args.seed},
              'timings_s': {}}
    log = report['timings_s']
    ds = os.path.join(wd, 'img')
    # the dataset is seed-independent (fixed fixture); training job dirs are
    # per-seed so two-seed runs never cross-contaminate
    sfx = '' if args.seed == 42 else f'_s{args.seed}'

    # Reuse a cached dataset only if it matches THIS run's config: a stale
    # cache from a differently-sized run (a 32px --quick dataset in the full
    # gate's workdir, 2026-08-19) otherwise crashes the codebook trainer at
    # step 0 with an image-size assertion after the gate already spun up.
    ds_ok = False
    info_path = os.path.join(ds, 'info.json')
    if os.path.exists(info_path):
        with open(info_path) as f:
            info = json.load(f)
        ds_ok = (info.get('frame_size') == image_size
                 and info.get('train_num_sequences') == n_seq
                 and info.get('train_sequence_size') == seq_len)
        if not ds_ok:
            print(f'   stale cached dataset in {ds} '
                  f'(frame_size={info.get("frame_size")}, '
                  f'want {image_size}) — regenerating', flush=True)
            import shutil as _sh
            _sh.rmtree(ds, ignore_errors=True)
    if not ds_ok:
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
    cb_job = os.path.join(wd, 'codebook' + sfx)
    shutil.rmtree(cb_job, ignore_errors=True)
    run_cli(['train', 'codebook', '--dataset', ds, '--job-dir', cb_job,
             '--total-steps', str(cb_steps), '--seed', str(args.seed)]
            + cb_extra,
            env, platform=platform, log=log)

    codes = os.path.join(wd, 'codes' + sfx)
    shutil.rmtree(codes, ignore_errors=True)
    run_cli(['generate-codes', '--dataset', ds, '--output', codes,
             '--model', cb_job, '--batch-size', '64'],
            env, platform=platform, log=log)

    tr_job = os.path.join(wd, 'transformer' + sfx)
    shutil.rmtree(tr_job, ignore_errors=True)
    run_cli(['train', 'transformer', '--dataset', codes,
             '--codebook-model', cb_job, '--job-dir', tr_job,
             '--total-steps', str(tr_steps), '--seed', str(args.seed)]
            + tr_extra,
            env, platform=platform, log=log)

    eval_dir = os.path.join(wd, 'eval' + sfx)
    run_cli(['evaluate', 'transformer', '--loader', 'dataset',
             '--loader-path', ds, '--loader-split', 'test',
             '--transformer-model', tr_job, '--codebook-model', cb_job,
             '--job-dir', eval_dir, '--batch-size', str(min(eval_n, 8)),
             '--num-eval-sequences', str(eval_n),
             '--num-store-images', '8'],
            env, platform=platform, log=log)

    cb_eval_dir = os.path.join(wd, 'eval_codebook' + sfx)
    run_cli(['evaluate', 'codebook', '--loader', 'dataset',
             '--loader-path', ds, '--loader-split', 'test',
             '--codebook-model', cb_job, '--job-dir', cb_eval_dir,
             '--batch-size', '16', '--num-eval-images', str(eval_n * 4)],
            env, platform=platform, log=log)

    # multictx: one pass produces PSNR for EVERY context size (the paper's
    # signature table) — the monotonicity assertion below is a sharp
    # end-to-end check of the branching-attention masks
    mc_dir = os.path.join(wd, 'eval_multictx' + sfx)
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

    # FINETUNE leg (round-5 directive #5): continue the gate transformer for
    # --finetune-steps more steps at an overridden lr (the reference treats
    # finetuning as a first-class workflow with overridden hyperparameters,
    # ref README.md:308-323, finetune_transformer.py:78-87), then assert
    #   (a) the step counter/schedules CONTINUE from the restored step (the
    #       first logged train step must exceed the base run's total), and
    #   (b) eval PSNR of the finetuned model stays within noise of the base.
    if args.finetune_steps:
        ft_job = tr_job + '_ft'
        shutil.rmtree(ft_job, ignore_errors=True)
        ft_flags = ['--learning-rate', '1e-4']
        if args.quick:
            ft_flags += ['--batch-size', '2', '--epochs', '1']
        else:
            ft_flags += ['--batch-size', '10', '--epochs', '2',
                         '--steps-per-call', '20',
                         '--codebook-model', cb_job]
        run_cli(['train', 'finetune-transformer', '--dataset', codes,
                 '--checkpoint', tr_job, '--job-dir', ft_job,
                 '--total-steps', str(tr_steps + args.finetune_steps)]
                + ft_flags, env, platform=platform, log=log)
        first_step = None
        with open(os.path.join(ft_job, 'metrics.jsonl')) as f:
            for line in f:
                rec = json.loads(line)
                if 'train/loss' in rec:
                    first_step = rec['step']
                    break
        ft_eval_dir = os.path.join(wd, 'eval_finetune' + sfx)
        run_cli(['evaluate', 'transformer', '--loader', 'dataset',
                 '--loader-path', ds, '--loader-split', 'test',
                 '--transformer-model', ft_job, '--codebook-model', cb_job,
                 '--job-dir', ft_eval_dir, '--batch-size', str(min(eval_n, 8)),
                 '--num-eval-sequences', str(eval_n),
                 '--num-store-images', '0'],
                env, platform=platform, log=log)
        with open(os.path.join(ft_eval_dir, 'results.json')) as f:
            ft_results = json.load(f)
        schedules_continue = (first_step is not None and first_step > tr_steps)
        psnr_within_noise = (args.quick or (
            ft_results.get('psnr') is not None and results.get('psnr') is not None
            and ft_results['psnr'] >= results['psnr'] - 1.0))
        report['finetune'] = {
            'steps': args.finetune_steps,
            'overrides': {'learning_rate': 1e-4},
            'restored_from_step': tr_steps,
            'first_logged_step': first_step,
            'schedules_continue_from_restored_step': bool(schedules_continue),
            'eval': ft_results,
            'psnr_base': results.get('psnr'),
            'psnr_finetuned': ft_results.get('psnr'),
            'psnr_within_noise_of_base': bool(psnr_within_noise),
            'ok': bool(schedules_continue and psnr_within_noise),
        }
        print(json.dumps({k: v for k, v in report['finetune'].items()
                          if k != 'eval'}), flush=True)

    _apply_gate(report, results, cb_results, mc_results, args)
    if report.get('finetune') is not None and not args.quick:
        report['ok'] = bool(report['ok'] and report['finetune']['ok'])

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


def _ctx_order(key):
    """Numeric context-size ordering ('ctx1' < 'ctx2' < 'ctx10') — a
    lexicographic sort only works while the evaluator zero-pads the keys."""
    digits = ''.join(c for c in key if c.isdigit())
    return int(digits) if digits else 0


def _apply_gate(report, results, cb_results, mc_results, args):
    psnr_by_ctx = {ctx: m.get('psnr') for ctx, m in mc_results.items()}
    curve = [psnr_by_ctx[k] for k in sorted(psnr_by_ctx, key=_ctx_order)]
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


def _combine(args):
    """Merge two per-seed reports into the round artifact: both trajectories,
    the run-to-run spread, and worst-seed gate values — the evidence base for
    the thresholds (round-5 directive #2)."""
    reports = []
    for path in args.combine:
        with open(path) as f:
            reports.append(json.load(f))
    for r, path in zip(reports, args.combine):
        for key in ('gate', 'ok', 'transformer_eval'):
            if key not in r:
                sys.exit(f'--combine: {path} lacks {key!r} (quick report?)')
    seeds = [str(r['config'].get('seed', '?')) for r in reports]
    psnrs = [r['gate']['psnr'] for r in reports]
    gains = [r['gate']['ctx_gain'] for r in reports]
    oris = [r['gate']['loc_angle'] for r in reports]
    combined = {
        'protocol': 'two independent seeds at the 6k/4k gate config; '
                    'thresholds derive from worst-seed minus noise (adjacent '
                    'multictx pairs carry ~+-0.4 dB at 24 eval sequences; '
                    'the measured seed spread bounds trajectory variance)',
        'seeds': dict(zip(seeds, reports)),
        'spread': {'psnr_db': round(abs(psnrs[0] - psnrs[1]), 3),
                   'ctx_gain_db': round(abs(gains[0] - gains[1]), 3),
                   'loc_angle_rad': round(abs(oris[0] - oris[1]), 5)},
        'worst': {'psnr_db': round(min(psnrs), 3),
                  'ctx_gain_db': round(min(gains), 3),
                  'loc_angle_rad': round(max(oris), 5)},
        'thresholds_in_force': {'min_psnr': args.min_psnr,
                                'max_ori': args.max_ori,
                                'min_ctx_gain': args.min_ctx_gain,
                                'mono_slack': args.mono_slack},
        # Evidence-based floors (round-5 directive #2): worst seed, minus the
        # measured seed spread (run-to-run variance bound from the two
        # trajectories), minus finite-sample eval noise — 0.4 dB per curve
        # endpoint at 24 eval sequences (measured r4), so 0.4 for the psnr
        # floor and 0.8 for the ctx-gain floor (two endpoints). loc-angle
        # gets spread + 20% analogously. A future run below these floors is
        # outside everything two healthy trajectories spanned.
        'thresholds_derived': {
            'rule': 'worst-seed minus seed spread minus eval noise '
                    '(0.4 dB/curve endpoint at 24 eval sequences)',
            'min_psnr': round(min(psnrs) - abs(psnrs[0] - psnrs[1]) - 0.4, 1),
            'min_ctx_gain': round(min(gains) - abs(gains[0] - gains[1]) - 0.8, 1),
            'max_ori': round(max(oris) + abs(oris[0] - oris[1])
                             + 0.2 * max(oris), 4),
        },
        'ok': bool(all(r['ok'] for r in reports)),
    }
    with open(args.out, 'w') as f:
        json.dump(combined, f, indent=1)
    print(json.dumps({k: combined[k] for k in
                      ('spread', 'worst', 'thresholds_in_force',
                       'thresholds_derived', 'ok')},
                     indent=1), flush=True)
    print('wrote', args.out, flush=True)
    return 0 if combined['ok'] else 1


if __name__ == '__main__':
    main()
