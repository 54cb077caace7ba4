#!/usr/bin/env python
"""Full-size sustained-training soak with mid-run kill + exact resume
(VERDICT r2 directive #1).

Everything that round-2 only proved in single-step timings runs TOGETHER
here, at reference model sizes, on the real chip, for hundreds of steps:
the scanned multi-step trainer (lax.scan steps-per-call), buffer donation,
default dropout through the fused kernels, remat, async donation-safe orbax
checkpointing on epoch cadence, the mid-epoch data cursor — and then a
SIGKILL mid-run followed by an exact resume whose loss trajectory must
continue the uninterrupted run's curve.

Phases
  A. prepare: hermetic colors dataset at 128px (pose-conditioned, so the
     synthetic code mapping below is learnable), deterministic frames->codes
     transform (vocab 1024, 8x8 grid) — no trained codebook needed.
  B. codebook soak: full-size VQ-GAN (ch=128 @128px), sustained steps with
     async saves.
  C. transformer reference run: full-size MIGT (12L/768d, remat, dropout),
     scanned steps, uninterrupted — the golden trajectory.
  D. kill/resume run: same config, SIGKILL once the log shows >= kill_at
     steps, relaunch, run to completion.
  E. assert: resume restarts from the newest checkpoint, replays the exact
     data order (mid-epoch cursor), and every post-resume logged loss
     matches the golden run at the same step.
  F. kill-MID-ASYNC-SAVE run (VERDICT r3 directive #6): a second kill/resume
     cycle whose SIGKILL fires inside the async-save window — after
     aux-<step>.json is written but before orbax commits last/<step> (the
     background D2H fetch + file write are in flight; through the tunnel
     that window is tens of seconds at full size). Asserts the crash can
     never leave a half-written checkpoint that a resume would load: every
     digit-named dir under last/ is a committed orbax step (uncommitted
     saves only ever exist under tmp names), the resume run restores and
     completes, and its post-resume losses match the golden curve. This is
     the crash window of the repo's custom background-fetch concurrency
     (train/checkpoint.py), not of orbax alone.
  Writes SOAK_r04.json.

Run on the TPU host: `python tools/soak_fullsize.py` (~20-40 min through
the tunnel, compiles included). `--quick` shrinks models/steps for a CPU
smoke test of the harness itself.
"""
import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PREPARE = r'''
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update('jax_platforms', 'cpu')  # data prep needs no TPU
import numpy as np
from viewformer_tpu.data import generate_dataset_from_loader, transform_dataset
from viewformer_tpu.data.loaders import build

workdir, image_size, n_train, n_test = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
for split, n in (('train', n_train), ('test', n_test)):
    loader = build('colors', split=split, num_sequences=n, sequence_size=20,
                   image_size=image_size)
    generate_dataset_from_loader(loader, split, workdir + '/img/colors',
                                 max_sequences_per_shard=16, progress=False)

stride = image_size // 8
class DeterministicCodes:
    """frames -> 8x8 codes in [0, 1024): pose-conditioned (colors images are
    a function of the camera), so the transformer has real signal."""
    def output_features(self, features):
        return ['codes', 'cameras']
    def update_dataset_info(self, info):
        info['token_image_size'] = 8
        return info
    def __call__(self, split, dataset):
        for item in dataset:
            f = item['frames']
            codes = ((f[:, ::stride, ::stride, 0].astype(np.int64) // 8) * 4
                     + f[:, ::stride, ::stride, 1].astype(np.int64) // 64)
            yield dict(cameras=item['cameras'], codes=np.clip(codes, 0, 1023))

transform_dataset(workdir + '/img', workdir + '/codes', DeterministicCodes(),
                  progress=False)
print('PREPARED', flush=True)
'''

_TRANSFORMER_WORKER = r'''
import sys
sys.path.insert(0, {repo!r})
import os
import jax
cache_dir = os.path.expanduser('~/.cache/viewformer_tpu/xla_cache')
os.makedirs(cache_dir, exist_ok=True)
jax.config.update('jax_compilation_cache_dir', cache_dir)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
if {cpu!r} == 'cpu':
    jax.config.update('jax_platforms', 'cpu')
from viewformer_tpu.config import MIGTConfig
from viewformer_tpu.train.transformer import train_transformer

data, job_dir = sys.argv[1], sys.argv[2]
config = MIGTConfig(n_layer={n_layer}, d_model={d_model}, n_head={n_head},
                    sequence_size=20, token_image_size=8, n_embeddings=1024,
                    total_steps={steps}, batch_size={batch},
                    learning_rate=3e-4)
state = train_transformer(config, data, job_dir, codebook_path=None,
                          total_steps={steps}, epochs={epochs},
                          batch_size={batch}, steps_per_call={steps_per_call},
                          log_every={log_every}, profile_batch=0,
                          progress=True)
print('TRAIN DONE step', int(state.step), flush=True)
'''

_CODEBOOK_WORKER = r'''
import sys
sys.path.insert(0, {repo!r})
import os
import jax
cache_dir = os.path.expanduser('~/.cache/viewformer_tpu/xla_cache')
os.makedirs(cache_dir, exist_ok=True)
jax.config.update('jax_compilation_cache_dir', cache_dir)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
if {cpu!r} == 'cpu':
    jax.config.update('jax_platforms', 'cpu')
from viewformer_tpu.config import VQGANConfig
from viewformer_tpu.train.codebook import train_codebook

data, job_dir = sys.argv[1], sys.argv[2]
config = VQGANConfig(perceptual_weight=0.0, batch_size={batch},
                     total_steps={steps}{extra})
state = train_codebook(config, data, job_dir, total_steps={steps},
                       epochs={epochs}, batch_size={batch},
                       steps_per_call={steps_per_call}, log_every={log_every},
                       num_val_batches=2, profile_batch=0, progress=True)
print('CODEBOOK DONE step', int(state.step), flush=True)
'''


def _committed_steps(job_dir):
    last_dir = os.path.join(job_dir, 'last')
    if not os.path.isdir(last_dir):
        return []
    return sorted(int(d) for d in os.listdir(last_dir) if d.isdigit())


def _aux_steps(job_dir):
    import re
    return sorted(int(m.group(1)) for f in os.listdir(job_dir)
                  for m in [re.fullmatch(r'aux-(\d+)\.json', f)] if m)


def _save_in_flight(job_dir):
    """True when an async save is between its aux write (synchronous, at
    save() entry) and its orbax commit (background fetch + file write) —
    i.e. an aux-<step>.json exists for a step newer than the newest
    committed checkpoint."""
    committed = _committed_steps(job_dir)
    if not committed:
        return False
    return any(s > committed[-1] for s in _aux_steps(job_dir))


def _poll_run(proc, metrics_path, kill_at=None, timeout=3600,
              kill_mid_save=False):
    """Wait on a training subprocess while timestamping each new train-log
    step from metrics.jsonl. Returns (timeline {step: wallclock}, killed).

    kill_at: SIGKILL once BOTH the log shows >= kill_at steps AND at least
    one checkpoint has committed — with truly-async saves the D2H fetch lags
    training by up to ~1 epoch on slow-transfer hosts, and a kill before any
    commit would (safely, but uselessly for this test) restart from scratch.

    kill_mid_save: SIGKILL the moment a save is observed IN FLIGHT (aux
    written, commit pending) with at least one older commit on disk — the
    crash window of the background-fetch checkpoint path."""
    timeline = {}
    killed = False
    t_start = time.time()
    pos = 0
    job_dir = os.path.dirname(metrics_path)
    while True:
        if os.path.exists(metrics_path):
            with open(metrics_path) as f:
                f.seek(pos)
                for line in f:
                    if not line.endswith('\n'):
                        break
                    pos += len(line)
                    try:
                        rec = json.loads(line)
                    except ValueError:
                        continue
                    if _train_loss(rec) is not None:
                        timeline.setdefault(int(rec['step']), time.time())
        if not killed:
            if kill_mid_save and _save_in_flight(job_dir):
                proc.send_signal(signal.SIGKILL)
                killed = True
            elif kill_at is not None and any(
                    s >= kill_at for s in timeline) and _committed_steps(job_dir):
                proc.send_signal(signal.SIGKILL)
                killed = True
        if proc.poll() is not None:
            break
        if time.time() - t_start > timeout:
            proc.kill()
            raise RuntimeError(f'soak run timed out after {timeout}s')
        # the mid-save window can be sub-second on fast hosts (CPU quick
        # mode) — poll tightly while hunting it
        time.sleep(0.05 if (kill_mid_save and not killed) else 0.5)
    return timeline, killed


def _train_loss(rec):
    """Training-loss value of a metrics.jsonl record (keys are
    'train/<metric>'), or None for val/other records."""
    for key in ('train/loss', 'train/total_loss'):
        if key in rec:
            return float(rec[key])
    return None


def _read_losses(job_dir):
    """{step: loss} for train records in a job's metrics.jsonl."""
    losses = {}
    with open(os.path.join(job_dir, 'metrics.jsonl')) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            loss = _train_loss(rec)
            if loss is not None:
                losses[int(rec['step'])] = loss
    return losses


def _sustained_from_log(job_dir):
    """steps/s from the logger's own 'time' stamps (for reused phases)."""
    stamps = {}
    with open(os.path.join(job_dir, 'metrics.jsonl')) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if _train_loss(rec) is not None:
                stamps.setdefault(int(rec['step']), float(rec['time']))
    steps = sorted(stamps)
    if len(steps) < 2:
        return 0.0
    return (steps[-1] - steps[0]) / max(stamps[steps[-1]] - stamps[steps[0]],
                                        1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--workdir', default='/tmp/soak_r04')
    ap.add_argument('--steps', type=int, default=240)
    ap.add_argument('--codebook-steps', type=int, default=120)
    ap.add_argument('--quick', action='store_true',
                    help='tiny models on CPU: harness smoke test')
    ap.add_argument('--reuse', action='store_true',
                    help='skip codebook/golden phases whose completed '
                         'metrics already exist in the workdir')
    ap.add_argument('--out', default=os.path.join(REPO, 'SOAK_r04.json'))
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    env = dict(os.environ)
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')

    if args.quick:
        tf_params = dict(n_layer=2, d_model=64, n_head=2, batch=4,
                         steps=40, epochs=4, steps_per_call=5, log_every=5,
                         cpu='cpu')
        cb_params = dict(batch=4, steps=12, epochs=2, steps_per_call=3,
                         log_every=3, cpu='cpu',
                         extra=", ch=32, ch_mult=[1, 2], num_res_blocks=1,"
                               " attn_resolutions=[], z_channels=32,"
                               " embed_dim=8, n_embed=64, image_size=32")
        image_size, n_train, n_test = 32, 12, 4
        kill_at = 20
    else:
        tf_params = dict(n_layer=12, d_model=768, n_head=12, batch=8,
                         steps=args.steps, epochs=6, steps_per_call=20,
                         log_every=20, cpu='tpu')
        cb_params = dict(batch=32, steps=args.codebook_steps, epochs=3,
                         steps_per_call=10, log_every=10, cpu='tpu',
                         extra='')
        image_size, n_train, n_test = 128, 48, 8
        kill_at = args.steps // 2

    report = {'config': tf_params, 'codebook_config': cb_params}

    # --- A. prepare data ---
    if not os.path.exists(os.path.join(args.workdir, 'codes')):
        print('== preparing colors dataset ==', flush=True)
        p = subprocess.run(
            [sys.executable, '-c', _PREPARE.format(repo=REPO), args.workdir,
             str(image_size), str(n_train), str(n_test)],
            env=env, text=True, capture_output=True, timeout=1800)
        assert p.returncode == 0, p.stdout[-2000:] + p.stderr[-4000:]

    def _phase_done(job, want_steps):
        try:
            return max(_read_losses(job)) >= want_steps
        except (OSError, ValueError):
            return False

    # --- B. codebook soak ---
    print('== codebook soak ==', flush=True)
    cb_job = os.path.join(args.workdir, 'job_codebook')
    script = _CODEBOOK_WORKER.format(repo=REPO, **cb_params)
    if args.reuse and _phase_done(cb_job, cb_params['steps']):
        print('   (reusing completed codebook phase)', flush=True)
        cb_losses = _read_losses(cb_job)
        report['codebook'] = {'reused': True,
                              'sustained_steps_per_s': round(
                                  _sustained_from_log(cb_job), 3),
                              'loss_first': cb_losses[min(cb_losses)],
                              'loss_last': cb_losses[max(cb_losses)],
                              'steps': max(cb_losses)}
    else:
        t0 = time.time()
        proc = subprocess.Popen([sys.executable, '-c', script,
                                 os.path.join(args.workdir, 'img'), cb_job],
                                env=env, stdout=subprocess.DEVNULL,
                                stderr=subprocess.STDOUT)
        timeline, _ = _poll_run(proc, os.path.join(cb_job, 'metrics.jsonl'))
        assert proc.returncode == 0, f'codebook soak failed rc={proc.returncode}'
        cb_losses = _read_losses(cb_job)
        steps_sorted = sorted(timeline)
        sustained = (steps_sorted[-1] - steps_sorted[0]) / max(
            timeline[steps_sorted[-1]] - timeline[steps_sorted[0]], 1e-9) \
            if len(steps_sorted) > 1 else 0.0
        report['codebook'] = {
            'wall_s': round(time.time() - t0, 1),
            'sustained_steps_per_s': round(sustained, 3),
            'loss_first': cb_losses[min(cb_losses)],
            'loss_last': cb_losses[max(cb_losses)],
            'steps': max(cb_losses),
        }
    print(json.dumps(report['codebook']), flush=True)

    # --- C. transformer golden run ---
    print('== transformer golden run ==', flush=True)
    gold_job = os.path.join(args.workdir, 'job_gold')
    script = _TRANSFORMER_WORKER.format(repo=REPO, **tf_params)
    data = os.path.join(args.workdir, 'codes')
    if args.reuse and _phase_done(gold_job, tf_params['steps']):
        print('   (reusing completed golden phase)', flush=True)
        gold = _read_losses(gold_job)
        sus = _sustained_from_log(gold_job)
        report['transformer'] = {'reused': True,
                                 'sustained_steps_per_s': round(sus, 3),
                                 'sustained_seq_per_s': round(
                                     sus * tf_params['batch'], 2),
                                 'loss_first': gold[min(gold)],
                                 'loss_last': gold[max(gold)],
                                 'steps': max(gold)}
    else:
        t0 = time.time()
        proc = subprocess.Popen([sys.executable, '-c', script, data, gold_job],
                                env=env, stdout=subprocess.DEVNULL,
                                stderr=subprocess.STDOUT)
        timeline, _ = _poll_run(proc, os.path.join(gold_job, 'metrics.jsonl'))
        assert proc.returncode == 0, f'golden run failed rc={proc.returncode}'
        gold = _read_losses(gold_job)
        steps_sorted = sorted(timeline)
        sustained = (steps_sorted[-1] - steps_sorted[0]) / max(
            timeline[steps_sorted[-1]] - timeline[steps_sorted[0]], 1e-9) \
            if len(steps_sorted) > 1 else 0.0
        report['transformer'] = {
            'wall_s': round(time.time() - t0, 1),
            'sustained_steps_per_s': round(sustained, 3),
            'sustained_seq_per_s': round(sustained * tf_params['batch'], 2),
            'loss_first': gold[min(gold)],
            'loss_last': gold[max(gold)],
            'steps': max(gold),
        }
    print(json.dumps(report['transformer']), flush=True)
    assert gold[max(gold)] < gold[min(gold)], 'loss did not decrease'

    # --- D. kill / resume run ---
    print(f'== kill@>={kill_at} / resume run ==', flush=True)
    kr_job = os.path.join(args.workdir, 'job_killresume')
    os.makedirs(kr_job, exist_ok=True)
    kr_log = open(os.path.join(kr_job, 'worker.log'), 'a')
    proc = subprocess.Popen([sys.executable, '-c', script, data, kr_job],
                            env=env, stdout=kr_log, stderr=subprocess.STDOUT)
    _, killed = _poll_run(proc, os.path.join(kr_job, 'metrics.jsonl'),
                          kill_at=kill_at)
    assert killed, 'run finished before the kill point'
    assert proc.returncode != 0

    # read the checkpoint layout directly (no jax/orbax import in the
    # orchestrator: the TPU belongs to the workers)
    last_dir = os.path.join(kr_job, 'last')
    steps_on_disk = sorted(int(d) for d in os.listdir(last_dir) if d.isdigit())
    assert steps_on_disk, os.listdir(last_dir)
    resume_step = steps_on_disk[-1]
    aux = None
    aux_path = os.path.join(kr_job, f'aux-{resume_step}.json')
    if os.path.exists(aux_path):
        with open(aux_path) as f:
            aux = json.load(f)
    assert resume_step < tf_params['steps']
    report['kill'] = {'killed_after_step': kill_at,
                      'checkpoint_resume_step': int(resume_step),
                      'aux_cursor': aux}
    print(json.dumps(report['kill']), flush=True)

    proc = subprocess.Popen([sys.executable, '-c', script, data, kr_job],
                            env=env, stdout=kr_log, stderr=subprocess.STDOUT)
    _poll_run(proc, os.path.join(kr_job, 'metrics.jsonl'))
    kr_log.close()
    assert proc.returncode == 0, (
        'resume run failed rc=%s:\n%s' % (
            proc.returncode,
            open(os.path.join(kr_job, 'worker.log')).read()[-3000:]))

    # --- E. trajectory must continue the golden curve ---
    resumed = _read_losses(kr_job)
    post = [s for s in sorted(resumed) if s > resume_step and s in gold]
    assert post, (sorted(resumed), resume_step)
    deltas = {s: abs(resumed[s] - gold[s]) / max(abs(gold[s]), 1e-9)
              for s in post}
    worst = max(deltas.values())
    report['resume'] = {
        'post_resume_steps_compared': len(post),
        'worst_rel_loss_delta': round(worst, 6),
        'final_loss_gold': gold[max(gold)],
        'final_loss_resumed': resumed[max(resumed)],
    }
    print(json.dumps(report['resume']), flush=True)
    # exact data resume + step-folded rng => the trajectory is the same
    # computation; tolerance covers bf16 accumulation jitter only
    assert worst < 5e-3, deltas

    # --- F. kill MID-ASYNC-SAVE / crash-consistency run ---
    print('== kill mid-async-save / resume run ==', flush=True)
    ms_job = os.path.join(args.workdir, 'job_midsave')
    os.makedirs(ms_job, exist_ok=True)
    ms_log = open(os.path.join(ms_job, 'worker.log'), 'a')
    proc = subprocess.Popen([sys.executable, '-c', script, data, ms_job],
                            env=env, stdout=ms_log, stderr=subprocess.STDOUT)
    _, killed = _poll_run(proc, os.path.join(ms_job, 'metrics.jsonl'),
                          kill_mid_save=True)
    if not killed:
        # every save committed before the 50ms poll saw it in flight — only
        # plausible on a fast local disk with a tiny state; the window is
        # tens of seconds at full size through the tunnel
        assert args.quick, 'mid-save window never observed at full size'
        print('   (window not observed in quick mode; phase skipped)',
              flush=True)
        report['midsave_kill'] = {'window_observed': False}
    else:
        assert proc.returncode != 0
        # crash consistency: digit-named dirs under last/ are exactly the
        # COMMITTED orbax steps (an interrupted save only ever exists under
        # a tmp name — orbax renames on commit); a half-written digit dir
        # would be loaded by the resume below and is the failure this phase
        # exists to catch
        last_dir = os.path.join(ms_job, 'last')
        entries = os.listdir(last_dir)
        committed = sorted(int(d) for d in entries if d.isdigit())
        tmp_entries = [d for d in entries if not d.isdigit()]
        assert committed, entries
        in_flight = [s for s in _aux_steps(ms_job) if s > committed[-1]]
        report['midsave_kill'] = {
            'window_observed': True,
            'committed_steps_at_kill': committed,
            'save_in_flight_for_step': in_flight,
            'uncommitted_tmp_entries': tmp_entries,
        }
        print(json.dumps(report['midsave_kill']), flush=True)

        proc = subprocess.Popen([sys.executable, '-c', script, data, ms_job],
                                env=env, stdout=ms_log,
                                stderr=subprocess.STDOUT)
        _poll_run(proc, os.path.join(ms_job, 'metrics.jsonl'))
        assert proc.returncode == 0, (
            'mid-save resume run failed rc=%s:\n%s' % (
                proc.returncode,
                open(os.path.join(ms_job, 'worker.log')).read()[-3000:]))
        ms_resumed = _read_losses(ms_job)
        ms_post = [s for s in sorted(ms_resumed)
                   if s > committed[-1] and s in gold]
        assert ms_post, (sorted(ms_resumed), committed[-1])
        ms_worst = max(abs(ms_resumed[s] - gold[s]) / max(abs(gold[s]), 1e-9)
                       for s in ms_post)
        report['midsave_kill']['post_resume_steps_compared'] = len(ms_post)
        report['midsave_kill']['worst_rel_loss_delta'] = round(ms_worst, 6)
        print(json.dumps({'midsave_worst_rel_loss_delta': ms_worst}),
              flush=True)
        assert ms_worst < 5e-3
    ms_log.close()

    report['ok'] = True
    with open(args.out, 'w') as f:
        json.dump(report, f, indent=1)
    print('wrote', args.out, flush=True)


if __name__ == '__main__':
    main()
