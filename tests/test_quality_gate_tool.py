"""Gate-verdict logic of tools/quality_gate_colors.py via --regate (no
training): thresholds, the per-pair slack, and the overall context-size
gain requirement — the check that screens branching-attention mask bugs
(a leak/drop bug flattens the PSNR-vs-context curve to ~0 gain)."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, 'tools', 'quality_gate_colors.py')


def _report(psnr, ori, curve):
    return {
        'config': {}, 'timings_s': {},
        'transformer_eval': {'psnr': psnr, 'loc-angle': ori},
        'codebook_eval': {'psnr': psnr + 2.0},
        'multictx_eval': {f'ctx{i + 1:02d}': {'psnr': v}
                          for i, v in enumerate(curve)},
    }


def _regate(tmp_path, report, *extra):
    src = tmp_path / 'report.json'
    out = tmp_path / 'out.json'
    src.write_text(json.dumps(report))
    proc = subprocess.run(
        [sys.executable, TOOL, '--regate', str(src), '--out', str(out)]
        + list(extra), capture_output=True, text=True, timeout=60)
    gate = json.loads(out.read_text())['gate'] if out.exists() else None
    return proc.returncode, gate


def test_regate_passes_good_run(tmp_path):
    # shape of the measured 2026-08-18 curve: rising with one noisy dip
    curve = [18.9, 21.9, 22.4, 22.7, 23.5, 23.3, 24.1, 24.4, 24.4, 24.6,
             25.4, 25.0, 25.1, 25.0, 25.1, 25.5, 25.8, 25.6, 26.1]
    rc, gate = _regate(tmp_path, _report(26.1, 0.015, curve))
    assert rc == 0
    assert gate['psnr_monotone_in_context'] is True
    assert gate['ctx_gain'] == 7.2


def test_regate_fails_flat_curve(tmp_path):
    # a mask bug flattens the curve: overall gain ~0 must fail even though
    # every pairwise dip is within slack and the point metrics are fine
    curve = [24.0 + 0.1 * (i % 3) for i in range(19)]
    rc, gate = _regate(tmp_path, _report(26.1, 0.015, curve))
    assert rc == 1
    assert gate['psnr_monotone_in_context'] is False


def test_regate_fails_inversion_and_low_psnr(tmp_path):
    # catastrophic inversion beyond the slack
    curve = [20.0, 23.0, 19.0] + [23.0] * 16
    rc, gate = _regate(tmp_path, _report(26.1, 0.015, curve))
    assert rc == 1
    # and the plain PSNR threshold
    rc, _ = _regate(tmp_path, _report(18.0, 0.015,
                                      [18.0 + 0.3 * i for i in range(19)]))
    assert rc == 1


def test_regate_threshold_flags(tmp_path):
    curve = [18.0 + 0.2 * i for i in range(19)]
    rc, _ = _regate(tmp_path, _report(20.0, 0.03, curve),
                    '--min-psnr', '19', '--max-ori', '0.05',
                    '--min-ctx-gain', '3')
    assert rc == 0


def _seed_report(seed, psnr, ori, gain):
    return {
        'config': {'seed': seed}, 'timings_s': {},
        'transformer_eval': {'psnr': psnr, 'loc-angle': ori},
        'gate': {'psnr': psnr, 'loc_angle': ori, 'ctx_gain': gain},
        'ok': True,
    }


def test_combine_two_seeds_derives_thresholds(tmp_path):
    """--combine records both trajectories, the seed spread, worst-seed gate
    values, and evidence-based threshold floors (worst minus spread minus
    eval noise) — the round-5 variance protocol."""
    a = tmp_path / 'a.json'
    b = tmp_path / 'b.json'
    out = tmp_path / 'combined.json'
    a.write_text(json.dumps(_seed_report(42, 25.0, 0.016, 5.8)))
    b.write_text(json.dumps(_seed_report(1337, 24.0, 0.018, 5.0)))
    proc = subprocess.run(
        [sys.executable, TOOL, '--combine', str(a), str(b), '--out', str(out)],
        capture_output=True, text=True, timeout=60)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    combined = json.loads(out.read_text())
    assert set(combined['seeds']) == {'42', '1337'}
    assert combined['spread']['psnr_db'] == 1.0
    assert combined['worst'] == {'psnr_db': 24.0, 'ctx_gain_db': 5.0,
                                 'loc_angle_rad': 0.018}
    der = combined['thresholds_derived']
    assert der['min_psnr'] == 22.6       # 24.0 - 1.0 spread - 0.4 noise
    assert der['min_ctx_gain'] == 3.4    # 5.0 - 0.8 spread - 0.8 (2 endpoints)
    assert der['max_ori'] == 0.0236      # 0.018 + 0.002 spread + 20%
    assert combined['ok'] is True

    # refuses to run without an explicit --out (clobber protection)
    proc = subprocess.run(
        [sys.executable, TOOL, '--combine', str(a), str(b)],
        capture_output=True, text=True, timeout=60)
    assert proc.returncode != 0
