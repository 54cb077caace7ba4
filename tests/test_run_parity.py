"""tools/run_parity.py stub exercise (PARITY_RUNBOOK.md as an executable).

The real released checkpoints are network-gated; this pins the runner's
mechanics offline: artifact discovery + cache install, the strict import
path, fingerprint recording, and the missing-artifact reporting — so the
day the network exists the runner works first try.
"""
import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tools'))


def _tiny_codebook_release(job_dir):
    """A loadable tiny codebook checkpoint in the repo's own job-dir format
    (load_model branch 1: last/ + config.json)."""
    from viewformer_tpu.config import VQGANConfig
    from viewformer_tpu.models import AutoModel
    from viewformer_tpu.train.checkpoint import CheckpointManager

    config = VQGANConfig(ch=32, ch_mult=[1, 2], num_res_blocks=1,
                         attn_resolutions=[], z_channels=32, embed_dim=8,
                         n_embed=16, image_size=16, perceptual_weight=0.0)
    model = AutoModel.from_config(config)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    variables = model.init({'params': k1, 'quantizer': k2},
                           jnp.zeros((1, 16, 16, 3), jnp.float32),
                           training=False)
    mgr = CheckpointManager(job_dir, config=config)
    mgr.save(1, {'params': variables['params'],
                 'quantizer': variables['quantizer']})
    mgr.close()


def test_run_parity_offline_stub(tmp_path, monkeypatch):
    monkeypatch.setenv('HOME', str(tmp_path / 'home'))
    artifacts = tmp_path / 'artifacts'
    artifacts.mkdir()
    _tiny_codebook_release(str(artifacts / 'sm7-codebook-th'))

    import run_parity
    out = tmp_path / 'PARITY_test.json'
    rc = run_parity.main(['--artifacts', str(artifacts), '--skip-network',
                          '--output', str(out)])
    assert rc == 0
    report = json.loads(out.read_text())
    assert report['network'] is False

    cb = report['checkpoints']['sm7-codebook-th']
    assert cb['installed'] and cb['import_ok']
    assert cb['n_params'] > 0
    assert len(cb['fingerprint']['codes_first16']) == 16
    # installed into the cache layout load_model resolves
    assert os.path.isdir(tmp_path / 'home' / '.cache' / 'viewformer'
                         / 'sm7-codebook-th')

    tr = report['checkpoints']['sm7-transformer-tf']
    assert not tr['installed'] and tr['source'] == 'missing'
    assert report['complete'] is False


def test_run_parity_fingerprint_deterministic(tmp_path, monkeypatch):
    """Same checkpoint -> identical fingerprint (it is the cross-stack
    comparison key, so it must not depend on run order or rng state)."""
    monkeypatch.setenv('HOME', str(tmp_path / 'home'))
    artifacts = tmp_path / 'artifacts'
    artifacts.mkdir()
    _tiny_codebook_release(str(artifacts / 'sm7-codebook-th'))

    import run_parity
    out1, out2 = tmp_path / 'p1.json', tmp_path / 'p2.json'
    run_parity.main(['--artifacts', str(artifacts), '--skip-network',
                     '--output', str(out1)])
    run_parity.main(['--artifacts', str(artifacts), '--skip-network',
                     '--output', str(out2)])
    f1 = json.loads(out1.read_text())['checkpoints']['sm7-codebook-th']
    f2 = json.loads(out2.read_text())['checkpoints']['sm7-codebook-th']
    assert f1['fingerprint'] == f2['fingerprint']
