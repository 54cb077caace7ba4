import dataclasses
import json
import os
import zipfile

import numpy as np
import pytest
from PIL import Image

import jax

from viewformer_tpu.config import MIGTConfig, VQGANConfig
from viewformer_tpu.utils.schedules import Schedule


def _make_sevenscenes_fixture(root, num_train=24, num_test=3, image_size=32):
    rng = np.random.RandomState(0)
    import io

    def png(arr):
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, 'PNG')
        return buf.getvalue()

    def make_seq_zip(n, offset):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, 'w') as z:
            for i in range(n):
                pose = np.eye(4, dtype=np.float32)
                pose[:3, 3] = [offset + i * 0.1, 0, 1]
                z.writestr(f'frame-{i:06d}.pose.txt',
                           '\n'.join(' '.join(str(v) for v in row) for row in pose))
                z.writestr(f'frame-{i:06d}.color.png',
                           png(rng.randint(0, 255, (image_size, image_size, 3), np.uint8)))
        return buf.getvalue()

    with zipfile.ZipFile(os.path.join(root, 'chess.zip'), 'w') as z:
        z.writestr('chess/TrainSplit.txt', 'sequence1\n')
        z.writestr('chess/TestSplit.txt', 'sequence2\n')
        z.writestr('chess/seq-01.zip', make_seq_zip(num_train, 0.0))
        z.writestr('chess/seq-02.zip', make_seq_zip(num_test, 5.0))


@pytest.fixture(scope='module')
def checkpoints(tmp_path_factory):
    """Tiny random-init codebook + transformer checkpoints on disk."""
    import numpy as np

    from viewformer_tpu.train.checkpoint import CheckpointManager
    from viewformer_tpu.train.codebook import (create_codebook_optimizer,
                                               init_codebook_state)
    from viewformer_tpu.train.transformer import (create_transformer_optimizer,
                                                  init_transformer_state)

    root = tmp_path_factory.mktemp('ckpts')
    cconfig = VQGANConfig(ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[],
                          z_channels=32, embed_dim=8, n_embed=16, image_size=32,
                          perceptual_weight=0.0)
    coptimizer = create_codebook_optimizer(cconfig)
    _, cstate = init_codebook_state(cconfig, jax.random.PRNGKey(0), coptimizer)
    cmgr = CheckpointManager(str(root / 'codebook'), cconfig)
    cmgr.save(0, cstate)
    cmgr.close()

    # sequence_size 6: 5 context + 1 query
    tconfig = MIGTConfig(n_embeddings=16, n_head=2, d_model=32, n_layer=1,
                         dropout=0.0, sequence_size=6, token_image_size=2,
                         total_steps=10, n_loss_skip=1,
                         localization_weight=Schedule.from_str('1'))
    toptimizer, _ = create_transformer_optimizer(tconfig)
    _, tstate = init_transformer_state(tconfig, jax.random.PRNGKey(1), toptimizer)
    tmgr = CheckpointManager(str(root / 'transformer'), tconfig)
    tmgr.save(0, tstate)
    tmgr.close()
    return str(root / 'codebook'), str(root / 'transformer')


@pytest.fixture(scope='module')
def scenes_path(tmp_path_factory):
    root = tmp_path_factory.mktemp('7scenes')
    _make_sevenscenes_fixture(str(root))
    return str(root)


@pytest.mark.slow
def test_evaluate_sevenscenes_standard(scenes_path, checkpoints, tmp_path):
    from viewformer_tpu.evaluate.sevenscenes import evaluate_sevenscenes
    codebook, transformer = checkpoints
    results = evaluate_sevenscenes(
        scenes_path, transformer, codebook, str(tmp_path / 'job'),
        scenes=['chess'], num_eval_sequences=2, num_context_views=5,
        image_size=32, num_store_images=2, progress=False)
    assert 'chess' in results
    assert np.isfinite(results['chess']['psnr'])
    assert np.isfinite(results['chess']['loc-dist'])
    assert os.path.exists(os.path.join(tmp_path, 'job', 'chess', 'results.json'))

    # batched queries (--batch-size) must reproduce the B=1 results exactly:
    # context sampling draws from the same per-scene seeded rng in the same
    # index order regardless of batching
    batched = evaluate_sevenscenes(
        scenes_path, transformer, codebook, str(tmp_path / 'job2'),
        scenes=['chess'], num_eval_sequences=2, num_context_views=5,
        image_size=32, num_store_images=2, progress=False, batch_size=2)
    for key, value in results['chess'].items():
        if value is None:
            assert batched['chess'][key] is None
        else:
            np.testing.assert_allclose(batched['chess'][key], value, atol=1e-5,
                                       err_msg=key)


@pytest.mark.slow
def test_evaluate_sevenscenes_generated_images(scenes_path, checkpoints, tmp_path):
    from viewformer_tpu.evaluate.sevenscenes import evaluate_sevenscenes
    codebook, transformer = checkpoints
    results = evaluate_sevenscenes(
        scenes_path, transformer, codebook, str(tmp_path / 'job'),
        scenes=['chess'], num_eval_sequences=1, num_context_views=5,
        image_size=32, generation_procedure='generated_images', num_gen_ctx=2,
        progress=False)
    assert np.isfinite(results['chess']['psnr'])


@pytest.mark.slow
def test_evaluate_sevenscenes_pose_refinement(scenes_path, checkpoints, tmp_path):
    from viewformer_tpu.evaluate.sevenscenes import evaluate_sevenscenes
    codebook, transformer = checkpoints
    results = evaluate_sevenscenes(
        scenes_path, transformer, codebook, str(tmp_path / 'job'),
        scenes=['chess'], num_eval_sequences=1, num_context_views=5,
        image_size=32, generation_procedure='pose_refinement', num_gen_ctx=2,
        progress=False)
    assert np.isfinite(results['chess']['loc-dist'])


def test_evaluate_sevenscenes_baseline(scenes_path, tmp_path):
    import viewformer_tpu.evaluate.sevenscenes_baseline as bl
    # baseline builds 19-ctx batches; patch the fill count via sample size
    results = {}
    for baseline in ('mean', 'position_oracle', 'orientation_oracle'):
        out = bl.evaluate_sevenscenes_baseline(
            scenes_path, str(tmp_path / f'job_{baseline}'), scenes=['chess'],
            num_eval_sequences=2, baseline=baseline, progress=False)
        results[baseline] = out['chess']
        assert np.isfinite(out['chess']['loc-dist'])
    # oracle should beat mean on position
    assert results['position_oracle']['loc-dist'] <= results['mean']['loc-dist'] + 1e-6


@pytest.mark.slow
def test_evaluate_sevenscenes_multictx(scenes_path, checkpoints, tmp_path):
    """Previously untested command: 7-Scenes x multi-context grid with
    batched queries and tiny context/image overrides."""
    from viewformer_tpu.evaluate.sevenscenes_multictx import \
        evaluate_sevenscenes_multictx

    codebook, transformer = checkpoints
    results = evaluate_sevenscenes_multictx(
        scenes_path, transformer, codebook, str(tmp_path / 'job'),
        scenes=['chess'], num_eval_sequences=2, batch_size=2,
        num_context_views=5, image_size=32, num_store_images=2,
        progress=False)
    assert 'chess' in results
    # one metric block per context size 1..5
    assert np.isfinite(results['chess']['ctx05']['psnr'])
    assert np.isfinite(results['chess']['ctx01']['loc-dist'])
    assert os.path.exists(os.path.join(tmp_path, 'job', 'chess', 'results.json'))
