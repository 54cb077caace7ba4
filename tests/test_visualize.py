"""Headless visualizer commands through the real CLI (--output png modes)."""
import os

import numpy as np
import pytest
from click.testing import CliRunner
from PIL import Image

import jax

from viewformer_tpu.cli import main
from viewformer_tpu.config import VQGANConfig


@pytest.fixture(scope='module')
def codebook_dir(tmp_path_factory):
    from viewformer_tpu.train.checkpoint import CheckpointManager
    from viewformer_tpu.train.codebook import (create_codebook_optimizer,
                                               init_codebook_state)

    config = VQGANConfig(ch=32, ch_mult=[1, 2], num_res_blocks=1,
                         attn_resolutions=[], z_channels=32, embed_dim=8,
                         n_embed=16, image_size=32, perceptual_weight=0.0)
    optimizer = create_codebook_optimizer(config)
    _, state = init_codebook_state(config, jax.random.PRNGKey(0), optimizer)
    path = tmp_path_factory.mktemp('viz') / 'codebook'
    mgr = CheckpointManager(str(path), config)
    mgr.save(0, state)
    mgr.close()
    return str(path)


def test_visualize_codebook_grid(codebook_dir, tmp_path):
    out = str(tmp_path / 'grid.png')
    result = CliRunner().invoke(main, [
        'visualize', 'codebook', '--loader', 'colors',
        '--loader-num-sequences', '2', '--loader-sequence-size', '4',
        '--codebook-model', codebook_dir, '--output', out,
        '--num-images', '4'], catch_exceptions=False)
    assert result.exit_code == 0, result.output
    grid = np.asarray(Image.open(out))
    # 4 (original, reconstruction) pairs -> 8 tiles in one 8-wide row
    assert grid.shape == (32, 8 * 32, 3)


def test_dataset_visualize_preview(tmp_path):
    out = str(tmp_path / 'preview.png')
    result = CliRunner().invoke(main, [
        'dataset', 'visualize', '--loader', 'colors',
        '--loader-num-sequences', '3', '--loader-sequence-size', '4',
        '--loader-image-size', '32', '--output', out,
        '--max-sequences', '2'], catch_exceptions=False)
    assert result.exit_code == 0, result.output
    assert os.path.exists(out)
    assert np.asarray(Image.open(out)).ndim == 3
