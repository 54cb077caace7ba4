"""Hermetic end-to-end slice (SURVEY §7.3): colors -> dataset generate ->
train codebook -> generate-codes -> train transformer -> evaluate, all
through the CLI surface."""
import json
import os

import numpy as np
import pytest
from click.testing import CliRunner

from viewformer_tpu.cli import main


@pytest.fixture(scope='module')
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp('e2e')


@pytest.fixture(scope='module')
def runner():
    return CliRunner()


def _run(runner, args):
    result = runner.invoke(main, args, catch_exceptions=False)
    assert result.exit_code == 0, result.output
    return result


@pytest.mark.slow
def test_full_pipeline(runner, workdir):
    ds = str(workdir / 'ds')
    # 1. dataset generate (both splits)
    _run(runner, ['dataset', 'generate',
                  '--loader', 'colors',
                  '--loader-num-sequences', '6',
                  '--loader-sequence-size', '6',
                  '--loader-image-size', '32',
                  '--output', os.path.join(ds, 'colors'),
                  '--max-sequences-per-shard', '3',
                  '--split', 'train', '--split', 'test'])
    assert os.path.exists(os.path.join(ds, 'info.json'))

    # 2. train codebook (tiny)
    codebook_dir = str(workdir / 'codebook')
    _run(runner, ['train', 'codebook',
                  '--dataset', ds,
                  '--job-dir', codebook_dir,
                  '--total-steps', '4',
                  '--epochs', '2',
                  '--batch-size', '4',
                  '--image-size', '32',
                  '--ch', '32',
                  '--num-res-blocks', '1',
                  '--n-embed', '16',
                  '--embed-dim', '8',
                  '--perceptual-weight', '0',
                  '--fp32'])
    assert os.path.exists(os.path.join(codebook_dir, 'config.json'))

    # patch tiny architecture dims that have no CLI flags
    with open(os.path.join(codebook_dir, 'config.json')) as f:
        cfg = json.load(f)
    assert cfg['n_embed'] == 16

    # 3. generate-codes
    codes = str(workdir / 'codes')
    _run(runner, ['generate-codes',
                  '--dataset', ds,
                  '--output', codes,
                  '--model', codebook_dir,
                  '--batch-size', '8'])
    with open(os.path.join(codes, 'info.json')) as f:
        codes_info = json.load(f)
    # image 32, ch_mult default [1,1,2,2,4] -> stride 16 -> token grid 2x2
    assert codes_info['token_image_size'] == 2
    from viewformer_tpu.data import read_dataset
    seqs = list(read_dataset(codes, 'train'))
    assert len(seqs) == 6
    assert seqs[0]['codes'].shape == (6, 2, 2)
    assert seqs[0]['codes'].max() < 16

    # 4. train transformer (tiny)
    transformer_dir = str(workdir / 'transformer')
    _run(runner, ['train', 'transformer',
                  '--dataset', codes,
                  '--codebook-model', codebook_dir,
                  '--job-dir', transformer_dir,
                  '--total-steps', '4',
                  '--epochs', '2',
                  '--batch-size', '2',
                  '--d-model', '32',
                  '--n-layer', '1',
                  '--n-head', '2',
                  '--sequence-size', '3',
                  '--token-image-size', '2',
                  '--n-loss-skip', '1',
                  '--fp32'])
    with open(os.path.join(transformer_dir, 'config.json')) as f:
        tcfg = json.load(f)
    assert tcfg['n_embeddings'] == 16

    # 5. evaluate transformer
    eval_dir = str(workdir / 'eval')
    _run(runner, ['evaluate', 'transformer',
                  '--loader', 'dataset',
                  '--loader-path', ds,
                  '--loader-split', 'test',
                  '--transformer-model', transformer_dir,
                  '--codebook-model', codebook_dir,
                  '--job-dir', eval_dir,
                  '--batch-size', '2',
                  '--num-eval-sequences', '2',
                  '--num-store-images', '4'])
    with open(os.path.join(eval_dir, 'results.json')) as f:
        results = json.load(f)
    assert 'psnr' in results and np.isfinite(results['psnr'])
    assert 'loc-dist' in results
    assert os.path.exists(os.path.join(eval_dir, '00000000-gen.png'))

    # 6. evaluate transformer-multictx
    multictx_dir = str(workdir / 'eval_multictx')
    _run(runner, ['evaluate', 'transformer-multictx',
                  '--loader', 'dataset',
                  '--loader-path', ds,
                  '--loader-split', 'test',
                  '--transformer-model', transformer_dir,
                  '--codebook-model', codebook_dir,
                  '--job-dir', multictx_dir,
                  '--batch-size', '2',
                  '--num-eval-sequences', '2',
                  '--num-store-images', '2'])
    with open(os.path.join(multictx_dir, 'results.json')) as f:
        results = json.load(f)
    assert 'ctx01' in results and 'ctx02' in results

    # 7. evaluate codebook
    cb_eval_dir = str(workdir / 'eval_codebook')
    _run(runner, ['evaluate', 'codebook',
                  '--loader', 'dataset',
                  '--loader-path', ds,
                  '--loader-split', 'test',
                  '--codebook-model', codebook_dir,
                  '--job-dir', cb_eval_dir,
                  '--batch-size', '8',
                  '--num-eval-images', '8'])
    with open(os.path.join(cb_eval_dir, 'results.json')) as f:
        results = json.load(f)
    assert 'psnr' in results and 'ssim' in results

    # 8. model info
    result = _run(runner, ['model', 'info', '--model', codebook_dir])
    assert 'total:' in result.output

    # 9. visualize codebook grid (headless)
    grid_path = str(workdir / 'grid.png')
    _run(runner, ['visualize', 'codebook',
                  '--loader', 'dataset',
                  '--loader-path', ds,
                  '--loader-split', 'test',
                  '--codebook-model', codebook_dir,
                  '--output', grid_path, '--num-images', '4'])
    assert os.path.exists(grid_path)

    # 10. dataset shuffle via CLI
    _run(runner, ['dataset', 'shuffle',
                  '--dataset', ds, '--output', str(workdir / 'shuffled')])
    assert os.path.exists(os.path.join(str(workdir / 'shuffled'), 'info.json'))
