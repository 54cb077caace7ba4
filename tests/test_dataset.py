import json
import os

import numpy as np
import pytest

from viewformer_tpu.data import (fix_legacy_gqn_cameras, generate_dataset_from_loader,
                                 get_dataset_info, read_dataset, shuffle_dataset,
                                 transform_dataset)
from viewformer_tpu.data.dataset import _get_shard_map, expand_path
from viewformer_tpu.data.loaders import build, get_loader_names


@pytest.fixture(scope='module')
def colors_dataset(tmp_path_factory):
    path = tmp_path_factory.mktemp('ds')
    loader = build('colors', split='train', num_sequences=6, sequence_size=4, image_size=32)
    generate_dataset_from_loader(loader, 'train', str(path / 'colors'),
                                 max_sequences_per_shard=2, progress=False)
    loader_test = build('colors', split='test', num_sequences=2, sequence_size=4, image_size=32)
    generate_dataset_from_loader(loader_test, 'test', str(path / 'colors'),
                                 max_sequences_per_shard=2, progress=False)
    return str(path)


def test_colors_loader_deterministic():
    loader = build('colors', split='train', num_sequences=3, sequence_size=5, image_size=32)
    a, b = loader[1], loader[1]
    np.testing.assert_array_equal(a['frames'], b['frames'])
    assert a['frames'].shape == (5, 32, 32, 3)
    assert a['cameras'].shape == (5, 7)
    # different sequences differ
    c = loader[2]
    assert not np.array_equal(a['frames'], c['frames'])


def test_shard_map():
    shards = _get_shard_map([5, 5, 5, 5, 5], max_images_per_shard=10, max_sequences_per_shard=None)
    assert shards == [(2, 10, 0), (2, 10, 2), (1, 5, 4)]
    shards = _get_shard_map([3, 3, 3], None, 2)
    assert shards == [(2, 6, 0), (1, 3, 2)]


def test_generate_and_read_roundtrip(colors_dataset):
    info = get_dataset_info(colors_dataset)
    assert info['frame_size'] == 32
    assert info['train_size'] == 3
    assert info['train_num_sequences'] == 6
    assert info['train_num_images'] == 24
    assert sorted(info['splits']) == ['test', 'train']
    assert set(info['features']) == {'cameras', 'frames'}

    sequences = list(read_dataset(colors_dataset, 'train'))
    assert len(sequences) == 6
    for seq in sequences:
        assert seq['frames'].shape == (4, 32, 32, 3)
        assert seq['cameras'].shape == (4, 7)

    # content matches the loader (modulo JPEG loss)
    loader = build('colors', split='train', num_sequences=6, sequence_size=4, image_size=32)
    orig = loader[0]
    err = np.abs(sequences[0]['frames'].astype(int) - orig['frames'].astype(int)).mean()
    assert err < 5
    np.testing.assert_allclose(sequences[0]['cameras'], orig['cameras'], atol=1e-6)


def test_index_files_written(colors_dataset):
    info = get_dataset_info(colors_dataset)
    # global index
    with open(os.path.join(colors_dataset, 'colors-train.index')) as f:
        lines = [l.split() for l in f.read().strip().splitlines()]
    assert len(lines) == 6
    assert [int(l[1]) for l in lines] == [4] * 6
    # per-shard index
    assert os.path.exists(os.path.join(colors_dataset, 'colors-train-000001-of-000003.index'))


def test_dataset_loader_roundtrip(colors_dataset):
    loader = build('dataset', path=colors_dataset, split='train')
    assert len(loader) == 6
    assert loader.num_images_per_sequence() == [4] * 6
    item = loader[2]
    assert item['frames'].shape == (4, 32, 32, 3)
    # random access backwards works (iterator restart)
    item0 = loader[0]
    assert item0['frames'].shape == (4, 32, 32, 3)


def test_dataset_loader_sequence_size(colors_dataset):
    loader = build('dataset', path=colors_dataset, split='train', sequence_size=2)
    assert len(loader) == 12
    assert loader[0]['frames'].shape == (2, 32, 32, 3)


def test_transform_dataset(colors_dataset, tmp_path):
    class CodesTransformer:
        def output_features(self, features):
            return ['codes', 'cameras']

        def update_dataset_info(self, info):
            info['token_image_size'] = 2
            return info

        def __call__(self, split, dataset):
            for item in dataset:
                n = len(item['frames'])
                yield dict(cameras=item['cameras'],
                           codes=np.arange(n * 4).reshape(n, 2, 2))

    out = str(tmp_path / 'codes')
    transform_dataset(colors_dataset, out, CodesTransformer(), progress=False)
    info = get_dataset_info(out)
    assert info['token_image_size'] == 2
    assert set(info['features']) == {'codes', 'cameras'}
    seqs = list(read_dataset(out, 'train'))
    assert len(seqs) == 6
    assert seqs[0]['codes'].shape == (4, 2, 2)
    np.testing.assert_array_equal(seqs[0]['codes'][1], [[4, 5], [6, 7]])


def test_shuffle_dataset(colors_dataset, tmp_path):
    out = str(tmp_path / 'shuffled')
    shuffle_dataset(colors_dataset, out, seed=7, progress=False)
    orig = {s['frames'].tobytes() for s in read_dataset(colors_dataset, 'train')}
    shuffled_list = [s['frames'].tobytes() for s in read_dataset(out, 'train')]
    assert set(shuffled_list) == orig  # same content
    orig_list = [s['frames'].tobytes() for s in read_dataset(colors_dataset, 'train')]
    assert shuffled_list != orig_list  # different order (6 seqs, overwhelmingly likely)
    # index sidecars valid
    info = get_dataset_info(out)
    assert info['train_size'] == 3


def test_fix_legacy_gqn_cameras():
    poses = np.array([[1.0, 2.0, 3.0, 0.5, 0.25]], np.float32)
    out = fix_legacy_gqn_cameras(poses)
    assert out.shape == (1, 7)
    np.testing.assert_allclose(out[0, :3], [2.0, -3.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(out[0, 3:]), 1.0, atol=1e-6)


def test_expand_path():
    paths = expand_path('/x/ds-train-{000001..000003}-of-000003')
    assert paths == ['/x/ds-train-000001-of-000003',
                     '/x/ds-train-000002-of-000003',
                     '/x/ds-train-000003-of-000003']


def test_loader_names():
    names = get_loader_names()
    for expected in ('colors', 'dataset', 'interiornet', 'sevenscenes',
                     'shapenet', 'sm7', 'co3d', 'co3dv2'):
        assert expected in names


def test_incompatible_info_rejected(colors_dataset):
    loader = build('colors', split='train', num_sequences=6, sequence_size=4, image_size=16)
    with pytest.raises(RuntimeError):
        generate_dataset_from_loader(loader, 'train', os.path.join(colors_dataset, 'colors'),
                                     max_sequences_per_shard=2, progress=False)
