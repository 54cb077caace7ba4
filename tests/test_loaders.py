"""Loader tests over synthetic on-disk fixtures (no external downloads)."""
import gzip
import json
import os
import zipfile

import numpy as np
import pytest
from PIL import Image

from viewformer_tpu.data.archive import ArchiveStore


def _png_bytes(rng, size=16):
    import io
    img = Image.fromarray(rng.randint(0, 255, (size, size, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, 'PNG')
    return buf.getvalue()


def test_archive_store(tmp_path):
    archive_path = tmp_path / 'scene.zip'
    with zipfile.ZipFile(archive_path, 'w') as z:
        z.writestr('scene/a.txt', 'hello')
        z.writestr('scene/sub/', '')  # explicit dir entry, as real zips have
        z.writestr('scene/sub/b.txt', 'world')
    with ArchiveStore(str(tmp_path / 'scene')) as store:
        assert sorted(store.ls('')) == ['a.txt', 'sub']
        with store.open('a.txt') as f:
            assert f.read() == 'hello'
        with store.open('sub/b.txt') as f:
            assert f.read() == 'world'
        assert sorted(store.glob('*.txt')) == ['a.txt', 'sub/b.txt']  # fnmatch * crosses / (reference behavior)


def test_sevenscenes_loader(tmp_path):
    rng = np.random.RandomState(0)
    # nested archive layout: chess.zip containing seq-01.zip + split files
    seq_buf_path = tmp_path / 'seq-01.zip'
    with zipfile.ZipFile(seq_buf_path, 'w') as z:
        for i in range(3):
            pose = np.eye(4, dtype=np.float32)
            pose[:3, 3] = [i, 0, 0]
            z.writestr(f'frame-{i:06d}.pose.txt',
                       '\n'.join(' '.join(str(v) for v in row) for row in pose))
            z.writestr(f'frame-{i:06d}.color.png', _png_bytes(rng))
    with zipfile.ZipFile(tmp_path / 'chess.zip', 'w') as z:
        z.writestr('chess/TrainSplit.txt', 'sequence1\n')
        z.writestr('chess/TestSplit.txt', '')
        z.write(seq_buf_path, 'chess/seq-01.zip')

    from viewformer_tpu.data.loaders.sevenscenes import SevenScenesLoader
    loader = SevenScenesLoader(str(tmp_path), split='train', scenes=['chess'])
    assert len(loader) == 1
    assert loader.num_images_per_sequence() == [3]
    item = loader[0]
    assert item['cameras'].shape == (3, 7)
    np.testing.assert_allclose(item['cameras'][:, 0], [0, 1, 2])
    np.testing.assert_allclose(np.abs(item['cameras'][:, 3]), 1, atol=1e-6)  # identity quat
    frames = np.asarray(item['frames'])
    assert frames.shape == (3, 16, 16, 3)


def test_shapenet_loader(tmp_path):
    rng = np.random.RandomState(1)
    import viewformer_tpu.data.loaders.shapenet as sn
    seq_dir = tmp_path / 'cars_test' / 'seq0'
    (seq_dir / 'pose').mkdir(parents=True)
    (seq_dir / 'rgb').mkdir(parents=True)
    for i in range(4):
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [0, i, 0]
        with open(seq_dir / 'pose' / f'{i:06d}.txt', 'w') as f:
            f.write(' '.join(str(v) for v in pose.reshape(-1)))
        Image.fromarray(rng.randint(0, 255, (16, 16, 3), np.uint8)).save(
            seq_dir / 'rgb' / f'{i:06d}.png')

    # shrink the hardcoded size table for the fixture
    orig = dict(sn._SEQ_SIZES)
    sn._SEQ_SIZES['cars_test'] = (1, 4)
    try:
        loader = sn.ShapenetLoader(str(tmp_path), split='test', categories=['cars'])
        assert len(loader) == 1
        item = loader[0]
        cameras = np.asarray(item['cameras'])
        assert cameras.shape == (4, 7)
        np.testing.assert_allclose(cameras[:, 1], [0, 1, 2, 3])
        assert np.asarray(item['frames']).shape == (4, 16, 16, 3)
    finally:
        sn._SEQ_SIZES.update(orig)


def test_co3dv2_loader(tmp_path):
    rng = np.random.RandomState(2)
    category = tmp_path / 'apple'
    (category / 'images').mkdir(parents=True)
    (category / 'masks').mkdir(parents=True)
    annotations = []
    data_list = []
    for seq in ('seqA', 'seqB'):
        for fn in range(2):
            img_path = f'apple/images/{seq}_{fn}.png'
            mask_path = f'apple/masks/{seq}_{fn}.png'
            Image.fromarray(rng.randint(0, 255, (16, 16, 3), np.uint8)).save(
                tmp_path / img_path)
            Image.fromarray((rng.rand(16, 16) > 0.5).astype(np.uint8) * 255).save(
                tmp_path / mask_path)
            annotations.append({
                'sequence_name': seq, 'frame_number': fn,
                'image': {'path': img_path}, 'mask': {'path': mask_path},
                'viewpoint': {'R': np.eye(3).tolist(), 'T': [0.0, 0.0, float(fn)]},
            })
            data_list.append([seq, fn, img_path])
    with gzip.open(category / 'frame_annotations.jgz', 'wt') as f:
        json.dump(annotations, f)
    with open(category / 'set_lists.json', 'w') as f:
        json.dump({'fewview_train': data_list}, f)

    from viewformer_tpu.data.loaders.co3dv2 import CO3Dv2Loader
    loader = CO3Dv2Loader(str(tmp_path), split='train', categories=['apple'],
                          image_size=16)
    assert len(loader) == 2
    assert loader.num_images_per_sequence() == [2, 2]
    item = loader[1]
    assert item['sequence_id'] == 'seqB'
    assert item['frames'].shape == (2, 16, 16, 4)  # RGBA
    assert item['cameras'].shape == (2, 7)
    # masked background: pixels where mask==0 are black
    mask = item['frames'][0, ..., 3]
    rgb = item['frames'][0, ..., :3]
    assert (rgb[mask == 0] == 0).all()


def test_sm7_loader_local_mirror(tmp_path):
    """SM7 semantics over a local mirror of GQN-style shards."""
    from viewformer_tpu.data.dataset import write_shard
    rng = np.random.RandomState(3)
    base = tmp_path / 'shepard_metzler_7_parts' / 'test'
    base.mkdir(parents=True)

    def sequences():
        for _ in range(3):
            frames = rng.randint(0, 255, (15, 64, 64, 3), np.uint8)
            cameras = rng.randn(15, 5).astype(np.float32)
            yield dict(frames=frames, cameras=cameras)

    # write a single shard named like the GQN layout
    write_shard(str(base / 'dummy'), sequences(), ['frames', 'cameras-gqn'])
    os.rename(base / 'dummy.tfrecord', base / '001-of-100.tfrecord')

    from viewformer_tpu.data.loaders.sm7 import SM7Loader
    loader = SM7Loader(split='test', path=str(tmp_path / 'shepard_metzler_7_parts'))
    loader.shards = loader.shards[:1]
    item = loader[0]
    assert item['frames'].shape == (15, 64, 64, 3)
    assert item['cameras'].shape == (15, 7)  # legacy 5-d converted
    item2 = loader[2]
    assert item2['frames'].shape == (15, 64, 64, 3)
