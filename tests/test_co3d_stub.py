"""CO3D v1 loader + `evaluate co3d` exercised against a stub co3d package.

The pinned facebookresearch/co3d code and pytorch3d datasets are unavailable
offline, so these tests stub the OFFICIAL side of the boundary (dataset_zoo /
dataloader_zoo / eval_batch / summarize) with shape-faithful fakes and verify
everything on OUR side: sequence grouping and cumulative indexing, foreground
masking, the PyTorch3D->framework camera conversion, the target-first batch
reordering in evaluate_co3d, and the results.json aggregation
(ref evaluate_co3d.py:38-192, data/loaders/co3d.py:79-213).
"""
import json
import os
import sys
import textwrap

import numpy as np
import pytest

torch = pytest.importorskip('torch')

FAKE_SEQS = {'seqA': 5, 'seqB': 5}  # name -> frames (= tiny MIGT sequence_size)
H = W = 32


def _write_fake_co3d(root):
    """A minimal co3d code tree exposing exactly the symbols our code imports."""
    (root / 'dataset').mkdir(parents=True)
    (root / 'evaluation').mkdir()
    (root / 'dataset' / '__init__.py').write_text('')
    (root / 'evaluation' / '__init__.py').write_text('')
    (root / 'dataset' / 'co3d_dataset.py').write_text(textwrap.dedent('''
        from dataset._fake_data import FakeCo3dDataset

        def Co3dDataset(**params):
            # val/test construction path: subset selected via params['subsets']
            return FakeCo3dDataset(params['subsets'][0])
    '''))
    (root / 'dataset' / 'dataset_zoo.py').write_text(textwrap.dedent('''
        from dataset._fake_data import FakeCo3dDataset

        CO3D_CATEGORIES = ['apple', 'banana']
        DATASET_CONFIGS = {'default': {'image_height': 32, 'image_width': 32}}

        def dataset_zoo(dataset_name, dataset_root=None, category=None, **kw):
            assert dataset_name == 'co3d_multisequence', dataset_name
            return {'train': FakeCo3dDataset('train'),
                    'val': FakeCo3dDataset('val'),
                    'test': FakeCo3dDataset('test_known')}
    '''))
    (root / 'dataset' / 'dataloader_zoo.py').write_text(textwrap.dedent('''
        import torch
        from dataset._fake_data import FakeCo3dDataset, collate

        def dataloader_zoo(datasets, dataset_name):
            ds = datasets['test']
            # one batch per sequence, target frame FIRST (official convention)
            batches = [collate([ds[j] for j in seq]) for seq in ds.sequence_indices()]
            return {'test': batches}
    '''))
    (root / 'dataset' / '_fake_data.py').write_text(textwrap.dedent('''
        import numpy as np
        import torch

        FAKE_SEQS = {'seqA': 5, 'seqB': 5}
        H = W = 32

        class _Annot:
            def __init__(self, seq):
                self.sequence_name = seq

        class _Transform:
            def __init__(self, m):
                self._m = m

            def get_matrix(self):
                return self._m

        class _Camera:
            def __init__(self, m):
                self._m = m

            def get_world_to_view_transform(self):
                return _Transform(self._m)

        class _FrameData:
            pass

        def _make_frame(seq, i, rs):
            fd = _FrameData()
            fd.sequence_name = seq
            img = torch.from_numpy(rs.rand(3, H, W).astype(np.float32))
            fd.image_rgb = img
            mask = torch.zeros(1, H, W)
            mask[:, 8:24, 8:24] = 1.0  # center square foreground
            fd.fg_probability = mask
            fd.depth_map = torch.from_numpy(rs.rand(1, H, W).astype(np.float32))
            angle = 0.3 * i
            c, s = np.cos(angle), np.sin(angle)
            m = np.eye(4, dtype=np.float32)
            m[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
            m[3, :3] = [0.1 * i, 0.0, 2.0]  # pytorch3d row-vector convention
            fd.camera = _Camera(torch.from_numpy(m)[None])
            return fd

        class FakeCo3dDataset:
            def __init__(self, subset):
                self.subset = subset
                rs = np.random.RandomState(hash(subset) % (2 ** 31))
                self._frames = []
                self.frame_annots = []
                for seq, n in FAKE_SEQS.items():
                    for i in range(n):
                        self._frames.append(_make_frame(seq, i, rs))
                        self.frame_annots.append({'frame_annotation': _Annot(seq)})

            def __len__(self):
                return len(self._frames)

            def __getitem__(self, i):
                return self._frames[i]

            def sequence_indices(self):
                out, start = [], 0
                for seq, n in FAKE_SEQS.items():
                    out.append(list(range(start, start + n)))
                    start += n
                return out

        def collate(frames):
            fd = _FrameData()
            fd.sequence_name = frames[0].sequence_name
            fd.image_rgb = torch.stack([f.image_rgb for f in frames], 0)
            fd.fg_probability = torch.stack([f.fg_probability for f in frames], 0)
            fd.depth_map = torch.stack([f.depth_map for f in frames], 0)
            m = torch.cat([f.camera._m for f in frames], 0)
            fd.camera = _Camera(m)
            return fd
    '''))
    (root / 'eval_demo.py').write_text(textwrap.dedent('''
        def _print_aggregate_results(task, task_results):
            pass

        def aggregate_nvs_results(results):
            out = []
            for category_result in results:
                for x in category_result:
                    out.append(x)
            return out
    '''))
    (root / 'evaluation' / 'evaluate_new_view_synthesis.py').write_text(
        textwrap.dedent('''
        import collections
        import numpy as np
        import torch

        NewViewSynthesisPrediction = collections.namedtuple(
            'NewViewSynthesisPrediction',
            ['image_render', 'mask_render', 'depth_render'])

        def eval_batch(frame_data, preds, bg_color='black', lpips_model=None,
                       source_cameras=None):
            gt = frame_data.image_rgb[:1]
            pred = preds.image_render
            assert pred.shape == gt.shape, (pred.shape, gt.shape)
            mse = float(torch.mean((pred - gt) ** 2))
            return {'psnr': -10.0 * np.log10(max(mse, 1e-10)),
                    'subset': 'test_known', 'subsubset': 'all'}

        def summarize_nvs_eval_results(per_batch, task):
            psnr = float(np.mean([b['psnr'] for b in per_batch]))
            results = [{'subset': 'test_known', 'subsubset': 'all',
                        'metrics': {'psnr': psnr}}]
            return per_batch, {'results': results}

        def pretty_print_nvs_metrics(results):
            pass
    '''))


class _FakeLpips:
    def __init__(self, net=None):
        pass

    def cuda(self):
        return self


@pytest.fixture()
def fake_co3d(tmp_path, monkeypatch):
    root = tmp_path / 'co3d_code'
    _write_fake_co3d(root)
    import viewformer_tpu.data.loaders.co3d as co3d_mod
    monkeypatch.setattr(co3d_mod, '_co3d_code_path', lambda: str(root))
    monkeypatch.setitem(sys.modules, 'lpips',
                        type(sys)('lpips'))
    sys.modules['lpips'].LPIPS = _FakeLpips
    yield root
    # the fake package modules must not leak into other tests
    for name in list(sys.modules):
        if name == 'dataset' or name.startswith(('dataset.', 'evaluation',
                                                 'eval_demo')):
            del sys.modules[name]


def test_camera_conversion_identity():
    """PyTorch3D identity world->view maps to position 0 and the axis-flip
    rotation diag(-1,-1,1) == 180deg about z == quaternion (0,0,0,1)."""
    from viewformer_tpu.data.loaders.co3d import CO3DLoader
    m = np.eye(4, dtype=np.float32)[None]
    cams = CO3DLoader.world_to_camera_to_cameras(m)
    assert cams.shape == (1, 7)
    np.testing.assert_allclose(cams[0, :3], 0.0, atol=1e-6)
    q = cams[0, 3:]
    expected = np.array([0.0, 0.0, 0.0, 1.0], np.float32)
    np.testing.assert_allclose(np.abs(q), np.abs(expected), atol=1e-6)


def test_camera_conversion_rigid_roundtrip():
    """Conversion output is a unit quaternion and reproduces the (flipped)
    rotation matrix."""
    from viewformer_tpu.data.loaders.co3d import CO3DLoader
    from viewformer_tpu.utils.geometry import quaternion_to_rotation_matrix
    rs = np.random.RandomState(0)
    angle = rs.rand() * 2 * np.pi
    c, s = np.cos(angle), np.sin(angle)
    m = np.eye(4, dtype=np.float64)
    m[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    m[:3, 3] = rs.randn(3)
    cams = CO3DLoader.world_to_camera_to_cameras(m[None])
    q = cams[0, 3:]
    np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-5)
    world_to_cam = np.linalg.inv(m)
    world_to_cam[:2, :] *= -1
    R = quaternion_to_rotation_matrix(q)
    np.testing.assert_allclose(R, world_to_cam[:3, :3], atol=1e-5)
    np.testing.assert_allclose(cams[0, :3], world_to_cam[:3, 3], atol=1e-5)


def test_loader_with_stub(fake_co3d):
    from viewformer_tpu.data.loaders.co3d import CO3DLoader
    loader = CO3DLoader(path='/nonexistent', split='test', categories='apple',
                        mask_images=True)
    assert len(loader) == len(FAKE_SEQS)
    assert loader.num_images_per_sequence() == list(FAKE_SEQS.values())
    item = loader[1]
    n = FAKE_SEQS['seqB']
    assert item['frames'].shape == (n, H, W, 3) and item['frames'].dtype == np.uint8
    assert item['cameras'].shape == (n, 7)
    assert item['depthmaps'].shape == (n, H, W, 1)
    assert item['sequence_id'] == 'seqB'
    # masking zeroes the background
    assert item['frames'][:, 0, 0].max() == 0
    assert item['frames'][:, 16, 16].max() > 0
    # quaternions normalized
    np.testing.assert_allclose(
        np.linalg.norm(item['cameras'][:, 3:], axis=-1), 1.0, atol=1e-5)


@pytest.fixture(scope='module')
def tiny_checkpoints(tmp_path_factory):
    import jax

    from viewformer_tpu.config import MIGTConfig, VQGANConfig
    from viewformer_tpu.train.checkpoint import CheckpointManager
    from viewformer_tpu.train.codebook import (create_codebook_optimizer,
                                               init_codebook_state)
    from viewformer_tpu.train.transformer import (create_transformer_optimizer,
                                                  init_transformer_state)
    from viewformer_tpu.utils.schedules import Schedule

    root = tmp_path_factory.mktemp('co3d_ckpts')
    cconfig = VQGANConfig(ch=32, ch_mult=[1, 2], num_res_blocks=1,
                          attn_resolutions=[], z_channels=32, embed_dim=8,
                          n_embed=16, image_size=32, perceptual_weight=0.0)
    coptimizer = create_codebook_optimizer(cconfig)
    _, cstate = init_codebook_state(cconfig, jax.random.PRNGKey(0), coptimizer)
    mgr = CheckpointManager(str(root / 'codebook'), cconfig)
    mgr.save(0, cstate)
    mgr.close()
    tconfig = MIGTConfig(n_embeddings=16, n_head=2, d_model=32, n_layer=1,
                         dropout=0.0, sequence_size=5, token_image_size=16,
                         total_steps=10, n_loss_skip=1,
                         localization_weight=Schedule.from_str('1'))
    toptimizer, _ = create_transformer_optimizer(tconfig)
    _, tstate = init_transformer_state(tconfig, jax.random.PRNGKey(1), toptimizer)
    tmgr = CheckpointManager(str(root / 'transformer'), tconfig)
    tmgr.save(0, tstate)
    tmgr.close()
    return str(root / 'transformer'), str(root / 'codebook')


@pytest.mark.slow
def test_evaluate_co3d_with_stub(fake_co3d, tiny_checkpoints, tmp_path):
    from viewformer_tpu.evaluate.co3d import evaluate_co3d

    transformer_path, codebook_path = tiny_checkpoints
    job = str(tmp_path / 'job')
    result = evaluate_co3d('/nonexistent', transformer_path, codebook_path,
                           job_dir=job, categories=['apple'], progress=False)
    assert 'test_known_all' in result
    assert np.isfinite(result['test_known_all']['psnr'])
    with open(os.path.join(job, 'results-co3d.json')) as f:
        task_results = json.load(f)
    assert len(task_results['multisequence']) == 1
    assert os.path.exists(os.path.join(job, 'results.json'))


# ---------------------------------------------------------------------------
# CO3Dv2 challenge submission (evaluate/co3dv2_challenge.py)
# ---------------------------------------------------------------------------

class _FakeSubmission:
    """Stands in for co3d.challenge.co3d_submission.CO3DSubmission."""
    instances = []

    def __init__(self, task, sequence_set, output_folder, dataset_root):
        self.task, self.sequence_set = task, sequence_set
        self.dataset_root = dataset_root
        self.results = []
        _FakeSubmission.instances.append(self)

    def get_eval_batches_map(self):
        # one eval batch of 5 frames of seqA (target first, official layout)
        batch = [['seqA', fn, f'apple/images/seqA_{fn}.png'] for fn in range(5)]
        return {('apple', 'fewview_dev'): [batch]}

    def add_result(self, category, subset_name, sequence_name, frame_number,
                   image, mask, depth):
        assert image.shape[0] == 3 and mask.shape[0] == 1
        assert image.shape[1:] == mask.shape[1:] == depth.shape[1:]
        assert 0.0 <= image.min() and image.max() <= 1.0
        assert set(np.unique(mask)) <= {0.0, 1.0}
        self.results.append((category, subset_name, sequence_name, frame_number,
                             image.shape))


def _write_co3dv2_tree(root, n_frames=5, image_hw=(32, 32), depth_hw=(24, 20)):
    import gzip as _gzip

    from PIL import Image
    rng = np.random.RandomState(3)
    category = root / 'apple'
    for sub in ('images', 'masks', 'depths'):
        (category / sub).mkdir(parents=True)
    annotations = []
    for fn in range(n_frames):
        img_path = f'apple/images/seqA_{fn}.png'
        mask_path = f'apple/masks/seqA_{fn}.png'
        depth_path = f'apple/depths/seqA_{fn}.png'
        Image.fromarray(rng.randint(0, 255, image_hw + (3,), np.uint8)).save(
            root / img_path)
        mask = np.zeros(image_hw, np.uint8)
        mask[8:24, 8:24] = 255
        Image.fromarray(mask).save(root / mask_path)
        Image.fromarray(rng.randint(0, 60000, depth_hw, np.uint16),
                        mode='I;16').save(root / depth_path)
        angle = 0.2 * fn
        c, s = np.cos(angle), np.sin(angle)
        annotations.append({
            'sequence_name': 'seqA', 'frame_number': fn,
            'image': {'path': img_path}, 'mask': {'path': mask_path},
            'depth': {'path': depth_path},
            'viewpoint': {'R': [[c, -s, 0], [s, c, 0], [0, 0, 1]],
                          'T': [0.1 * fn, 0.0, 2.0]},
        })
    with _gzip.open(category / 'frame_annotations.jgz', 'wt') as f:
        json.dump(annotations, f)


@pytest.mark.slow
def test_co3dv2_challenge_with_stub(tiny_checkpoints, tmp_path, monkeypatch):
    import enum
    import types

    import jax

    from viewformer_tpu.config import VQGANConfig
    from viewformer_tpu.train.checkpoint import CheckpointManager
    from viewformer_tpu.train.codebook import (create_codebook_optimizer,
                                               init_codebook_state)

    transformer_path, _ = tiny_checkpoints
    # CO3Dv2 frames are RGBA (RGB masked + mask channel) -> 4-channel codebook
    cconfig = VQGANConfig(ch=32, ch_mult=[1, 2], num_res_blocks=1,
                          attn_resolutions=[], z_channels=32, embed_dim=8,
                          n_embed=16, image_size=32, in_channels=4, out_ch=4,
                          perceptual_weight=0.0)
    coptimizer = create_codebook_optimizer(cconfig)
    _, cstate = init_codebook_state(cconfig, jax.random.PRNGKey(2), coptimizer)
    mgr = CheckpointManager(str(tmp_path / 'codebook_rgba'), cconfig)
    mgr.save(0, cstate)
    mgr.close()
    codebook_path = str(tmp_path / 'codebook_rgba')
    _write_co3dv2_tree(tmp_path)

    class CO3DTask(enum.Enum):
        FEW_VIEW = 'few_view'

    class CO3DSequenceSet(enum.Enum):
        DEV = 'dev'
        TEST = 'test'

    mod = types.ModuleType('co3d.challenge.co3d_submission')
    mod.CO3DTask = CO3DTask
    mod.CO3DSequenceSet = CO3DSequenceSet
    mod.CO3DSubmission = _FakeSubmission
    pkg = types.ModuleType('co3d')
    chal = types.ModuleType('co3d.challenge')
    monkeypatch.setitem(sys.modules, 'co3d', pkg)
    monkeypatch.setitem(sys.modules, 'co3d.challenge', chal)
    monkeypatch.setitem(sys.modules, 'co3d.challenge.co3d_submission', mod)

    from viewformer_tpu.evaluate.co3dv2_challenge import evaluate_co3dv2_challenge
    _FakeSubmission.instances.clear()
    submission = evaluate_co3dv2_challenge(
        str(tmp_path), transformer_path, codebook_path,
        output=str(tmp_path / 'sub'), split='dev', progress=False)
    assert submission.task is CO3DTask.FEW_VIEW
    assert submission.sequence_set is CO3DSequenceSet.DEV
    assert len(submission.results) == 1
    category, subset_name, seq, fn, shape = submission.results[0]
    assert (category, subset_name, seq, fn) == ('apple', 'fewview_dev', 'seqA', 0)
    # prediction resized to the GT depth resolution
    assert shape == (3, 24, 20)
