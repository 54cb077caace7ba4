"""evaluate 7scenes-baseline: non-learned localization baselines.

Parity target: /root/reference/viewformer/evaluate/evaluate_sevenscenes_baseline.py
— mean camera (eigen quaternion average) or position/orientation-oracle
nearest-context baselines over the same retrieval contexts.
"""
import json
import os
import random
from collections import OrderedDict

import numpy as np

from ..data.loaders.sevenscenes import ALL_SCENES, SevenScenesLoader
from ..utils import geometry as np_geometry
from ..utils import metrics as M
from .sevenscenes import load_image_match_map


class LocalizationEvaluator:
    def __init__(self):
        self._metrics = [M.CameraOrientationError('loc-angle'),
                         M.CameraPositionError('loc-dist'),
                         M.CameraOrientationMedian('loc-angle-med'),
                         M.CameraPositionMedian('loc-dist-med')]

    def update_state(self, ground_truth_cameras, generated_cameras):
        for metric in self._metrics:
            metric.update_state(np.asarray(generated_cameras),
                                np.asarray(ground_truth_cameras))

    def get_progress_bar_info(self):
        return OrderedDict([
            ('cam_loc', float(next(x for x in self._metrics if x.name == 'loc-dist').result())),
            ('cam_ang', float(next(x for x in self._metrics if x.name == 'loc-angle').result()))])

    def result(self):
        return OrderedDict((m.name, float(m.result())) for m in self._metrics)


def _camera_distances(db_cameras, camera, position):
    if position:
        return np.linalg.norm(db_cameras[..., :3] - camera[..., :3], axis=-1)
    x1 = np_geometry.quaternion_normalize(db_cameras[..., 3:])
    x2 = np_geometry.quaternion_normalize(camera[..., 3:])
    diff = np_geometry.quaternion_multiply(
        x1, np.broadcast_to(np_geometry.quaternion_conjugate(x2), x1.shape))
    return 2 * np.arcsin(np.clip(np.linalg.norm(diff[..., 1:], axis=-1), 0, 1))


def generate_batch_predictions_baseline(cameras, baseline):
    ctx_cameras, gt_cameras = cameras[0, :-1], cameras[:, -1]
    if baseline == 'mean':
        xyz = ctx_cameras[..., :3].mean(0)
        quat = np_geometry.quaternion_average(ctx_cameras[..., 3:])
        pred = np.concatenate((xyz, quat), -1)
    else:
        assert baseline in ('position_oracle', 'orientation_oracle')
        idx = int(np.argmin(_camera_distances(ctx_cameras, gt_cameras,
                                              baseline == 'position_oracle')))
        pred = ctx_cameras[idx]
    return dict(ground_truth_cameras=gt_cameras, generated_cameras=pred[None])


def evaluate_sevenscenes_baseline(path, job_dir, image_match_map=None, scenes=None,
                                  num_eval_sequences=1000, top_n_matched_images=0,
                                  baseline='position_oracle', progress=True):
    """CLI entry: viewformer-cli evaluate 7scenes-baseline."""
    from tqdm import tqdm

    from ..data.loaders._wrappers import FixedSequenceSizeLoader
    from .sevenscenes import SceneLookup

    if scenes is None:
        scenes = ALL_SCENES
    if top_n_matched_images > 0:
        assert image_match_map is not None

    all_results = {}
    for scene in scenes:
        top_match_map = None
        if image_match_map is not None:
            top_match_map = load_image_match_map(image_match_map.format(scene=scene))
        scene_lookup = SceneLookup(path, scene)
        rng = random.Random(42)

        evaluator = LocalizationEvaluator()
        test_loader = FixedSequenceSizeLoader(
            SevenScenesLoader(path=path, split='test', scenes=[scene],
                              _load_file_paths=True), 1)
        indices = random.Random(42).sample(
            list(range(len(test_loader))), min(len(test_loader), num_eval_sequences))
        iterator = tqdm(indices, desc=f'evaluating {scene}') if progress else indices
        for index in iterator:
            batch = test_loader[index]
            ctx = []
            if top_match_map is not None:
                ctx = top_match_map[batch['frames_files'][0] + '.color.png'][:top_n_matched_images]
            ctx = list(ctx) + rng.sample(scene_lookup.files, 19 - len(ctx))
            ctx_cameras = np.stack([scene_lookup[x][0] for x in ctx], 0)
            cameras = np.concatenate((ctx_cameras, np.asarray(batch['cameras'])), 0)[None]
            prediction = generate_batch_predictions_baseline(cameras, baseline)
            evaluator.update_state(**prediction)
            if progress:
                iterator.set_postfix(evaluator.get_progress_bar_info())
        result = evaluator.result()
        all_results[scene] = result
        print(f'Results on {scene}:')
        for m, val in result.items():
            print(f'    {m}: ' + ('n/a' if val is None else f'{val:.6f}'))
        os.makedirs(os.path.join(job_dir, scene), exist_ok=True)
        with open(os.path.join(job_dir, scene, 'results.json'), 'w') as f:
            json.dump(result, f)
    os.makedirs(job_dir, exist_ok=True)
    with open(os.path.join(job_dir, 'results.json'), 'w') as f:
        json.dump(all_results, f)
    return all_results
