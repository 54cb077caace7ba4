"""evaluate co3d: wraps the official CO3D NVS evaluation harness.

Parity target: /root/reference/viewformer/evaluate/evaluate_co3d.py — runs the
official eval_batch / summarize_nvs_eval_results from the pinned
facebookresearch/co3d code over our model's predictions, so numbers are
directly comparable to the CO3D paper tables. Requires torch + pytorch3d +
the cached co3d repo (see data/loaders/co3d.py).
"""
import copy
import json
import os

import numpy as np

from ..data.loaders.co3d import CO3DLoader, _co3d_code
from .transformer import generate_batch_predictions


def evaluate_co3d(path, transformer_checkpoint, codebook_checkpoint, job_dir='.',
                  categories=None, single_sequence_evaluation=False, num_workers=16,
                  progress=True):
    """single_sequence_evaluation/num_workers are accepted-and-unused like
    the reference's: its `task` is hardcoded to "multisequence" at BOTH
    levels (ref evaluate_co3d.py:100,157), so the singlesequence branches
    (all_source_cameras via num_workers, sequence-id loop) are dead code
    there too; the flags exist only for CLI-surface parity."""
    import torch
    from tqdm import tqdm

    from ..models import load_model

    transformer_model, transformer_vars = load_model(transformer_checkpoint)
    codebook_model, codebook_vars = load_model(codebook_checkpoint)

    _loader = CO3DLoader(path=path, split='test', mask_images=True)
    with _co3d_code():
        from dataset.dataset_zoo import CO3D_CATEGORIES, dataset_zoo
        from dataset.dataloader_zoo import dataloader_zoo
        from eval_demo import _print_aggregate_results, aggregate_nvs_results
        from evaluation.evaluate_new_view_synthesis import (
            NewViewSynthesisPrediction, eval_batch, pretty_print_nvs_metrics,
            summarize_nvs_eval_results)

        def generate_predictions(frame_data):
            images = _loader._process_rgb_image(frame_data).permute(0, 2, 3, 1).numpy()
            images = (images * 255.0).astype(np.uint8)
            matrices = frame_data.camera.get_world_to_view_transform().get_matrix() \
                .permute(0, 2, 1).numpy()
            cameras = _loader.world_to_camera_to_cameras(matrices)
            # CO3D batches put the target first; our predict expects it last
            images = np.concatenate((images[1:], images[:1]), 0)[None]
            cameras = np.concatenate((cameras[1:], cameras[:1]), 0)[None]
            preds = generate_batch_predictions(transformer_model, transformer_vars,
                                               codebook_model, codebook_vars,
                                               images, cameras)
            predicted = torch.from_numpy(
                preds['generated_images'].astype(np.float32)).permute(0, 3, 1, 2) / 255.0
            return NewViewSynthesisPrediction(
                image_render=predicted,
                mask_render=torch.ones((1, 1) + predicted.shape[-2:], dtype=torch.float32),
                depth_render=torch.zeros((1, 1) + predicted.shape[-2:], dtype=torch.float32))

        def evaluate_for_category(category, bg_color='black', single_sequence_id=None):
            task = 'multisequence'
            torch.manual_seed(42)
            datasets = dataset_zoo(dataset_root=path, category=category,
                                   assert_single_seq=False,
                                   dataset_name=f'co3d_{task}', test_on_train=False,
                                   load_point_clouds=True,
                                   test_restrict_sequence_id=single_sequence_id)
            dataloaders = dataloader_zoo(datasets, dataset_name=f'co3d_{task}')
            test_dataloader = dataloaders['test']

            import lpips as lpips_pkg
            lpips_model = lpips_pkg.LPIPS(net='vgg')
            if torch.cuda.is_available():
                lpips_model = lpips_model.cuda()

            per_batch_eval_results = []
            iterator = tqdm(test_dataloader) if progress else test_dataloader
            for frame_data in iterator:
                preds = generate_predictions(frame_data)
                per_batch_eval_results.append(eval_batch(
                    frame_data, copy.deepcopy(preds), bg_color=bg_color,
                    lpips_model=lpips_model, source_cameras=None))
            _flat, category_result = summarize_nvs_eval_results(per_batch_eval_results, task)
            return category_result['results']

        task = 'multisequence'
        task_results = {task: []}
        if categories is None:
            categories = CO3D_CATEGORIES[:10]
        for category in categories:
            category_result = evaluate_for_category(category)
            print(f'\nResults for task={task}; category={category}:')
            pretty_print_nvs_metrics(category_result)
            task_results[task].append(category_result)
            _print_aggregate_results(task, task_results)

        os.makedirs(job_dir, exist_ok=True)
        with open(os.path.join(job_dir, 'results-co3d.json'), 'w') as f:
            json.dump(task_results, f)
        mp = {f"{x['subset']}_{x['subsubset']}": x['metrics']
              for x in aggregate_nvs_results(task_results[task])}
        with open(os.path.join(job_dir, 'results.json'), 'w') as f:
            json.dump(mp, f)
        return mp
