"""Training metric logging: console + JSONL + optional TensorBoard + wandb.

Parity targets: the reference's TensorBoard scalar/image logging and hparams
recording (/root/reference/viewformer/train/utils.py:96-142,
train/logging_utils_th.py). JSONL is the always-on machine-readable log; the
TensorBoard and wandb sinks attach when their packages are importable."""
import json
import os
import time

import numpy as np


class MetricLogger:
    def __init__(self, job_dir, hparams=None, use_tensorboard=True, use_wandb=False):
        self.job_dir = job_dir
        os.makedirs(job_dir, exist_ok=True)
        self._jsonl = open(os.path.join(job_dir, 'metrics.jsonl'), 'a')
        self._tb = None
        self._wandb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=job_dir)
            except Exception:
                self._tb = None
        if use_wandb:
            try:
                import wandb
                wandb.init(config=hparams or {}, resume='allow', dir=job_dir)
                self._wandb = wandb
            except Exception:
                self._wandb = None
        if hparams and self._tb is not None:
            try:
                self._tb.add_text('hparams', json.dumps(hparams, default=str, indent=2), 0)
            except Exception:
                pass
        self._start = time.time()

    def log(self, step, metrics, prefix='train'):
        record = {'step': int(step), 'time': round(time.time() - self._start, 3)}
        for k, v in metrics.items():
            try:
                record[f'{prefix}/{k}'] = float(np.asarray(v))
            except (TypeError, ValueError):
                continue
        self._jsonl.write(json.dumps(record) + '\n')
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in record.items():
                if k not in ('step', 'time'):
                    self._tb.add_scalar(k, v, int(step))
        if self._wandb is not None:
            self._wandb.log(record, step=int(step))

    def log_images(self, step, images, tag='images'):
        """images: uint8 [N, H, W, C] grid-logged to TensorBoard."""
        if self._tb is None:
            return
        images = np.asarray(images)
        for i, img in enumerate(images[:8]):
            self._tb.add_image(f'{tag}/{i}', img, int(step), dataformats='HWC')

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
