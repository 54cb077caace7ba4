"""dataset visualize: sequence browser with pose scatter.

Parity target: /root/reference/viewformer/data/commands/visualize.py +
utils/visualization.py (keyboard-navigated matplotlib browser). Adds a
headless mode writing per-sequence contact sheets when no display exists.
"""
import os

import numpy as np


def visualize_dataset(loader, output=None, max_sequences=4):
    import matplotlib
    if output is None and os.environ.get('DISPLAY'):
        # interactive keyboard-navigated browser (ref utils/visualization.py)
        from ..utils.visualization import (InteractiveViewer,
                                           render_sequence_with_poses)
        return InteractiveViewer(loader, render_sequence_with_poses,
                                 title='dataset').show()
    matplotlib.use('Agg')
    output = output or 'dataset_preview.png'
    import matplotlib.pyplot as plt

    n = min(len(loader), max_sequences)
    fig, axes = plt.subplots(n, 2, figsize=(10, 4 * n), squeeze=False)
    for i in range(n):
        item = loader[i]
        frames = np.asarray(item['frames'])
        cameras = np.asarray(item['cameras'])
        from .visualize_codebook import make_grid
        axes[i][0].imshow(make_grid(frames[:8], columns=4))
        axes[i][0].set_title(f'sequence {i}')
        axes[i][0].axis('off')
        axes[i][1].scatter(cameras[:, 0], cameras[:, 2], c=range(len(cameras)))
        axes[i][1].set_title('camera positions (x, z)')
    fig.tight_layout()
    if output is not None:
        fig.savefig(output, dpi=100)
        print(f'Wrote dataset preview to {output}')
        return output
    plt.show()
