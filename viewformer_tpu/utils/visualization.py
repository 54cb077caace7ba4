"""Interactive matplotlib browser framework.

Parity target: /root/reference/viewformer/utils/visualization.py — a small
keyboard-navigated viewer framework shared by `dataset visualize`
(sequences + pose scatter) and `visualize codebook` (reconstruction pairs).
Left/right arrows (or j/k) page through items; 'q' closes. Headless
environments fall back to writing numbered PNGs (see commands/visualize*).
"""
import numpy as np


class InteractiveViewer:
    """Pages a render callback over an indexable dataset.

    render(fig, axes, item, index) draws one item; the framework owns the
    figure, key bindings, and index state."""

    def __init__(self, dataset, render, rows=1, cols=2, title=None):
        self.dataset = dataset
        self.render = render
        self.rows = rows
        self.cols = cols
        self.title = title
        self.index = 0

    def _draw(self):
        for ax in np.asarray(self.axes).ravel():
            ax.clear()
        item = self.dataset[self.index]
        self.render(self.fig, self.axes, item, self.index)
        suffix = f' [{self.index + 1}/{len(self.dataset)}]'
        self.fig.suptitle((self.title or '') + suffix)
        self.fig.canvas.draw_idle()

    def _on_key(self, event):
        if event.key in ('right', 'k', 'n'):
            self.index = (self.index + 1) % len(self.dataset)
        elif event.key in ('left', 'j', 'p'):
            self.index = (self.index - 1) % len(self.dataset)
        elif event.key == 'q':
            import matplotlib.pyplot as plt
            plt.close(self.fig)
            return
        else:
            return
        self._draw()

    def show(self):
        import matplotlib.pyplot as plt
        self.fig, self.axes = plt.subplots(self.rows, self.cols,
                                           figsize=(5 * self.cols, 5 * self.rows),
                                           squeeze=False)
        self.fig.canvas.mpl_connect('key_press_event', self._on_key)
        self._draw()
        plt.show()
        return self


def render_sequence_with_poses(fig, axes, item, index):
    """Render callback: frame grid + camera pose scatter (the `dataset
    visualize` view, ref data/commands/visualize.py)."""
    from ..commands.visualize_codebook import make_grid
    frames = np.asarray(item['frames'])
    cameras = np.asarray(item['cameras'])
    axes[0][0].imshow(make_grid(frames[:16], columns=4))
    axes[0][0].set_title('frames')
    axes[0][0].axis('off')
    scatter = axes[0][1].scatter(cameras[:, 0], cameras[:, 2], c=range(len(cameras)))
    axes[0][1].set_title('camera positions (x, z)')
    axes[0][1].set_aspect('equal', adjustable='datalim')
    return scatter


def render_reconstruction_pair(reconstruct):
    """Render-callback factory: original vs codebook reconstruction (the
    `visualize codebook` view, ref commands/visualize_codebook.py)."""
    def render(fig, axes, item, index):
        frames = np.asarray(item['frames'])[:1]
        recon = reconstruct(frames)
        axes[0][0].imshow(frames[0])
        axes[0][0].set_title('original')
        axes[0][0].axis('off')
        axes[0][1].imshow(np.asarray(recon)[0])
        axes[0][1].set_title('reconstruction')
        axes[0][1].axis('off')
    return render
