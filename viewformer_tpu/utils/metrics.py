"""Image + camera metrics: functional jax kernels and streaming host accumulators.

Parity target: /root/reference/viewformer/utils/metrics.py — PSNR, the
scikit-image-port SSIM (win_size=7, sample covariance), camera position error
(L2) and orientation error (2*asin|Δq_vec|), streaming mean and median.

Functional kernels are jittable; the streaming accumulators (Mean/Median) are
host-side numpy, used by the evaluation drivers.
"""
import numpy as np
import jax
import jax.numpy as jnp

from . import geometry_jax as geometry


# ---------------------------------------------------------------------------
# Functional jax metrics
# ---------------------------------------------------------------------------

def psnr(gt_images, images, max_val=1.0):
    """PSNR over [..., H, W, C] float images in [0, max_val]; returns [...]."""
    gt_images = jnp.asarray(gt_images, jnp.float32)
    images = jnp.asarray(images, jnp.float32)
    mse = jnp.mean((gt_images - images) ** 2, axis=(-3, -2, -1))
    return 10.0 * jnp.log10((max_val ** 2) / mse)


def _uniform_filter(x, win_size):
    """Depthwise VALID uniform filter over [N, H, W, C]."""
    c = x.shape[-1]
    kernel = jnp.full((win_size, win_size, 1, c), 1.0 / win_size ** 2, x.dtype)
    # Precision.HIGHEST: metric fidelity matters more than filter speed, and
    # the default conv path may downcast accumulations (bf16-class error).
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'), feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)


def ssim(X, Y, K1=0.01, K2=0.03, win_size=7, data_range=1.0,
         use_sample_covariance=True):
    """Structural similarity over [..., H, W, C]; scikit-image algorithm
    (ref utils/metrics.py:17-72). Returns [...]."""
    X = jnp.asarray(X, jnp.float32)
    Y = jnp.asarray(Y, jnp.float32)
    batch_shape = X.shape[:-3]
    Xf = X.reshape((-1,) + X.shape[-3:])
    Yf = Y.reshape((-1,) + Y.shape[-3:])

    NP = win_size ** 2
    cov_norm = NP / (NP - 1) if use_sample_covariance else 1.0

    ux = _uniform_filter(Xf, win_size)
    uy = _uniform_filter(Yf, win_size)
    uxx = _uniform_filter(Xf * Xf, win_size)
    uyy = _uniform_filter(Yf * Yf, win_size)
    uxy = _uniform_filter(Xf * Yf, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    A1, A2 = 2 * ux * uy + C1, 2 * vxy + C2
    B1, B2 = ux ** 2 + uy ** 2 + C1, vx + vy + C2
    S = (A1 * A2) / (B1 * B2)
    return jnp.mean(S, axis=(-3, -2, -1)).reshape(batch_shape)


def image_rmse(gt_images, images):
    """RMSE in 0..255 scale over [..., H, W, C] (ref ImageRMSE)."""
    gt = jnp.asarray(gt_images, jnp.float32) * 255.0
    im = jnp.asarray(images, jnp.float32) * 255.0
    return jnp.sqrt(jnp.mean((gt - im) ** 2, axis=(-3, -2, -1)))


def camera_position_error(x1, x2):
    """L2 distance between camera positions of 7-d poses; returns [...]."""
    return jnp.linalg.norm(x1[..., :3] - x2[..., :3], axis=-1)


def camera_orientation_error(x1, x2):
    """Angle between quaternion parts via 2*asin|vec(q1 q2*)| — the
    sin form is stable near zero rotation (ref utils/metrics.py:98-110)."""
    q1 = geometry.quaternion_normalize(x1[..., 3:])
    q2 = geometry.quaternion_normalize(x2[..., 3:])
    diff = geometry.quaternion_multiply(q1, geometry.quaternion_conjugate(q2))
    return 2.0 * jnp.arcsin(jnp.clip(jnp.linalg.norm(diff[..., 1:], axis=-1), 0.0, 1.0))


# ---------------------------------------------------------------------------
# Streaming host-side accumulators (evaluation drivers)
# ---------------------------------------------------------------------------

class Mean:
    def __init__(self, name, allow_nan=False):
        self.name = name
        self.allow_nan = allow_nan
        self.reset_states()

    def reset_states(self):
        self._total = 0.0
        self._count = 0.0

    def update_state(self, values, sample_weight=None):
        values = np.asarray(jax.device_get(values), np.float64).reshape(-1)
        if sample_weight is None:
            sample_weight = np.ones_like(values)
        else:
            sample_weight = np.asarray(sample_weight, np.float64).reshape(-1) * np.ones_like(values)
        if self.allow_nan:
            nan = np.isnan(values)
            values = np.where(nan, 0.0, values)
            sample_weight = sample_weight * (1.0 - nan.astype(np.float64))
        self._total += float((values * sample_weight).sum())
        self._count += float(sample_weight.sum())

    def result(self):
        if self._count == 0:
            return 0.0
        return self._total / self._count


class Median:
    def __init__(self, name):
        self.name = name
        self.reset_states()

    def reset_states(self):
        self._store = []

    def update_state(self, values):
        self._store.append(np.asarray(jax.device_get(values), np.float64).reshape(-1))

    def result(self):
        if not self._store:
            return 0.0
        vals = np.sort(np.concatenate(self._store))
        n = len(vals)
        if n % 2 == 1:
            return float(vals[(n - 1) // 2])
        return float(0.5 * (vals[n // 2 - 1] + vals[n // 2]))


class CameraPositionError(Mean):
    def __init__(self, name='pose_pos_err', **kwargs):
        super().__init__(name, **kwargs)

    def update_state(self, x1, x2):
        super().update_state(camera_position_error(jnp.asarray(x1), jnp.asarray(x2)))


class CameraOrientationError(Mean):
    def __init__(self, name='pose_ori_err', **kwargs):
        super().__init__(name, **kwargs)

    def update_state(self, x1, x2):
        super().update_state(camera_orientation_error(jnp.asarray(x1), jnp.asarray(x2)))


class CameraPositionMedian(Median):
    def __init__(self, name='pose_pos_median'):
        super().__init__(name)

    def update_state(self, x1, x2):
        super().update_state(camera_position_error(jnp.asarray(x1), jnp.asarray(x2)))


class CameraOrientationMedian(Median):
    def __init__(self, name='pose_ori_median'):
        super().__init__(name)

    def update_state(self, x1, x2):
        super().update_state(camera_orientation_error(jnp.asarray(x1), jnp.asarray(x2)))


class PSNRMetric(Mean):
    def __init__(self, name='psnr', **kwargs):
        super().__init__(name, **kwargs)

    def update_state(self, gt_images, images):
        super().update_state(psnr(_to_float(gt_images), _to_float(images)))


class SSIMMetric(Mean):
    def __init__(self, name='ssim', **kwargs):
        super().__init__(name, **kwargs)

    def update_state(self, gt_images, images):
        super().update_state(ssim(_to_float(gt_images), _to_float(images)))


class ImageRMSE(Mean):
    def __init__(self, name='rmse', **kwargs):
        super().__init__(name, **kwargs)

    def update_state(self, gt_images, images):
        super().update_state(image_rmse(_to_float(gt_images), _to_float(images)))


class MeanSquaredError(Mean):
    def __init__(self, name='mse', **kwargs):
        super().__init__(name, **kwargs)

    def update_state(self, gt_images, images):
        gt, im = _to_float(gt_images), _to_float(images)
        super().update_state(jnp.mean((jnp.asarray(gt) - jnp.asarray(im)) ** 2, axis=(-3, -2, -1)))


class MeanAbsoluteError(Mean):
    def __init__(self, name='mae', **kwargs):
        super().__init__(name, **kwargs)

    def update_state(self, gt_images, images):
        gt, im = _to_float(gt_images), _to_float(images)
        super().update_state(jnp.mean(jnp.abs(jnp.asarray(gt) - jnp.asarray(im)), axis=(-3, -2, -1)))


class LPIPSMetric(Mean):
    """LPIPS(VGG) metric; requires the jax LPIPS port (models.lpips).

    Falls back to NaN-free zeros when LPIPS weights are unavailable (no
    network egress); `available` reports whether real values are produced."""

    def __init__(self, net='vgg', name=None):
        super().__init__(name or f'lpips-{net}')
        from ..models.lpips import load_lpips
        self._lpips = load_lpips(net)
        self.available = self._lpips is not None

    def update_state(self, gt_images, images):
        if self._lpips is None:
            return
        gt = jnp.asarray(_to_float(gt_images), jnp.float32) * 2 - 1
        im = jnp.asarray(_to_float(images), jnp.float32) * 2 - 1
        super().update_state(self._lpips(gt, im))


def _to_float(images):
    """uint8 [0,255] -> float [0,1]; float dtypes pass through
    (tf.image.convert_image_dtype semantics)."""
    images = np.asarray(jax.device_get(images)) if not isinstance(images, jnp.ndarray) else images
    arr = jnp.asarray(images)
    if arr.dtype == jnp.uint8:
        return arr.astype(jnp.float32) / 255.0
    return arr.astype(jnp.float32)
