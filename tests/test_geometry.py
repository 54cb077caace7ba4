import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from viewformer_tpu.utils import geometry as g
from viewformer_tpu.utils import geometry_jax as gj


def random_quaternions(n, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(n, 4)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def to_scipy(q):
    # ours: (w, x, y, z); scipy: (x, y, z, w)
    return np.concatenate([q[..., 1:], q[..., :1]], -1)


def test_quaternion_multiply_matches_scipy():
    q1 = random_quaternions(32, 1)
    q2 = random_quaternions(32, 2)
    ours = g.quaternion_multiply(q1, q2)
    expected = (Rotation.from_quat(to_scipy(q1)) * Rotation.from_quat(to_scipy(q2))).as_quat()
    expected = np.concatenate([expected[..., 3:], expected[..., :3]], -1)
    # quaternions are sign-ambiguous
    sign = np.sign(np.sum(ours * expected, -1, keepdims=True))
    np.testing.assert_allclose(ours, expected * sign, atol=1e-10)


def test_quaternion_rotate_matches_scipy():
    q = random_quaternions(16, 3)
    pts = np.random.RandomState(4).randn(16, 3)
    ours = g.quaternion_rotate(pts, q)
    expected = Rotation.from_quat(to_scipy(q)).apply(pts)
    np.testing.assert_allclose(ours, expected, atol=1e-10)


def test_rotation_matrix_to_quaternion_roundtrip():
    q = random_quaternions(64, 5)
    R = g.quaternion_to_rotation_matrix(q)
    R_scipy = Rotation.from_quat(to_scipy(q)).as_matrix()
    np.testing.assert_allclose(R, R_scipy, atol=1e-10)
    q2 = g.rotation_matrix_to_quaternion(R)
    sign = np.sign(np.sum(q * q2, -1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-5)


def test_conjugate_inverts_rotation():
    q = random_quaternions(8, 6)
    pts = np.random.RandomState(7).randn(8, 3)
    rotated = g.quaternion_rotate(pts, q)
    back = g.quaternion_rotate(rotated, g.quaternion_conjugate(q))
    np.testing.assert_allclose(back, pts, atol=1e-9)


def test_make_quaternion_axis_angle():
    angle = np.array([0.5])
    qy = g.make_quaternion_y(angle)
    expected = Rotation.from_euler('y', 0.5).as_quat()
    expected = np.concatenate([expected[3:], expected[:3]])
    np.testing.assert_allclose(qy[0], expected, atol=1e-10)


def test_quaternion_average_of_identical_is_identity():
    q = np.tile(np.array([1.0, 0, 0, 0]), (5, 1))
    avg = g.quaternion_average(q)
    np.testing.assert_allclose(np.abs(avg), [1, 0, 0, 0], atol=1e-8)


def test_quaternion_average_small_perturbations():
    base = Rotation.from_euler('y', 0.3)
    rots = [base * Rotation.from_euler('x', eps) for eps in (-0.01, 0.0, 0.01)]
    quats = np.stack([r.as_quat() for r in rots])
    quats = np.concatenate([quats[..., 3:], quats[..., :3]], -1)
    avg = g.quaternion_average(quats)
    expected = base.as_quat()
    expected = np.concatenate([expected[3:], expected[:3]])
    sign = np.sign(np.dot(avg, expected))
    np.testing.assert_allclose(avg * sign, expected, atol=1e-3)


def test_look_at_camera_points_z_at_target():
    cam_pos = np.array([1.0, 2.0, 3.0])
    target = np.array([0.0, 0.0, 0.0])
    up = np.array([0.0, 1.0, 0.0])
    cam = g.look_at_to_cameras(cam_pos, target, up)
    np.testing.assert_allclose(cam[:3], cam_pos)
    q = cam[3:]
    R = g.quaternion_to_rotation_matrix(q)
    z_axis = R[:, 2]
    direction = (target - cam_pos) / np.linalg.norm(target - cam_pos)
    np.testing.assert_allclose(z_axis, direction, atol=1e-6)


@pytest.mark.parametrize('fn,args', [
    ('quaternion_multiply', (random_quaternions(4, 1), random_quaternions(4, 2))),
    ('quaternion_conjugate', (random_quaternions(4, 3),)),
    ('quaternion_normalize', (np.random.RandomState(0).randn(4, 4),)),
    ('quaternion_remove_sign', (random_quaternions(4, 4),)),
    ('quaternion_rotate', (np.random.RandomState(1).randn(4, 3), random_quaternions(4, 5))),
    ('quaternion_to_euler', (random_quaternions(4, 6),)),
    ('quaternion_to_rotation_matrix', (random_quaternions(4, 7),)),
    ('rotation_matrix_to_quaternion', (Rotation.random(4, rng=0).as_matrix(),)),
])
def test_jax_twin_matches_numpy(fn, args):
    np_result = getattr(g, fn)(*args)
    jax_result = np.asarray(getattr(gj, fn)(*[a.astype(np.float32) for a in args]))
    np.testing.assert_allclose(jax_result, np_result, atol=1e-4)
