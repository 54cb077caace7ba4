"""Quaternion / camera-pose geometry, numpy and jax twins from one implementation.

Semantics match the reference implementation
(/root/reference/viewformer/utils/geometry.py and geometry_tf.py):
quaternions use (w, x, y, z) order; cameras are 7-vectors (x, y, z, qw, qx, qy, qz).

The same closed-form math is generated once for any array namespace (numpy or
jax.numpy) — both backends share one code path, so the numpy version used by
dataset loaders and the jitted jax version used inside models cannot drift.
"""
import math
from types import SimpleNamespace

import numpy as np


def _make_geometry(xp):
    g = SimpleNamespace()

    def safe_unsigned_div(a, b, eps=None):
        if eps is None:
            eps = 10.0 * float(np.finfo(np.asarray(b).dtype if xp is np else np.float32).tiny)
        return a / (b + eps)

    def rotation_matrix_to_quaternion(rotation_matrix):
        """Rotation matrix [..., 3, 3] -> normalized quaternion [..., 4] (w,x,y,z).

        Branch-free 4-case selection (ref geometry.py:28-91)."""
        rotation_matrix = xp.asarray(rotation_matrix)
        trace = xp.trace(rotation_matrix, axis1=-2, axis2=-1)
        eps_addition = 2.0 * float(np.finfo(np.float32).eps)
        e = [[rotation_matrix[..., i, j] for j in range(3)] for i in range(3)]

        sq0 = xp.sqrt(xp.maximum(trace + 1.0, eps_addition)) * 2.0
        tr_positive = xp.stack((0.25 * sq0,
                                safe_unsigned_div(e[2][1] - e[1][2], sq0),
                                safe_unsigned_div(e[0][2] - e[2][0], sq0),
                                safe_unsigned_div(e[1][0] - e[0][1], sq0)), -1)

        sq1 = xp.sqrt(xp.maximum(1.0 + e[0][0] - e[1][1] - e[2][2], 0.0) + eps_addition) * 2.0
        cond_1 = xp.stack((safe_unsigned_div(e[2][1] - e[1][2], sq1),
                           0.25 * sq1,
                           safe_unsigned_div(e[0][1] + e[1][0], sq1),
                           safe_unsigned_div(e[0][2] + e[2][0], sq1)), -1)

        sq2 = xp.sqrt(xp.maximum(1.0 + e[1][1] - e[0][0] - e[2][2], 0.0) + eps_addition) * 2.0
        cond_2 = xp.stack((safe_unsigned_div(e[0][2] - e[2][0], sq2),
                           safe_unsigned_div(e[0][1] + e[1][0], sq2),
                           0.25 * sq2,
                           safe_unsigned_div(e[1][2] + e[2][1], sq2)), -1)

        sq3 = xp.sqrt(xp.maximum(1.0 + e[2][2] - e[0][0] - e[1][1], 0.0) + eps_addition) * 2.0
        cond_3 = xp.stack((safe_unsigned_div(e[1][0] - e[0][1], sq3),
                           safe_unsigned_div(e[0][2] + e[2][0], sq3),
                           safe_unsigned_div(e[1][2] + e[2][1], sq3),
                           0.25 * sq3), -1)

        def cond_idx(cond):
            return xp.broadcast_to(cond[..., None], cond.shape + (4,))

        where_2 = xp.where(cond_idx(e[1][1] > e[2][2]), cond_2, cond_3)
        where_1 = xp.where(cond_idx((e[0][0] > e[1][1]) & (e[0][0] > e[2][2])), cond_1, where_2)
        return xp.where(cond_idx(trace > 0), tr_positive, where_1)

    def quaternion_multiply(q1, q2):
        w1, x1, y1, z1 = (q1[..., i] for i in range(4))
        w2, x2, y2, z2 = (q2[..., i] for i in range(4))
        x = x1 * w2 + y1 * z2 - z1 * y2 + w1 * x2
        y = -x1 * z2 + y1 * w2 + z1 * x2 + w1 * y2
        z = x1 * y2 - y1 * x2 + z1 * w2 + w1 * z2
        w = -x1 * x2 - y1 * y2 - z1 * z2 + w1 * w2
        return xp.stack((w, x, y, z), -1)

    def l2_normalize(x, axis=-1, epsilon=1e-12):
        return x / xp.sqrt(xp.maximum((x ** 2).sum(axis=axis, keepdims=True), epsilon))

    def quaternion_normalize(x, epsilon=1e-12):
        return l2_normalize(x, axis=-1, epsilon=epsilon)

    def quaternion_remove_sign(x):
        sign = 2 * (x[..., :1] >= 0).astype(x.dtype) - 1
        return x * sign

    def quaternion_conjugate(q):
        return xp.concatenate((q[..., :1], -q[..., 1:]), axis=-1)

    def quaternion_rotate(point, quaternion):
        point = xp.concatenate([xp.zeros_like(point[..., :1]), point], -1)
        point = quaternion_multiply(quaternion, point)
        point = quaternion_multiply(point, quaternion_conjugate(quaternion))
        return point[..., 1:]

    def make_quaternion(axis, angle):
        w = xp.cos(angle / 2)[..., None]
        xyz = xp.sin(angle / 2)[..., None] * axis
        return xp.concatenate([w, xyz], -1)

    def make_quaternion_y(angle):
        angle = xp.asarray(angle)
        return make_quaternion(xp.asarray([0.0, 1.0, 0.0], dtype=angle.dtype), angle)

    def make_quaternion_x(angle):
        angle = xp.asarray(angle)
        return make_quaternion(xp.asarray([1.0, 0.0, 0.0], dtype=angle.dtype), angle)

    def quaternion_to_euler(quaternion):
        w, x, y, z = (quaternion[..., i] for i in range(4))
        sinr_cosp = 2 * (w * z + x * y)
        cosr_cosp = 1 - 2 * (z * z + x * x)
        roll = xp.arctan2(sinr_cosp, cosr_cosp)
        sinp = 2 * (w * x - y * z)
        pitch = xp.where(xp.abs(sinp) >= 1, math.pi / 2 * xp.sign(sinp), xp.arcsin(xp.clip(sinp, -1, 1)))
        siny_cosp = 2 * (w * y + z * x)
        cosy_cosp = 1 - 2 * (x * x + y * y)
        yaw = xp.arctan2(siny_cosp, cosy_cosp)
        return xp.stack([pitch, yaw, roll], -1)

    def quaternion_to_rotation_matrix(quaternion):
        w, x, y, z = (quaternion[..., i] for i in range(4))
        tx, ty, tz = 2.0 * x, 2.0 * y, 2.0 * z
        twx, twy, twz = tx * w, ty * w, tz * w
        txx, txy, txz = tx * x, ty * x, tz * x
        tyy, tyz, tzz = ty * y, tz * y, tz * z
        m = xp.stack((1.0 - (tyy + tzz), txy - twz, txz + twy,
                      txy + twz, 1.0 - (txx + tzz), tyz - twx,
                      txz - twy, tyz + twx, 1.0 - (txx + tyy)), axis=-1)
        return m.reshape(quaternion.shape[:-1] + (3, 3))

    def look_at_to_cameras(camera_position, look_at, up_vector):
        """look-at -> camera 7-vector; z faces away from camera, y down, x right
        (ref geometry.py:213-225)."""
        z_axis = l2_normalize(look_at - camera_position)
        x_axis = l2_normalize(xp.cross(z_axis, up_vector))
        y_axis = xp.cross(z_axis, x_axis)
        R = xp.stack([y_axis, -x_axis, z_axis], -1)
        quaternion = quaternion_normalize(rotation_matrix_to_quaternion(R))
        return xp.concatenate((camera_position, quaternion), -1)

    def cameras_to_pose_euler(pose):
        xyz, quaternion = pose[..., :3], pose[..., 3:]
        return xp.concatenate((xyz, quaternion_to_euler(quaternion)), -1)

    def quaternion_average(quaternion, axis=-2):
        """Eigenvector quaternion mean (ref geometry.py:274-281; NASA TR-20070017872).

        Uses eigh (M is symmetric PSD) rather than the reference's eig —
        identical principal eigenvector, stable and jit-friendly."""
        quaternion = quaternion_remove_sign(quaternion)
        M = quaternion[..., None, :] * quaternion[..., :, None]
        M = M.mean(axis - 1 if axis < 0 else axis)
        eig_val, eig_vec = xp.linalg.eigh(M)
        # eigh returns ascending eigenvalues; principal eigenvector is last column
        return eig_vec[..., :, -1]

    g.safe_unsigned_div = safe_unsigned_div
    g.rotation_matrix_to_quaternion = rotation_matrix_to_quaternion
    g.quaternion_multiply = quaternion_multiply
    g.l2_normalize = l2_normalize
    g.quaternion_normalize = quaternion_normalize
    g.quaternion_remove_sign = quaternion_remove_sign
    g.quaternion_conjugate = quaternion_conjugate
    g.quaternion_rotate = quaternion_rotate
    g.make_quaternion = make_quaternion
    g.make_quaternion_y = make_quaternion_y
    g.make_quaternion_x = make_quaternion_x
    g.quaternion_to_euler = quaternion_to_euler
    g.quaternion_to_rotation_matrix = quaternion_to_rotation_matrix
    g.look_at_to_cameras = look_at_to_cameras
    g.cameras_to_pose_euler = cameras_to_pose_euler
    g.quaternion_average = quaternion_average
    return g


_np_geometry = _make_geometry(np)

safe_unsigned_div = _np_geometry.safe_unsigned_div
rotation_matrix_to_quaternion = _np_geometry.rotation_matrix_to_quaternion
quaternion_multiply = _np_geometry.quaternion_multiply
l2_normalize = _np_geometry.l2_normalize
quaternion_normalize = _np_geometry.quaternion_normalize
quaternion_remove_sign = _np_geometry.quaternion_remove_sign
quaternion_conjugate = _np_geometry.quaternion_conjugate
quaternion_rotate = _np_geometry.quaternion_rotate
make_quaternion = _np_geometry.make_quaternion
make_quaternion_y = _np_geometry.make_quaternion_y
make_quaternion_x = _np_geometry.make_quaternion_x
quaternion_to_euler = _np_geometry.quaternion_to_euler
quaternion_to_rotation_matrix = _np_geometry.quaternion_to_rotation_matrix
look_at_to_cameras = _np_geometry.look_at_to_cameras
cameras_to_pose_euler = _np_geometry.cameras_to_pose_euler
quaternion_average = _np_geometry.quaternion_average
