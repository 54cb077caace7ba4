"""JAX twin of viewformer_tpu.utils.geometry — same math, jit/grad-compatible.

Counterpart of the reference's tf graph geometry (geometry_tf.py), generated
from the identical shared implementation so numpy/jax results cannot drift.
"""
import jax.numpy as jnp

from .geometry import _make_geometry

_jax_geometry = _make_geometry(jnp)

safe_unsigned_div = _jax_geometry.safe_unsigned_div
rotation_matrix_to_quaternion = _jax_geometry.rotation_matrix_to_quaternion
quaternion_multiply = _jax_geometry.quaternion_multiply
l2_normalize = _jax_geometry.l2_normalize
quaternion_normalize = _jax_geometry.quaternion_normalize
quaternion_remove_sign = _jax_geometry.quaternion_remove_sign
quaternion_conjugate = _jax_geometry.quaternion_conjugate
quaternion_rotate = _jax_geometry.quaternion_rotate
make_quaternion = _jax_geometry.make_quaternion
make_quaternion_y = _jax_geometry.make_quaternion_y
make_quaternion_x = _jax_geometry.make_quaternion_x
quaternion_to_euler = _jax_geometry.quaternion_to_euler
quaternion_to_rotation_matrix = _jax_geometry.quaternion_to_rotation_matrix
look_at_to_cameras = _jax_geometry.look_at_to_cameras
cameras_to_pose_euler = _jax_geometry.cameras_to_pose_euler
quaternion_average = _jax_geometry.quaternion_average
