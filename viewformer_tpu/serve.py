"""Serving sessions: KV-cached chained novel-view synthesis.

The reference has no serving entry point — its only chained-generation mode
re-runs the full transformer over the whole growing sequence for every new
frame (ref evaluate_transformer_multictx_allimg.py:146-171, keep_last_frame).
This module turns the TPU-native incremental path
(models/migt_incremental.py) into a user-facing API and CLI command
(`viewformer-cli serve`): a ServingSession keeps per-layer K/V on device;
starting a session costs one batched block-causal prefill over the context
frames, each observed frame costs one 64-token context pass, and each
rendered view costs one 64-token query-branch pass plus the codebook
decoder — O(T) per frame instead of the reference's O(T^2) per chain.

Semantics match the one-shot evaluation path exactly (tested): the relative
camera canonicalization (ref evaluate_transformer.py:70-94) is anchored to
the FIRST context camera at `start` and the stored transform is applied to
every subsequently observed/queried camera, which is what one one-shot pass
over [context..., query] would compute. Both capabilities are served:
`render` (view synthesis, generation branch) and `localize` (camera pose
regression — one localization-branch pass over the cached context via
models/migt_incremental.localize_frame, equivalence vs the one-shot eval
path pinned in test_serve/test_migt_incremental).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .models import migt_incremental as inc
from .ops.image import resize
from .utils import geometry_jax as geometry

_IDENTITY_CAMERA = np.asarray([0., 0., 0., 1., 0., 0., 0.], np.float32)


def _relative_to(cameras, transform):
    """Express `cameras` [..., 7] in the frame of `transform` [B, 7] —
    the single-camera form of evaluate.transformer.to_relative_cameras."""
    while transform.ndim < cameras.ndim:
        transform = transform[..., None, :]
    t_xyz, t_q = transform[..., :3], transform[..., 3:]
    rot_inv = geometry.quaternion_conjugate(t_q)
    xyz = cameras[..., :3] - t_xyz
    xyz = geometry.quaternion_rotate(
        xyz, jnp.broadcast_to(rot_inv, xyz.shape[:-1] + (4,)))
    quaternion = geometry.quaternion_multiply(
        jnp.broadcast_to(rot_inv, xyz.shape[:-1] + (4,)), cameras[..., 3:])
    return jnp.concatenate((xyz, quaternion), -1)


def _normalize(cameras):
    xyz, quaternion = cameras[..., :3], cameras[..., 3:]
    quaternion = geometry.quaternion_remove_sign(
        geometry.quaternion_normalize(quaternion))
    return jnp.concatenate((xyz, quaternion), -1)


def _round_up(n, m):
    return ((n + m - 1) // m) * m


class ServingSession:
    """A stateful novel-view-synthesis serving session over one device.

    Holds the transformer K/V cache for `batch_size` independent scenes.
    All device programs are jitted once with variables passed as arguments
    (never closure captures — see CLAUDE.md); numpy in / numpy out.

    Parameters
    ----------
    max_frames: context capacity (cache frames). Defaults to the model's
        training context length (sequence_size - 1) but MAY exceed it: the
        positional embedding is per-token within a frame, so nothing in the
        architecture pins the context count — quality beyond the trained
        length is a model property, capacity is not an architectural limit.
    cache_dtype: K/V cache dtype; defaults to the transformer param dtype
        (pass jnp.bfloat16 for serving; accumulations stay f32 inside the
        attention via preferred_element_type).
    mesh: shard the scene batch over the mesh's data axis — every program
        (prefill/observe/render/localize) is batch-parallel, so a session
        serving N scenes runs SPMD across all local chips.
    """

    def __init__(self, transformer_model, transformer_vars, codebook_model,
                 codebook_vars, batch_size=1, max_frames=None, cache_dtype=None,
                 mesh=None):
        self._tmodel = transformer_model
        self._cmodel = codebook_model
        self._tparams = transformer_vars['params']
        self._cvars = {'params': codebook_vars['params'],
                       'quantizer': codebook_vars['quantizer']}
        self._mesh = mesh
        if mesh is not None:
            from .parallel import mesh as mesh_lib
            assert batch_size % mesh.shape['data'] == 0, \
                f'batch {batch_size} not divisible by data axis {mesh.shape["data"]}'
            self._tparams = mesh_lib.replicate(mesh, self._tparams)
            self._cvars = mesh_lib.replicate(mesh, self._cvars)
        cfg = transformer_model.config
        self.batch_size = batch_size
        self.max_frames = (max_frames if max_frames is not None
                           else cfg.sequence_size - 1)
        self.image_size = codebook_model.config.image_size
        self._relative = cfg.augment_poses == 'relative'
        self._cache_dtype = cache_dtype
        self._cache = None
        self._transform = None
        self._n_frames = 0  # host-side mirror of cache['n'] (no device sync)

        relative = self._relative
        capacity = self.max_frames

        def encode(cvars, images):
            _q, _l, codes = codebook_model.apply(
                cvars, images, training=False,
                method=type(codebook_model).encode)
            return codes.astype(jnp.int32)

        @jax.jit
        def _start(tparams, cvars, images, cameras):
            B, T = cameras.shape[:2]
            if relative:
                from .evaluate.transformer import to_relative_cameras
                cameras, transform = to_relative_cameras(cameras)
                transform = transform[:, 0]
            else:
                transform = jnp.tile(jnp.asarray(_IDENTITY_CAMERA), (B, 1))
            cameras = _normalize(cameras)
            codes = encode(cvars, images.reshape((B * T,) + images.shape[2:]))
            grid = codes.shape[-2:]
            codes = codes.reshape((B, T) + grid)
            # pad the frame count for kernel-friendly tiling (e.g. a prime T
            # forces 64-wide fused-attention tiles; see prefill_cache)
            t_pad = min(capacity, _round_up(T, 4))
            if t_pad > T:
                codes = jnp.concatenate(
                    [codes, jnp.zeros((B, t_pad - T) + grid, codes.dtype)], 1)
                cameras = jnp.concatenate(
                    [cameras, jnp.tile(jnp.asarray(_IDENTITY_CAMERA),
                                       (B, t_pad - T, 1))], 1)
            cache = inc.prefill_cache(
                transformer_model, tparams, codes, cameras,
                max_frames=capacity, dtype=self._cache_dtype, valid_frames=T)
            return cache, transform

        @jax.jit
        def _observe(tparams, cvars, cache, transform, image, camera):
            camera = _normalize(_relative_to(camera, transform))
            codes = encode(cvars, image)
            return inc.extend_cache(transformer_model, tparams, cache,
                                    codes, camera)

        def _tokens(tparams, cache, transform, cameras):
            cameras = _normalize(_relative_to(cameras, transform))
            # vmap over the query axis with the cache un-mapped: N query
            # frames share the cached context K/V (queries are mutually
            # independent by construction of the generation branch)
            logits = jax.vmap(
                lambda cam: inc.generate_frame(transformer_model, tparams,
                                               cache, cam),
                in_axes=1, out_axes=1)(cameras)
            return jnp.argmax(logits, -1), logits

        @jax.jit
        def _localize(tparams, cvars, cache, transform, image):
            codes = encode(cvars, image)
            pred = inc.localize_frame(transformer_model, tparams, cache, codes)
            camera = transformer_model.apply(
                {'params': tparams}, pred,
                method=type(transformer_model).reduce_cameras)  # [B, 7]
            if relative:
                from .evaluate.transformer import from_relative_cameras
                camera = from_relative_cameras(camera, transform)
            return camera

        @jax.jit
        def _render(tparams, cvars, cache, transform, cameras):
            codes, _ = _tokens(tparams, cache, transform, cameras)
            B, N = codes.shape[:2]
            dec = codebook_model.apply(
                cvars, codes.reshape((B * N,) + codes.shape[2:]),
                method=type(codebook_model).decode_code)
            dec = ((jnp.clip(dec, -1, 1) / 2 + 0.5) * 255.0 + 0.5).astype(jnp.uint8)
            return codes, dec.reshape((B, N) + dec.shape[1:])

        self._start_fn = _start
        self._observe_fn = _observe
        self._render_fn = _render
        self._localize_fn = _localize
        self._tokens_fn = jax.jit(_tokens)

    # -- dispatch plumbing ---------------------------------------------------

    def _shard(self, *arrays):
        """Place host inputs on the mesh's data axis (no-op without a mesh)."""
        if self._mesh is None:
            return arrays
        from .parallel import mesh as mesh_lib
        return mesh_lib.shard_batch(self._mesh, arrays)

    def _run(self, fn, *args):
        if self._mesh is None:
            return fn(*args)
        with self._mesh:
            return fn(*args)

    # -- image plumbing -----------------------------------------------------

    def _prepare_images(self, images, n_leading):
        """uint8 [..., H, W, C] -> f32 [-1, 1] resized to the codebook size."""
        images = np.asarray(images)
        expected = n_leading + 3
        if self.batch_size == 1 and images.ndim == expected - 1:
            images = images[None]
        if images.ndim != expected or images.shape[0] != self.batch_size:
            raise ValueError(
                f'expected uint8 images [{self.batch_size}, '
                f'{"T, " if n_leading == 2 else ""}H, W, C], got {images.shape}')
        lead = images.shape[:n_leading]
        flat = images.reshape((-1,) + images.shape[n_leading:])
        flat = resize(flat, self.image_size)
        # ship uint8, normalize on device; float callers keep the
        # historical host normalize (ensure_wire_images)
        from .ops.image import ensure_wire_images, normalize_images
        flat = ensure_wire_images(flat)
        return normalize_images(jnp.asarray(flat.reshape(lead + flat.shape[1:])))

    def _prepare_cameras(self, cameras, n_leading):
        cameras = np.asarray(cameras, np.float32)
        if self.batch_size == 1 and cameras.ndim == n_leading:
            cameras = cameras[None]
        if cameras.ndim != n_leading + 1 or cameras.shape[-1] != 7 \
                or cameras.shape[0] != self.batch_size:
            raise ValueError(f'bad cameras shape {cameras.shape}')
        return jnp.asarray(cameras)

    # -- public API ----------------------------------------------------------

    @property
    def context_frames(self):
        return self._n_frames

    def start(self, images, cameras):
        """Begin a session: one batched prefill over the context frames.

        images: uint8 [B, T, H, W, C] (any H/W; resized to the codebook
        size with the reference-pinned resampler), cameras: [B, T, 7]
        (xyz + wxyz quaternion). [T, ...] accepted when batch_size == 1.
        """
        images = self._prepare_images(images, 2)
        cameras = self._prepare_cameras(cameras, 2)
        T = cameras.shape[1]
        if not 1 <= T <= self.max_frames:
            raise ValueError(f'context size {T} not in [1, {self.max_frames}]')
        images, cameras = self._shard(images, cameras)
        self._cache, self._transform = self._run(
            self._start_fn, self._tparams, self._cvars, images, cameras)
        self._n_frames = T

    def observe(self, image, camera):
        """Append one observed frame to the context: image uint8
        [B, H, W, C], camera [B, 7]."""
        if self._cache is None:
            raise RuntimeError('call start() first')
        if self._n_frames >= self.max_frames:
            raise RuntimeError(
                f'context full ({self.max_frames} frames); raise max_frames')
        image = self._prepare_images(image, 1)
        camera = self._prepare_cameras(camera, 1)
        image, camera = self._shard(image, camera)
        self._cache = self._run(self._observe_fn, self._tparams, self._cvars,
                                self._cache, self._transform, image, camera)
        self._n_frames += 1

    def render(self, cameras, return_tokens=False):
        """Render novel views for query cameras [B, 7] or [B, N, 7] ->
        uint8 [B, H, W, C] / [B, N, H, W, C] (N views share one device
        program via vmap over the cached context)."""
        if self._cache is None:
            raise RuntimeError('call start() first')
        cameras = np.asarray(cameras, np.float32)
        squeeze = cameras.ndim == 2 or (self.batch_size == 1 and cameras.ndim == 1)
        cameras = self._prepare_cameras(
            cameras[..., None, :] if squeeze else cameras, 2)
        (cameras,) = self._shard(cameras)
        codes, images = self._run(self._render_fn, self._tparams, self._cvars,
                                  self._cache, self._transform, cameras)
        images = np.asarray(images)
        codes = np.asarray(codes)
        if squeeze:
            images, codes = images[:, 0], codes[:, 0]
        return (images, codes) if return_tokens else images

    @property
    def can_localize(self):
        return not self._tmodel.config.localization_weight.is_zero()

    def localize(self, image):
        """Camera localization: predict the world-frame camera [B, 7] of an
        observed image uint8 [B, H, W, C] against the cached context (one
        64-token localization-branch pass + the pose head; per-token
        predictions quaternion-mean reduced, un-canonicalized through the
        session transform)."""
        if self._cache is None:
            raise RuntimeError('call start() first')
        if not self.can_localize:
            raise RuntimeError(
                'model trained without localization (localization_weight 0)')
        image = self._prepare_images(image, 1)
        (image,) = self._shard(image)
        camera = self._run(self._localize_fn, self._tparams, self._cvars,
                           self._cache, self._transform, image)
        return np.asarray(camera)

    def render_logits(self, cameras):
        """Diagnostic: query-branch logits [B, N, h, w, vocab] for cameras
        [B, N, 7] (numerics-parity testing against the one-shot path)."""
        cameras = self._prepare_cameras(cameras, 2)
        (cameras,) = self._shard(cameras)
        _, logits = self._run(self._tokens_fn, self._tparams, self._cache,
                              self._transform, cameras)
        return np.asarray(logits)


def create_session(transformer_checkpoint, codebook_checkpoint, batch_size=1,
                   max_frames=None, use_bfloat16=True, **config_overrides):
    """Load checkpoints and build a ServingSession (bf16 serving weights by
    default — raw-matmul paths accumulate in f32 via preferred_element_type)."""
    from .models import load_model

    dtype = jnp.bfloat16 if use_bfloat16 else jnp.float32
    tmodel, tvars = load_model(transformer_checkpoint, dtype=dtype,
                               **config_overrides)
    cmodel, cvars = load_model(codebook_checkpoint, dtype=dtype)
    if use_bfloat16:
        cast = functools.partial(jax.tree.map,
                                 lambda a: a.astype(jnp.bfloat16)
                                 if a.dtype == jnp.float32 else a)
        tvars = {'params': cast(tvars['params'])}
    device = jax.devices()[0]
    tvars = jax.device_put(tvars, device)
    cvars = jax.device_put(cvars, device)
    return ServingSession(tmodel, tvars, cmodel, cvars, batch_size=batch_size,
                          max_frames=max_frames,
                          cache_dtype=dtype if use_bfloat16 else None)
