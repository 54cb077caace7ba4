"""evaluate transformer: single-context novel-view synthesis + localization.

Parity target: /root/reference/viewformer/evaluate/evaluate_transformer.py.
The whole encode -> generate -> decode -> localize path is ONE jitted
function per batch shape (the reference ran four separate tf calls) — on TPU
this fuses the codebook towers and the transformer into a single launched
program with no host round-trips. The transformer stages run in the
incremental prefill + branch-pass form (models/migt_incremental.py): one
block-causal pass over the context builds a K/V cache that serves both the
generation and the localization query — exact one-shot semantics (module
equivalence tests) at ~2.5x less transformer work than the reference's two
full passes.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.image import resize
from ..utils import geometry_jax as geometry
from .evaluator import Evaluator


def to_relative_cameras(cameras):
    """Canonicalize a camera sequence to its first frame
    (ref evaluate_transformer.py:70-78). cameras [..., T, 7]."""
    xyz, quaternion = cameras[..., :3], cameras[..., 3:]
    transform_xyz = xyz[..., :1, :]
    transform_quaternion = quaternion[..., :1, :]
    rotation_inverse = geometry.quaternion_conjugate(transform_quaternion)
    xyz = xyz - transform_xyz
    xyz = geometry.quaternion_rotate(
        xyz, jnp.broadcast_to(rotation_inverse, xyz.shape[:-1] + (4,)))
    quaternion = geometry.quaternion_multiply(rotation_inverse, quaternion)
    return (jnp.concatenate((xyz, quaternion), -1),
            jnp.concatenate((transform_xyz, transform_quaternion), -1))


def from_relative_cameras(cameras, transform):
    """Inverse of to_relative_cameras (ref :81-87)."""
    transform_xyz, transform_quaternion = transform[..., :3], transform[..., 3:]
    xyz, quaternion = cameras[..., :3], cameras[..., 3:]
    quaternion = geometry.quaternion_multiply(transform_quaternion, quaternion)
    xyz = geometry.quaternion_rotate(
        xyz, jnp.broadcast_to(transform_quaternion, xyz.shape[:-1] + (4,)))
    xyz = xyz + transform_xyz
    return jnp.concatenate((xyz, quaternion), -1)


def normalize_cameras(cameras):
    xyz, quaternion = cameras[..., :3], cameras[..., 3:]
    quaternion = geometry.quaternion_remove_sign(geometry.quaternion_normalize(quaternion))
    return jnp.concatenate((xyz, quaternion), -1)


def make_generate_batch_predictions(transformer_model, transformer_vars,
                                    codebook_model, codebook_vars):
    """Build the jitted fused predict fn: (images f32 [-1,1] [B,S,H,W,C],
    cameras [B,S,7]) -> dict of device arrays."""
    import functools

    codebook_variables = {'params': codebook_vars['params'],
                          'quantizer': codebook_vars['quantizer']}
    transformer_variables = {'params': transformer_vars['params']}
    use_localization = not transformer_model.config.localization_weight.is_zero()
    relative = transformer_model.config.augment_poses == 'relative'

    # NOTE: variables are jit ARGUMENTS, never closure captures — captured
    # arrays are baked into the HLO as constants, which makes XLA compile
    # time explode at full model size.
    @jax.jit
    def predict(transformer_variables, codebook_variables, images, cameras):
        from ..models import migt_incremental as inc
        from ..ops.image import normalize_images

        images = normalize_images(images)  # uint8 wire -> f32 on device
        B, S = images.shape[:2]
        ground_truth_cameras = cameras[:, -1]
        transform = None
        if relative:
            cameras, transform = to_relative_cameras(cameras)
        cameras = normalize_cameras(cameras)

        # ENCODE: conv tower over all frames at once
        flat = images.reshape((B * S,) + images.shape[2:])
        _quant, _loss, codes = codebook_model.apply(
            codebook_variables, flat, training=False, method=type(codebook_model).encode)
        grid = codes.shape[-2:]
        codes = codes.reshape(B, S, *grid).astype(jnp.int32)

        # PREFILL: one block-causal pass over the S-1 context frames builds
        # the K/V cache that serves BOTH the generation and the localization
        # query below — the exact incremental form of the reference's two
        # full one-shot passes (ref evaluate_transformer.py:119-136;
        # equivalence pinned in tests/test_migt_incremental.py). The query
        # slot rides along as an inert pad frame (valid_frames masks it) so
        # the fused attention kernel keeps frame-aligned tiles.
        params = transformer_variables['params']
        padded = jnp.concatenate([codes[:, :-1], jnp.zeros_like(codes[:, :1])], 1)
        cache = inc.prefill_cache(transformer_model, params, padded, cameras,
                                  valid_frames=S - 1)

        # GENERATE: one 64-token mask-frame branch pass over the cache
        logits = inc.generate_frame(transformer_model, params, cache,
                                    cameras[:, -1])
        generated_codes = jnp.argmax(logits, -1)

        # DECODE
        generated_images = codebook_model.apply(
            codebook_variables, generated_codes, method=type(codebook_model).decode_code)
        generated_images = jnp.clip(generated_images, -1, 1)
        generated_images = ((generated_images / 2 + 0.5) * 255.0 + 0.5).astype(jnp.uint8)

        # LOCALIZE: one 64-token loc-branch pass (query frame's real codes)
        if use_localization:
            pred = inc.localize_frame(transformer_model, params, cache,
                                      codes[:, -1])          # [B, L, 7]
            generated_cameras = transformer_model.apply(
                transformer_variables, pred[:, None],
                method=type(transformer_model).reduce_cameras)
            if relative:
                generated_cameras = from_relative_cameras(generated_cameras, transform)
            generated_cameras = generated_cameras[:, -1]
        else:
            generated_cameras = None

        return dict(generated_images=generated_images,
                    generated_cameras=generated_cameras,
                    ground_truth_cameras=ground_truth_cameras)

    return functools.partial(predict, transformer_variables, codebook_variables)


class JitCallCache:
    """Per-variables compiled-fn + pad-size cache for the evaluation drivers.

    Keys include ``id()`` of the variable pytrees, and the cache pins a
    STRONG reference to every keyed object — an id can never be recycled by
    the allocator while its owner is still referenced, so a stale compiled fn
    or pad size can't be served after GC in a long multi-model process."""

    def __init__(self):
        self._fns = {}
        self._anchors = []  # strong refs that make the id() keys permanent
        self._pad_sizes = {}

    def get_or_build(self, anchors, extra_key, builder):
        """-> (key, fn); `builder()` is called once per (anchors, extra_key)."""
        key = tuple(map(id, anchors)) + tuple(extra_key)
        fn = self._fns.get(key)
        if fn is None:
            self._anchors.append(tuple(anchors))
            fn = self._fns[key] = builder()
        return key, fn

    def pad_batch(self, key, arrays):
        return pad_batch_for_jit(key, arrays, self._pad_sizes)


def pad_batch_for_jit(key, arrays, sizes=None):
    """Pad leading batch dims up to the largest batch already compiled for
    this jit-cache key (by repeating the last sample), so the tail batch of
    an evaluation never specializes a second XLA program — a full-size
    recompile costs minutes on TPU. Returns (padded_arrays, valid_count)."""
    if sizes is None:
        sizes = _PAD_SIZES
    b = arrays[0].shape[0]
    target = sizes.get(key, 0)
    if b > target:
        sizes[key] = target = b
    if b == target:
        return arrays, b
    pad = target - b
    return [np.concatenate([a, np.repeat(a[-1:], pad, axis=0)], 0)
            for a in arrays], b


_PAD_SIZES = {}
_CACHE = JitCallCache()


def generate_batch_predictions(transformer_model, transformer_vars, codebook_model,
                               codebook_vars, images, cameras, _cache=None,
                               mesh=None):
    """Host-facing wrapper: uint8 frames [B,S,H,W,C] + cameras [B,S,7] ->
    numpy prediction dict (ref evaluate_transformer.py:97-146).

    mesh: shard the batch over the mesh's data axis so the whole fused
    program runs SPMD across local chips (variables must already be
    replicated on the mesh — see evaluate_transformer). Multi-process meshes
    return each process's OWN rows (see parallel.mesh.fetch_local_rows)."""
    cache = _cache if _cache is not None else _CACHE
    key, predict = cache.get_or_build(
        (transformer_vars, codebook_vars), (images.shape[1:],),
        lambda: make_generate_batch_predictions(
            transformer_model, transformer_vars, codebook_model, codebook_vars))

    images = np.asarray(images)
    fimages = resize(images.reshape((-1,) + images.shape[2:]),
                     codebook_model.config.image_size)
    # ship uint8; the jitted predict normalizes on device (4x less upload).
    # Float callers keep the historical host normalize (ensure_wire_images).
    from ..ops.image import ensure_wire_images
    fimages = ensure_wire_images(fimages.reshape(images.shape[:2] + fimages.shape[1:]))
    (fimages, cameras), b = cache.pad_batch(
        key, [fimages, np.asarray(cameras, np.float32)])
    if mesh is not None and fimages.shape[0] % mesh.shape['data'] == 0:
        from ..parallel import mesh as mesh_lib
        fimages, cameras = mesh_lib.shard_batch(mesh, (fimages, cameras))
        with mesh:
            out = jax.tree.map(mesh_lib.fetch_local_rows,
                               predict(fimages, cameras),
                               is_leaf=lambda x: x is None)
    else:  # indivisible first-batch edge case: plain single-device dispatch
        out = jax.device_get(predict(jnp.asarray(fimages), jnp.asarray(cameras)))
    return dict(
        ground_truth_images=images[:, -1],
        generated_images=np.asarray(out['generated_images'])[:b],
        ground_truth_cameras=np.asarray(out['ground_truth_cameras'])[:b],
        generated_cameras=(np.asarray(out['generated_cameras'])[:b]
                           if out['generated_cameras'] is not None else None))


def build_store_predictions(job_dir, limit=100):
    """Per-sample gen/gt png + camera dumps (ref :149-172)."""
    os.makedirs(job_dir, exist_ok=True)
    counter = {'i': 0}

    def store(ground_truth_cameras, generated_cameras, ground_truth_images,
              generated_images, postfix='', ctx=None):
        for bi in range(len(ground_truth_images)):
            i = counter['i']
            if limit != -1 and i >= limit:
                return
            def png(img):
                img = np.asarray(img)
                from PIL import Image
                import io
                buf = io.BytesIO()
                Image.fromarray(img).save(buf, 'PNG')
                return buf.getvalue()
            with open(os.path.join(job_dir, f'{i:08d}-gen{postfix}.png'), 'wb') as f:
                f.write(png(generated_images[bi]))
            with open(os.path.join(job_dir, f'{i:08d}-gt{postfix}.png'), 'wb') as f:
                f.write(png(ground_truth_images[bi]))
            if generated_cameras is not None:
                np.save(os.path.join(job_dir, f'{i:08d}-gen{postfix}.cam.npy'),
                        np.asarray(generated_cameras[bi]))
            np.save(os.path.join(job_dir, f'{i:08d}-gt{postfix}.cam.npy'),
                    np.asarray(ground_truth_cameras[bi]))
            if ctx is not None:
                ctx_dir = os.path.join(job_dir, f'{i:08d}-ctx{postfix}')
                os.makedirs(ctx_dir, exist_ok=True)
                for j, ctx_img in enumerate(np.asarray(ctx[bi])):
                    with open(os.path.join(ctx_dir, f'{j:02d}.png'), 'wb') as f:
                        f.write(png(ctx_img))
            counter['i'] += 1
    return store


def _batched_loader_iterator(loader, sequence_size, batch_size, num_sequences=None):
    total = num_sequences if num_sequences is not None else len(loader)
    batch_frames, batch_cameras = [], []
    for idx in range(total):
        item = loader[idx]
        frames = np.asarray(item['frames'])[:sequence_size]
        cameras = np.asarray(item['cameras'])[:sequence_size]
        if len(frames) < sequence_size:
            continue
        batch_frames.append(frames)
        batch_cameras.append(cameras)
        if len(batch_frames) == batch_size:
            yield np.stack(batch_frames), np.stack(batch_cameras).astype(np.float32)
            batch_frames, batch_cameras = [], []
    if batch_frames:
        yield np.stack(batch_frames), np.stack(batch_cameras).astype(np.float32)


def evaluate_transformer(loader, transformer_checkpoint, codebook_checkpoint, job_dir,
                         batch_size=1, num_eval_sequences=None, pose_multiplier=None,
                         sequence_size=None, num_store_images=100, store_ctx=False,
                         image_size=None, progress=True):
    """CLI entry: viewformer-cli evaluate transformer (ref :193-235)."""
    from ..models import load_model

    overrides = {}
    if pose_multiplier is not None:
        overrides['pose_multiplier'] = pose_multiplier
    transformer_model, transformer_vars = load_model(transformer_checkpoint, **overrides)
    codebook_model, codebook_vars = load_model(codebook_checkpoint)
    if sequence_size is None:
        sequence_size = transformer_model.config.sequence_size
    if callable(loader) and not hasattr(loader, '__getitem__'):
        loader = loader(codebook_model.config.image_size)

    # shard eval batches over all local chips (SPMD; the fused program is
    # batch-parallel — no collectives)
    mesh = None
    if len(jax.devices()) > 1 and batch_size > 1:
        from ..parallel import mesh as mesh_lib
        mesh = mesh_lib.create_mesh_for_batch(batch_size)
        transformer_vars = mesh_lib.replicate(mesh, transformer_vars)
        codebook_vars = mesh_lib.replicate(mesh, codebook_vars)

    store_predictions = build_store_predictions(job_dir, num_store_images)
    evaluator = Evaluator(image_size=image_size)
    iterator = _batched_loader_iterator(loader, sequence_size, batch_size, num_eval_sequences)
    if progress:
        from tqdm import tqdm
        iterator = tqdm(iterator, desc='evaluating')
    for frames, cameras in iterator:
        prediction = generate_batch_predictions(transformer_model, transformer_vars,
                                                codebook_model, codebook_vars,
                                                frames, cameras, mesh=mesh)
        evaluator.update_state(**prediction)
        if store_ctx:
            prediction['ctx'] = frames[:, :-1]
        store_predictions(**prediction)
        if progress:
            iterator.set_postfix(evaluator.get_progress_bar_info())
    result = evaluator.result()
    os.makedirs(job_dir, exist_ok=True)
    with open(os.path.join(job_dir, 'results.json'), 'w') as f:
        json.dump(result, f, indent=4)
    print('Results:')
    for m, val in result.items():
        print(f'    {m}: ' + ('n/a' if val is None else f'{val:.6f}'))
    return result
