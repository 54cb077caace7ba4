"""generate-codes: batch-encode an image dataset into a code (token) dataset.

Parity target: /root/reference/viewformer/commands/generate_codes.py — walks
every shard, encodes frames with the codebook model, writes 'codes'+'cameras'
shards and sets token_image_size in info.json. TPU-native redesign: a single
jitted encode function with a fixed batch shape (padded tail batch instead of
dynamic shapes), frames flattened across sequences exactly like the
reference's unbatch/rebatch so device utilization is independent of sequence
length. One batch stays in flight so the host download of batch i overlaps
the device encode of batch i+1 (the tunnel/PCIe fetch otherwise serializes
with compute), and with more than one device the batch is sharded over the
mesh's data axis — the encode runs SPMD across all local chips (the
reference pinned this pass to a single GPU, ref generate_codes.py:87)."""
import jax
import jax.numpy as jnp
import numpy as np

from ..data import transform_dataset
from ..models import load_model


class LatentCodeTransformer:
    """Dataset transformer: frames -> codebook codes (ref generate_codes.py:20-81)."""

    def __init__(self, model, variables, batch_size=None, mesh=None):
        self.model = model
        self.variables = {'params': variables['params'], 'quantizer': variables['quantizer']}
        self.image_size = model.config.image_size
        self.batch_size = batch_size or model.config.batch_size
        self.mesh = mesh
        if mesh is not None:
            from ..parallel import mesh as mesh_lib
            assert self.batch_size % mesh.shape['data'] == 0, \
                f'batch {self.batch_size} not divisible by data axis {mesh.shape["data"]}'
            self.variables = mesh_lib.replicate(mesh, self.variables)

        import functools

        # variables are jit arguments, not closure captures (compile-time blowup)
        def encode(variables, images):
            from ..ops.image import normalize_images
            images = normalize_images(images)  # uint8 wire -> f32 on device
            _quant, _loss, codes = self.model.apply(
                variables, images, training=False,
                method=type(self.model).encode)
            return codes
        self._encode = functools.partial(jax.jit(encode), self.variables)

    def output_features(self, features):
        if features is not None and 'cameras-gqn' in features:
            return ['codes', 'cameras-gqn']
        return ['codes', 'cameras']

    def update_dataset_info(self, dataset_info):
        dataset_info['token_image_size'] = self.image_size // self.model.config.stride
        self.dataset_info = dataset_info
        return dataset_info

    def _dispatch(self, frames):
        """uint8 [N, H, W, C] -> (device codes, N): pads the tail to the
        fixed batch (unique jit specialization), shards over the mesh's data
        axis when one is set, and returns WITHOUT fetching — the caller keeps
        one batch in flight. batch_size is GLOBAL: under a multi-process
        mesh each process feeds batch_size/process_count local rows."""
        from ..ops.image import ensure_wire_images
        x = ensure_wire_images(frames)  # uint8 wire; the jitted encode normalizes
        n = len(x)
        local_target = self.batch_size
        if self.mesh is not None and jax.process_count() > 1:
            assert self.batch_size % jax.process_count() == 0
            local_target = self.batch_size // jax.process_count()
        if n < local_target:
            x = np.concatenate([x, np.zeros((local_target - n,) + x.shape[1:], x.dtype)], 0)
        if self.mesh is not None:
            from ..parallel import mesh as mesh_lib
            x = mesh_lib.shard_batch(self.mesh, x)
            with self.mesh:
                return self._encode(x), n
        return self._encode(jnp.asarray(x)), n

    @staticmethod
    def _fetch(inflight):
        codes, n = inflight
        from ..parallel.mesh import fetch_local_rows
        # multi-process meshes: each process gets its own rows back (the
        # global fetch would raise on non-addressable shards)
        return fetch_local_rows(codes)[:n]

    def __call__(self, split, dataset):
        pending = []  # (cameras, num_frames)
        frame_buffer = []
        code_chunks = []
        inflight = None

        def submit(frames):
            """Dispatch `frames`; return the PREVIOUS batch's codes (or None)."""
            nonlocal inflight
            new = self._dispatch(frames)
            done = self._fetch(inflight) if inflight is not None else None
            inflight = new
            return done

        def flush_ready():
            nonlocal code_chunks
            available = sum(len(c) for c in code_chunks)
            while pending and pending[0][1] <= available:
                cameras, n = pending.pop(0)
                out = []
                need = n
                while need > 0:
                    chunk = code_chunks[0]
                    take = min(need, len(chunk))
                    out.append(chunk[:take])
                    if take == len(chunk):
                        code_chunks.pop(0)
                    else:
                        code_chunks[0] = chunk[take:]
                    need -= take
                available -= n
                yield dict(cameras=cameras, codes=np.concatenate(out, 0))

        for item in dataset:
            frames = np.asarray(item['frames'])[..., :self.model.config.in_channels]
            pending.append((np.asarray(item['cameras']), len(frames)))
            frame_buffer.extend(frames)
            while len(frame_buffer) >= self.batch_size:
                batch = np.stack(frame_buffer[:self.batch_size], 0)
                frame_buffer = frame_buffer[self.batch_size:]
                done = submit(batch)
                if done is not None:
                    code_chunks.append(done)
                    yield from flush_ready()
        if frame_buffer:
            done = submit(np.stack(frame_buffer, 0))
            if done is not None:
                code_chunks.append(done)
                yield from flush_ready()
        if inflight is not None:
            code_chunks.append(self._fetch(inflight))
            yield from flush_ready()
        assert not pending, 'frames/codes bookkeeping mismatch'


def generate_codes(dataset, output, model, shards=None, batch_size=None,
                   splits=None, progress=True):
    """CLI entry: viewformer-cli generate-codes."""
    codebook_model, variables = load_model(model)
    batch = batch_size or codebook_model.config.batch_size
    mesh = None
    if len(jax.devices()) > 1:
        from ..parallel import mesh as mesh_lib
        mesh = mesh_lib.create_mesh_for_batch(batch)
    transformer = LatentCodeTransformer(codebook_model, variables, batch_size=batch,
                                        mesh=mesh)
    transform_dataset(dataset, output, transformer, splits=splits, shards=shards,
                      progress=progress)
