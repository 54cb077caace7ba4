"""Model registry and unified checkpoint loading.

Parity targets: /root/reference/viewformer/models/__init__.py (AutoModel
registry), utils/tensorflow.py:20-63 + utils/torch.py (load_model resolving
local dirs or released checkpoint names, transparently converting foreign
checkpoints). One jax registry replaces the reference's AutoModel/AutoModelTH
twin pair.
"""
import glob as _glob
import os

import jax
import jax.numpy as jnp

from ..config import MIGTConfig, VQGANConfig, load_config, supported_config_dict


class AutoModel:
    """config -> flax module."""

    @staticmethod
    def from_config(config, dtype=jnp.float32, **kwargs):
        if isinstance(config, VQGANConfig):
            from .vqgan import VQGAN
            return VQGAN(config, dtype=dtype, **kwargs)
        if isinstance(config, MIGTConfig):
            from .migt import MIGT
            return MIGT(config, dtype=dtype, **kwargs)
        raise ValueError(f'No model registered for config {type(config).__name__}')


def _init_variables(model, config):
    """Shape-only init to obtain the abstract variable structure."""
    if isinstance(config, VQGANConfig):
        dummy = jnp.zeros((1, config.image_size, config.image_size, config.in_channels),
                          jnp.float32)
        return jax.eval_shape(
            lambda: model.init({'params': jax.random.PRNGKey(0),
                                'quantizer': jax.random.PRNGKey(1)}, dummy, training=False))
    poses = jnp.zeros((1, config.sequence_size, 7), jnp.float32)
    tokens = jnp.zeros((1, config.sequence_size, config.token_image_size,
                        config.token_image_size), jnp.int32)
    return jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), poses, tokens,
                                             compute_losses=True))


def _resolve_checkpoint_path(checkpoint):
    if os.path.exists(checkpoint):
        return checkpoint
    if '/' not in checkpoint:
        from ..utils import pull_checkpoint
        return pull_checkpoint(checkpoint)
    raise FileNotFoundError(f'Checkpoint not found: {checkpoint}')


def load_model(checkpoint, dtype=jnp.float32, **config_overrides):
    """Resolve a checkpoint directory (or released checkpoint name) into
    (model, variables).

    Handles, in order:
      - our orbax train-state checkpoints (job dirs with last/ or best/),
      - reference torch `.ckpt`/`.pth` codebook checkpoints (imported),
      - reference TF `.index` transformer checkpoints (imported via the TF
        reader when tensorflow is importable)."""
    path = _resolve_checkpoint_path(checkpoint)
    config = load_config(path)
    for key, value in config_overrides.items():
        setattr(config, key, value)
    model = AutoModel.from_config(config, dtype=dtype)

    # 1) our orbax checkpoints
    if os.path.isdir(os.path.join(path, 'last')) or os.path.isdir(os.path.join(path, 'best')):
        from ..train.checkpoint import restore_checkpoint
        import numpy as np
        abstract = jax.tree.map(
            lambda x: np.zeros(x.shape, x.dtype), _init_variables(model, config))
        # train-state dicts: params (+ quantizer) plus optimizer state we drop
        state, _step = restore_checkpoint(path, None, prefer='best')
        variables = {'params': state['params']}
        if 'quantizer' in state:
            variables['quantizer'] = state['quantizer']
        return model, jax.tree.map(jnp.asarray, variables)

    # 2) reference torch checkpoints
    torch_ckpts = sorted(_glob.glob(os.path.join(path, '*.ckpt')) +
                         _glob.glob(os.path.join(path, '*.pth')) +
                         _glob.glob(os.path.join(path, 'model.*.ckpt')))
    if torch_ckpts and isinstance(config, VQGANConfig):
        from ..utils.convert import import_vqgan_from_torch, load_torch_checkpoint
        state_dict = load_torch_checkpoint(torch_ckpts[-1])
        variables = import_vqgan_from_torch(state_dict, config)
        return model, jax.tree.map(jnp.asarray, variables)

    # 3) reference TF checkpoints (Keras save_weights format)
    tf_indexes = sorted(_glob.glob(os.path.join(path, '*.index')))
    if tf_indexes and isinstance(config, MIGTConfig):
        from ..utils.convert import import_migt_from_tf, read_tf_checkpoint, \
            resolve_keras_object_paths
        prefix = tf_indexes[-1][:-len('.index')]
        variables = read_tf_checkpoint(prefix)
        variables = resolve_keras_object_paths(variables)
        imported = import_migt_from_tf(variables, config)
        return model, jax.tree.map(jnp.asarray, imported)

    raise FileNotFoundError(f'No loadable checkpoint found under {path}')
