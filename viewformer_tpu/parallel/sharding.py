"""Tensor-parallel parameter sharding for MIGT over the mesh's 'model' axis.

The reference has no tensor parallelism (its largest model is GPT-2-small
class; SURVEY §2.5) — this module is the TPU-native scaling extension the
mesh provisions the 'model' axis for: Megatron-style column/row-parallel
layouts for the transformer blocks, expressed purely as `NamedSharding`s on
the parameter pytree. GSPMD propagates the layouts through the jitted train
step and inserts the collectives (all-gather / reduce-scatter over 'model',
psum over 'data'), so the SAME train-step code runs dp-only or dp x tp —
no model changes.

Layout rules (kernel shapes are [in, out]):
  - attn/c_attn kernel  [d, 3d]   -> P(None, 'model')   (column parallel)
  - attn/c_proj kernel  [d, d]    -> P('model', None)   (row parallel)
  - mlp/c_fc  kernel    [d, 4d]   -> P(None, 'model')
  - mlp/c_proj kernel   [4d, d]   -> P('model', None)
  - biases of column-parallel layers -> P('model'); row-parallel -> replicated
  - embeddings (wte/wpe), layer norms, pose heads -> replicated (tiny)

Note the c_attn output concatenates (v, q, k) chunks (reference quirk, ref
migt.py / models/migt.py docstring); an uneven 'model' split may cross chunk
boundaries — GSPMD keeps this correct (it reshards around the split), it is
only a layout-efficiency consideration, and head counts divisible by the
'model' axis size keep the fast path.

Optimizer state inherits parameter shardings for free: `optimizer.init` on
sharded global params builds its moments with `zeros_like`, which preserves
sharding. Scalar counts stay replicated.
"""
import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def _migt_spec(path_names):
    joined = '/'.join(path_names)
    leafname = path_names[-1] if path_names else ''
    if 'attn/c_attn' in joined or 'mlp/c_fc' in joined:
        return P(None, 'model') if leafname == 'kernel' else P('model')
    if 'attn/c_proj' in joined or 'mlp/c_proj' in joined:
        return P('model', None) if leafname == 'kernel' else P()
    return P()


def migt_param_shardings(params, mesh):
    """NamedSharding pytree for a MIGT param tree on `mesh` (axes
    ('data', 'model')). Only transformer-block matmuls shard; everything
    else replicates."""
    def spec(path, leaf):
        names = [str(p.key) for p in path if hasattr(p, 'key')]
        s = _migt_spec(names)
        # guard: only shard when the dimension divides evenly; fall back to
        # replication otherwise (correct either way)
        axis = mesh.shape.get('model', 1)
        for dim, name in zip(leaf.shape, s):
            if name == 'model' and dim % axis != 0:
                return NamedSharding(mesh, P())
        if len(s) > len(leaf.shape):
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, s)

    return jax.tree_util.tree_map_with_path(spec, params)


def transformer_state_shardings(state, mesh):
    """NamedSharding pytree matching a TransformerTrainState (state leaves
    may be arrays OR ShapeDtypeStructs — only .shape is read). Params go by
    `migt_param_shardings`; optimizer-state leaves inherit the layout of the
    param whose path suffix + shape they match (Adam moments mirror the
    param tree); everything else — counts, scalars, step — replicates."""
    shardings = migt_param_shardings(state.params, mesh)
    param_paths = jax.tree_util.tree_flatten_with_path(state.params)[0]
    shard_leaves = jax.tree.leaves(
        shardings, is_leaf=lambda x: isinstance(x, NamedSharding))
    by_path = {tuple(str(k) for k in path): (leaf.shape, s)
               for (path, leaf), s in zip(param_paths, shard_leaves)}
    replicated = NamedSharding(mesh, P())

    def opt_leaf_sharding(path, leaf):
        keys = tuple(str(k) for k in path)
        for i in range(len(keys)):
            hit = by_path.get(keys[i:])
            if hit is not None and getattr(leaf, 'shape', None) == hit[0]:
                return hit[1]
        return replicated

    opt_shardings = jax.tree_util.tree_map_with_path(opt_leaf_sharding,
                                                     state.opt_state)
    return type(state)(shardings, opt_shardings, replicated)


def shard_transformer_state(state, mesh, optimizer=None):
    """Place a TransformerTrainState onto the mesh with tensor-parallel
    param layouts (see `transformer_state_shardings`). The EXISTING
    optimizer state is re-placed — resuming a checkpoint through this keeps
    the Adam moments; the `optimizer` argument is unused and kept for call
    compatibility."""
    shardings = transformer_state_shardings(state, mesh)
    return jax.tree.map(jax.device_put, state, shardings)
