"""KV-cached incremental generation for MIGT — the sequential-serving path.

The reference generates chained frames by re-running the full transformer
over the whole sequence for every new frame
(ref evaluate_transformer_multictx_allimg.py:146-171, `keep_last_frame`).
This module adds the TPU-native incremental alternative (the optional
extension named in BASELINE.md): stream-0 keys/values are cached per layer,
so appending a context frame costs one 64-token forward and generating a
query frame costs one 64-token branch pass over the cache — O(T) per frame
instead of O(T^2) per chain.

All functions are pure over an explicit cache pytree:
  cache: {'k': [n_layer, B, H, max_frames, L, dh],
          'v': [n_layer, B, H, max_frames, L, dh],
          'n': scalar int32 (frames filled)}

Semantics match the one-shot model exactly (tested): a context frame attends
cached frames plus its own block (block-causal); a generated frame attends
cached frames strictly before it plus its own mask-token block.
"""
import jax
import jax.numpy as jnp

_NEG_INF = -1e9


@jax.tree_util.register_pytree_node_class
class KVCache(dict):
    """The cache pytree. Subclasses dict (callers index cache['k'] etc.) but
    additionally carries the frame token grid ``grid=(h, w)`` as STATIC
    pytree aux data, so it survives jit/scan boundaries as a compile-time
    constant — `generate_frame` reshapes its logits with it, which an array
    leaf could not drive. Known statically at prefill/init time; non-square
    grids (codebooks whose real grid disagrees with token_image_size) are
    reshaped correctly instead of transposed through an isqrt guess."""

    def __init__(self, k, v, n, grid):
        super().__init__(k=k, v=v, n=n)
        self.grid = tuple(int(g) for g in grid)

    def tree_flatten(self):
        return (self['k'], self['v'], self['n']), self.grid

    @classmethod
    def tree_unflatten(cls, grid, children):
        k, v, n = children
        return cls(k, v, n, grid)


def _grid_from_shape(shape):
    """(h, w) from a frame-token shape suffix; flat [L] suffixes fall back to
    the square grid (asserted exact)."""
    import math
    if len(shape) == 2:
        return tuple(int(s) for s in shape)
    L = 1
    for d in shape:
        L *= int(d)
    side = math.isqrt(L)
    assert side * side == L, \
        f'flat token length {L} is not square; pass tokens as [.., h, w]'
    return (side, side)


def init_cache(config, batch_size, max_frames, dtype=jnp.float32):
    n_layer, H = config.n_layer, config.n_head
    L = config.token_image_size ** 2
    dh = config.d_model // H
    shape = (n_layer, batch_size, H, max_frames, L, dh)
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                   jnp.zeros((), jnp.int32),
                   (config.token_image_size, config.token_image_size))


def _split_heads(x, H):
    B, L, d = x.shape
    return x.reshape(B, L, H, d // H).transpose(0, 2, 1, 3)  # [B, H, L, dh]


def _merge_heads(x):
    B, H, L, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, L, H * dh)


def _attend_cache(q, cache_k, cache_v, own_k, own_v, n_valid, include_own_frame_idx):
    """q [B,H,L,dh] over cached frames [B,H,F,L,dh] (valid: frame < n_valid)
    plus the own block [B,H,L,dh]; joint softmax. Returns [B,H,L,dh]."""
    B, H, F, L, dh = cache_k.shape
    kc = cache_k.reshape(B, H, F * L, dh)
    vc = cache_v.reshape(B, H, F * L, dh)
    scores_old = jnp.einsum('bhqd,bhkd->bhqk', q, kc,
                            preferred_element_type=jnp.float32)
    frame_ids = jax.lax.broadcasted_iota(jnp.int32, (F * L,), 0) // L
    valid = frame_ids < n_valid
    scores_old = jnp.where(valid[None, None, None, :], scores_old, _NEG_INF)
    scores_new = jnp.einsum('bhqd,bhkd->bhqk', q, own_k,
                            preferred_element_type=jnp.float32)
    joint = jnp.concatenate([scores_old, scores_new], -1)
    weights = jax.nn.softmax(joint, axis=-1)
    out = jnp.einsum('bhqk,bhkd->bhqd', weights[..., :F * L].astype(vc.dtype), vc)
    out = out + jnp.einsum('bhqk,bhkd->bhqd', weights[..., F * L:].astype(own_v.dtype),
                           own_v)
    return out


def _frame_embeddings(model, params, tokens, pose, is_mask_frame, length=None):
    """Assemble one frame's input embeddings [B, L, d] (matching MIGT stream
    assembly; ref migt.py:371-401). L derives from the actual token grid
    (like the one-shot model, ref migt.py:338-346 — configs whose
    token_image_size disagrees with the codebook's real grid still work);
    mask frames take it from `length`."""
    cfg = model.config
    if tokens is not None:
        L = 1
        for d in tokens.shape[1:]:
            L *= d
    else:
        L = length if length is not None else cfg.token_image_size ** 2
    wte = params['wte']['embedding']
    wpe = params['wpe'][:L]

    def pose_mlp(x):
        h = x @ params['pose_embedding']['c_fc']['kernel'] + \
            params['pose_embedding']['c_fc']['bias']
        h = jax.nn.gelu(h, approximate=False)
        return h @ params['pose_embedding']['c_proj']['kernel'] + \
            params['pose_embedding']['c_proj']['bias']

    xyz = pose[..., :3] * cfg.pose_multiplier
    pose_in = jnp.concatenate([xyz, pose[..., 3:]], -1).astype(jnp.float32)
    pose_embed = pose_mlp(pose_in)[:, None, :]  # [B, 1, d]
    if is_mask_frame:
        token_embed = wte[model.config.n_embeddings][None, None, :]
    else:
        token_embed = jnp.take(wte, tokens.reshape(tokens.shape[0], L), axis=0)
    # pose_mlp runs in f32 (pose inputs are f32); keep the residual stream in
    # the param dtype so bf16 weights give a bf16 tower
    return (token_embed + wpe[None] + pose_embed).astype(wte.dtype)


def _layer_norm(x, scale, bias, eps=1e-5):
    mean = jnp.mean(x, -1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, -1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _block_incremental(model, block_params, H, x, cache_k, cache_v, n_valid):
    """One transformer block over one frame [B, L, d] against the cache.
    Returns (new_x, own_k, own_v) where own_k/v are this frame's stream-0
    keys/values AFTER ln_1 (to be cached by the caller when appropriate)."""
    ln1 = block_params['ln_1']
    normed = _layer_norm(x, ln1['scale'], ln1['bias'])
    c_attn = block_params['attn']['c_attn']
    vqk = normed @ c_attn['kernel'] + c_attn['bias']
    v, q, k = jnp.split(vqk, 3, axis=-1)  # reference chunk order
    qh, kh, vh = (_split_heads(t, H) for t in (q, k, v))
    attended = _attend_cache(qh, cache_k, cache_v, kh, vh, n_valid,
                             include_own_frame_idx=None)
    c_proj = block_params['attn']['c_proj']
    x = x + (_merge_heads(attended) @ c_proj['kernel'] + c_proj['bias'])
    ln2 = block_params['ln_2']
    normed = _layer_norm(x, ln2['scale'], ln2['bias'])
    mlp = block_params['mlp']
    h = normed @ mlp['c_fc']['kernel'] + mlp['c_fc']['bias']
    h = jax.nn.gelu(h, approximate=False)
    x = x + (h @ mlp['c_proj']['kernel'] + mlp['c_proj']['bias'])
    return x, kh, vh


def prefill_cache(model, params, tokens, poses, max_frames=None,
                  dtype=None, use_fused='auto', valid_frames=None):
    """Build the K/V cache for ALL context frames in ONE batched pass.

    tokens [B, T, h, w], poses [B, T, 7] -> cache with n = T. Equivalent to
    scanning `extend_cache` over the frames (tested), but runs the stream-0
    tower as one block-causal attention over T*L tokens — the MXU-friendly
    prefill. With `generate_frame` this is the fast exact form of the
    reference's one-shot inference (ref evaluate_transformer.py:119-129):
    the one-shot pass computes generation-branch outputs for every frame and
    discards all but the last; prefill+generate computes only the context
    tower and the single query branch, same outputs.

    valid_frames: mark only the first `valid_frames` frames as context
    (cache n). Lets callers pad the input with trailing dummy frames for a
    kernel-friendlier T — block-causal attention means trailing frames
    cannot affect earlier frames' K/V (e.g. T=19 only tiles 64-wide in the
    fused kernel because 19 is prime; padding to 20 restores 320-wide
    tiles).
    """
    from ..ops.branching_attention import multi_end_block_attention

    cfg = model.config
    B, T = tokens.shape[:2]
    H = cfg.n_head
    L = 1
    for d in tokens.shape[2:]:  # derive from the real grid (ref migt.py:338-346)
        L *= d
    dh = cfg.d_model // H
    max_frames = max_frames if max_frames is not None else T
    assert max_frames >= T, (max_frames, T)
    dtype = dtype if dtype is not None else params['wpe'].dtype

    wte = params['wte']['embedding']
    wpe = params['wpe'][:L]

    def pose_mlp(x):
        h = x @ params['pose_embedding']['c_fc']['kernel'] + \
            params['pose_embedding']['c_fc']['bias']
        h = jax.nn.gelu(h, approximate=False)
        return h @ params['pose_embedding']['c_proj']['kernel'] + \
            params['pose_embedding']['c_proj']['bias']

    xyz = poses[..., :3] * cfg.pose_multiplier
    pose_in = jnp.concatenate([xyz, poses[..., 3:]], -1).astype(jnp.float32)
    pose_embed = pose_mlp(pose_in)[:, :, None, :]            # [B, T, 1, d]
    token_embed = jnp.take(wte, tokens.reshape(B, T, L), axis=0)
    x = (token_embed + wpe[None, None] + pose_embed).reshape(B, T * L, -1)
    x = x.astype(wte.dtype)  # keep the tower in the param dtype (see above)

    ks, vs = [], []
    for layer in range(cfg.n_layer):
        block_params = params[f'h_{layer}']
        ln1 = block_params['ln_1']
        normed = _layer_norm(x, ln1['scale'], ln1['bias'])
        c_attn = block_params['attn']['c_attn']
        vqk = normed @ c_attn['kernel'] + c_attn['bias']
        v, q, k = jnp.split(vqk, 3, axis=-1)  # reference chunk order
        qh = _split_heads(q, H).reshape(B, H, T, L, dh)
        kh = _split_heads(k, H).reshape(B, H, T, L, dh)
        vh = _split_heads(v, H).reshape(B, H, T, L, dh)
        ks.append(kh.astype(dtype))
        vs.append(vh.astype(dtype))
        if layer == cfg.n_layer - 1:
            break  # last layer: only its K/V are live; x is never read again
        (attended,) = multi_end_block_attention((kh,), (vh,), (qh,),
                                                use_fused=use_fused)
        attended = _merge_heads(attended.reshape(B, H, T * L, dh))
        c_proj = block_params['attn']['c_proj']
        x = x + (attended @ c_proj['kernel'] + c_proj['bias'])
        ln2 = block_params['ln_2']
        normed = _layer_norm(x, ln2['scale'], ln2['bias'])
        mlp = block_params['mlp']
        h = normed @ mlp['c_fc']['kernel'] + mlp['c_fc']['bias']
        h = jax.nn.gelu(h, approximate=False)
        x = x + (h @ mlp['c_proj']['kernel'] + mlp['c_proj']['bias'])

    k_cache = jnp.stack(ks, 0)                                # [nl,B,H,T,L,dh]
    v_cache = jnp.stack(vs, 0)
    if max_frames > T:
        pad = [(0, 0), (0, 0), (0, 0), (0, max_frames - T), (0, 0), (0, 0)]
        k_cache = jnp.pad(k_cache, pad)
        v_cache = jnp.pad(v_cache, pad)
    n = T if valid_frames is None else valid_frames
    return KVCache(k_cache, v_cache, jnp.asarray(n, jnp.int32),
                   _grid_from_shape(tokens.shape[2:]))


def extend_cache(model, params, cache, tokens, pose):
    """Append one context frame: tokens [B, h, w], pose [B, 7].
    Runs the stream-0 forward for this frame (attending cache + own block)
    and writes its per-layer K/V into the cache."""
    cfg = model.config
    H = cfg.n_head
    x = _frame_embeddings(model, params, tokens, pose, is_mask_frame=False)
    n = cache['n']
    new_k, new_v = cache['k'], cache['v']
    for layer in range(cfg.n_layer):
        block_params = params[f'h_{layer}']
        x, kh, vh = _block_incremental(model, block_params, H, x,
                                       cache['k'][layer], cache['v'][layer], n)
        new_k = new_k.at[layer, :, :, n].set(kh.astype(new_k.dtype))
        new_v = new_v.at[layer, :, :, n].set(vh.astype(new_v.dtype))
    grid = getattr(cache, 'grid', None) or _grid_from_shape(tokens.shape[1:])
    return KVCache(new_k, new_v, n + 1, grid)


def localize_frame(model, params, cache, tokens):
    """Localize a query frame against the cached context: tokens [B, h, w]
    (the frame's codebook codes) -> per-token pose predictions [B, L, 7].

    Matches the one-shot eval localization exactly (tested): there the query
    frame rides STREAM 0 with the localization-token embedding substituted
    for its pose embedding (migt.py eval-only branch; ref migt.py:387-390),
    so it attends cached frames plus its own block — the same pattern as
    `extend_cache` but with loc embeddings, no cache write, and the pose
    head (f32 island) on top. Callers reduce the L per-token predictions
    with `MIGT.reduce_cameras` (quaternion normalize-mean)."""
    cfg = model.config
    H = cfg.n_head
    B = tokens.shape[0]
    L = 1
    for d in tokens.shape[1:]:  # derive from the real grid (ref migt.py:338-346)
        L *= d
    wte = params['wte']['embedding']
    loc_embed = wte[cfg.n_embeddings + 1][None, None, :]
    x = (jnp.take(wte, tokens.reshape(B, L), axis=0)
         + params['wpe'][:L][None] + loc_embed).astype(wte.dtype)
    n = cache['n']
    for layer in range(cfg.n_layer):
        block_params = params[f'h_{layer}']
        x, _, _ = _block_incremental(model, block_params, H, x,
                                     cache['k'][layer], cache['v'][layer], n)
    ln_f = params['ln_f']
    x = _layer_norm(x, ln_f['scale'], ln_f['bias'])
    head = params['pose_criterion']['pose_classifier']
    h = x.astype(jnp.float32) @ head['c_fc']['kernel'] + head['c_fc']['bias']
    h = jax.nn.gelu(h, approximate=False)
    raw = h @ head['c_proj']['kernel'] + head['c_proj']['bias']
    from ..utils import geometry_jax as geometry
    xyz = raw[..., :3] / cfg.pose_multiplier
    quaternion = geometry.quaternion_remove_sign(
        geometry.quaternion_normalize(raw[..., 3:]))
    return jnp.concatenate([xyz, quaternion], -1)


def generate_frame(model, params, cache, query_pose):
    """Generate the query frame against the cached context: query_pose [B, 7]
    -> logits [B, h, w, n_embeddings]. The cache is unchanged (generated
    frames are not context unless explicitly appended after decoding)."""
    cfg = model.config
    H = cfg.n_head
    L = cache['k'].shape[4]  # frame length from the cache's real grid
    x = _frame_embeddings(model, params, None, query_pose, is_mask_frame=True,
                          length=L)
    x = jnp.broadcast_to(x, (query_pose.shape[0], L, cfg.d_model))
    n = cache['n']
    for layer in range(cfg.n_layer):
        block_params = params[f'h_{layer}']
        x, _, _ = _block_incremental(model, block_params, H, x,
                                     cache['k'][layer], cache['v'][layer], n)
    ln_f = params['ln_f']
    x = _layer_norm(x, ln_f['scale'], ln_f['bias'])
    logits = jnp.einsum('bld,vd->blv', x.astype(jnp.float32),
                        params['wte']['embedding'][:cfg.n_embeddings].astype(jnp.float32))
    # the (h, w) grid rides the cache as static aux (plain-dict caches from
    # older callers fall back to the square config grid)
    grid = getattr(cache, 'grid', None) or _grid_from_shape((L,))
    return logits.reshape((x.shape[0],) + grid + (cfg.n_embeddings,))
