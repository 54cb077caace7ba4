"""Branching ("multi-end") block attention — the ViewFormer core kernel.

Semantics target: /root/reference/viewformer/models/branching_attention.py
  - Stream 0 ("context"): block-causal attention — every token of frame t
    attends to all tokens of frames <= t, including its own frame
    (ref branching_attention.py:41-61).
  - Streams b >= 1 ("branch"): tokens of frame t attend to stream-0 tokens of
    frames *strictly before* t plus the L tokens of their OWN frame in their
    own stream, jointly softmaxed (ref branching_attention.py:82-126: the
    shifted mask `i >= j - ns + nd + 1` over the first ns-1 frames == frame_j
    < frame_i over all frames, since frame ns-1 can never satisfy it).

Design notes (TPU-first, not a translation):
  - The reference materializes separate w_old/w_new score blocks and
    concatenates; here each branch is ONE fused attention over the
    concatenated key set [stream0 keys (T*L), own-frame keys (L)] with an
    additive mask — a single jointly-normalized softmax, one extra matmul.
  - All side branches are evaluated together via a leading stacked axis, so
    the whole layer is 3 batched einsums regardless of branch count.
  - No 1/sqrt(d_head) scaling — intentional reference quirk
    (ref branching_attention.py:5-18 applies raw q.k^T); checkpoints are
    trained with it, so parity requires keeping it.
  - Masking uses additive -inf-style bias in f32 before softmax (the
    reference's `w*m - 1e4*(1-m)` equals this at f32 in effect).

Shapes: q/k/v are [B, H, T, L, dh] per stream (T frames, L tokens per frame).
"""
import jax
import jax.numpy as jnp

_NEG_INF = -1e9


def _frame_ids(T, L):
    return jax.lax.broadcasted_iota(jnp.int32, (T * L,), 0) // L


def block_causal_bias(T, L, dtype=jnp.float32):
    """[T*L, T*L] additive bias: frame(i) >= frame(j) allowed."""
    frames = _frame_ids(T, L)
    allowed = frames[:, None] >= frames[None, :]
    return jnp.where(allowed, 0.0, _NEG_INF).astype(dtype)


def strict_causal_bias(T, L, dtype=jnp.float32):
    """[T*L, T*L] additive bias: frame(i) > frame(j) allowed."""
    frames = _frame_ids(T, L)
    allowed = frames[:, None] > frames[None, :]
    return jnp.where(allowed, 0.0, _NEG_INF).astype(dtype)


def _dropout(weights, rate, rng, impl='rng'):
    if rng is None or rate <= 0.0:
        return weights
    if impl == 'hash':
        from .dropout import hash_dropout
        return hash_dropout(rng, weights, rate)
    keep = jax.random.bernoulli(rng, 1.0 - rate, weights.shape)
    return jnp.where(keep, weights / (1.0 - rate), 0.0)


def block_causal_attention(q, k, v, dropout_rate=0.0, dropout_rng=None,
                           dropout_impl='rng'):
    """Stream-0 attention. q/k/v: [B, H, T, L, dh] -> [B, H, T, L, dh]."""
    B, H, T, L, dh = q.shape
    qf = q.reshape(B, H, T * L, dh)
    kf = k.reshape(B, H, T * L, dh)
    vf = v.reshape(B, H, T * L, dh)
    scores = jnp.einsum('bhqd,bhkd->bhqk', qf, kf,
                        preferred_element_type=jnp.float32)
    scores = scores + block_causal_bias(T, L)
    weights = jax.nn.softmax(scores, axis=-1)
    weights = _dropout(weights, dropout_rate, dropout_rng, dropout_impl)
    out = jnp.einsum('bhqk,bhkd->bhqd', weights.astype(vf.dtype), vf)
    return out.reshape(B, H, T, L, dh)


def branch_attention(q_branches, k0, v0, k_branches, v_branches,
                     dropout_rate=0.0, dropout_rng=None, dropout_impl='rng'):
    """Side-stream attention for all branches at once.

    q_branches/k_branches/v_branches: [S, B, H, T, L, dh] (S side streams);
    k0/v0: [B, H, T, L, dh] (stream-0 keys/values).
    Each branch token of frame t attends over {stream-0 tokens of frames < t}
    u {own-frame tokens of its own branch}, one joint softmax."""
    S, B, H, T, L, dh = q_branches.shape
    qf = q_branches.reshape(S, B, H, T * L, dh)
    k0f = k0.reshape(B, H, T * L, dh)
    v0f = v0.reshape(B, H, T * L, dh)

    scores_old = jnp.einsum('sbhqd,bhkd->sbhqk', qf, k0f,
                            preferred_element_type=jnp.float32)
    scores_old = scores_old + strict_causal_bias(T, L)
    # own-frame block: [S, B, H, T, L, L]
    scores_new = jnp.einsum('sbhtld,sbhtmd->sbhtlm', q_branches, k_branches,
                            preferred_element_type=jnp.float32)

    joint = jnp.concatenate(
        [scores_old.reshape(S, B, H, T, L, T * L), scores_new], axis=-1)
    weights = jax.nn.softmax(joint, axis=-1)
    weights = _dropout(weights, dropout_rate, dropout_rng, dropout_impl)
    w_old = weights[..., :T * L].reshape(S, B, H, T * L, T * L).astype(v0f.dtype)
    w_new = weights[..., T * L:].astype(v_branches.dtype)
    out = jnp.einsum('sbhqk,bhkd->sbhqd', w_old, v0f).reshape(S, B, H, T, L, dh)
    out = out + jnp.einsum('sbhtlm,sbhtmd->sbhtld', w_new, v_branches)
    return out


def block_attention(q, k, v, dropout_rate=0.0, dropout_rng=None):
    """Non-causal full block attention (ref branching_attention.py:64-79):
    every token attends every frame. q/k/v: [B, H, T, L, dh]."""
    B, H, T, L, dh = q.shape
    qf = q.reshape(B, H, T * L, dh)
    kf = k.reshape(B, H, T * L, dh)
    vf = v.reshape(B, H, T * L, dh)
    scores = jnp.einsum('bhqd,bhkd->bhqk', qf, kf, preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(scores, axis=-1)
    weights = _dropout(weights, dropout_rate, dropout_rng)
    out = jnp.einsum('bhqk,bhkd->bhqd', weights.astype(vf.dtype), vf)
    return out.reshape(B, H, T, L, dh)


def multi_end_block_attention_noncausal(kset, vset, qset, dropout_rate=0.0,
                                        dropout_rng=None):
    """Non-causal multi-end variant (ref branching_attention.py:129-173):
    stream 0 attends everything; branch frames attend all OTHER stream-0
    frames plus their own frame's branch block, jointly softmaxed."""
    rng0 = rng1 = None
    if dropout_rng is not None:
        rng0, rng1 = jax.random.split(dropout_rng)
    out0 = block_attention(qset[0], kset[0], vset[0], dropout_rate, rng0)
    outputs = (out0,)
    if len(qset) > 1:
        B, H, T, L, dh = qset[0].shape
        frames = _frame_ids(T, L)
        # mask: stream-0 frames != own frame
        allowed = frames[:, None] != frames[None, :]
        bias = jnp.where(allowed, 0.0, _NEG_INF).astype(jnp.float32)
        qb = jnp.stack(qset[1:], 0)
        kb = jnp.stack(kset[1:], 0)
        vb = jnp.stack(vset[1:], 0)
        S = qb.shape[0]
        qf = qb.reshape(S, B, H, T * L, dh)
        k0f = kset[0].reshape(B, H, T * L, dh)
        v0f = vset[0].reshape(B, H, T * L, dh)
        scores_old = jnp.einsum('sbhqd,bhkd->sbhqk', qf, k0f,
                                preferred_element_type=jnp.float32) + bias
        scores_new = jnp.einsum('sbhtld,sbhtmd->sbhtlm', qb, kb,
                                preferred_element_type=jnp.float32)
        joint = jnp.concatenate(
            [scores_old.reshape(S, B, H, T, L, T * L), scores_new], -1)
        weights = jax.nn.softmax(joint, axis=-1)
        weights = _dropout(weights, dropout_rate, rng1)
        w_old = weights[..., :T * L].reshape(S, B, H, T * L, T * L).astype(v0f.dtype)
        w_new = weights[..., T * L:].astype(vb.dtype)
        outs = jnp.einsum('sbhqk,bhkd->sbhqd', w_old, v0f).reshape(S, B, H, T, L, dh)
        outs = outs + jnp.einsum('sbhtlm,sbhtmd->sbhtld', w_new, vb)
        outputs = outputs + tuple(outs[i] for i in range(S))
    return outputs


def causal_attention(q, k, v, dropout_rate=0.0, dropout_rng=None):
    """Plain per-token causal attention including self
    (ref branching_attention.py:21-38). q/k/v: [B, H, T, dh]."""
    T = q.shape[-2]
    i = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    bias = jnp.where(i >= j, 0.0, _NEG_INF).astype(jnp.float32)
    scores = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                        preferred_element_type=jnp.float32) + bias
    weights = jax.nn.softmax(scores, axis=-1)
    weights = _dropout(weights, dropout_rate, dropout_rng)
    return jnp.einsum('bhqk,bhkd->bhqd', weights.astype(v.dtype), v)


def multi_end_causal_attention(kset, vset, qset, dropout_rate=0.0, dropout_rng=None):
    """Per-token causal multi-end variant (ref branching_attention.py:176-217):
    branch token t attends stream-0 tokens < t plus its OWN single token."""
    rng0 = rng1 = None
    if dropout_rng is not None:
        rng0, rng1 = jax.random.split(dropout_rng)
    out0 = causal_attention(qset[0], kset[0], vset[0], dropout_rate, rng0)
    outputs = (out0,)
    if len(qset) > 1:
        T = qset[0].shape[-2]
        i = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
        bias = jnp.where(i > j, 0.0, _NEG_INF).astype(jnp.float32)
        for k_new, v_new, q in zip(kset[1:], vset[1:], qset[1:]):
            scores_old = jnp.einsum('bhqd,bhkd->bhqk', q, kset[0],
                                    preferred_element_type=jnp.float32) + bias
            scores_new = jnp.sum(q.astype(jnp.float32) * k_new.astype(jnp.float32),
                                 -1, keepdims=True)
            joint = jnp.concatenate([scores_old, scores_new], -1)
            weights = jax.nn.softmax(joint, axis=-1)
            weights = _dropout(weights, dropout_rate, rng1)
            out = jnp.einsum('bhqk,bhkd->bhqd',
                             weights[..., :T].astype(vset[0].dtype), vset[0])
            out = out + weights[..., T:].astype(v_new.dtype) * v_new
            outputs = outputs + (out,)
    return outputs


def _shard_plan(B, H):
    """How to run the fused Mosaic kernels under a multi-device mesh.

    XLA cannot auto-partition Mosaic custom calls — lowering a jit that
    contains one for >1 device raises (jax tpu_custom_call.py: "Mosaic
    kernels cannot be automatically partitioned") — so on a multi-device
    mesh the fused path must run inside a shard_map spanning ALL mesh axes.
    Attention is embarrassingly parallel over batch and heads, which under
    this repo's layouts are exactly the 'data' (batch) and 'model' (heads,
    tensor-parallel c_attn) axes; any other axis (e.g. 'seq') leaves the
    operands replicated inside the manual region, which is correct (every
    group computes identical shards).

    Returns None (no mesh / single device: call kernels directly — the
    historical behavior, bitwise unchanged), 'dense' (an in-use mesh axis
    cannot be evenly partitioned: wrapping would force full replication of
    work that the dense XLA path can actually partition), or
    (mesh, data_axis_or_None, model_axis_or_None) — both axes may be None,
    e.g. a seq-only mesh, in which case the wrap runs the kernel with fully
    replicated operands (every 'seq' group computes the same shards, which
    is exactly what the surrounding program needs)."""
    from ..parallel.mesh import current_mesh
    mesh = current_mesh()
    if mesh is None or mesh.size == 1:
        return None
    shape = dict(mesh.shape)
    data_sz, model_sz = shape.get('data', 1), shape.get('model', 1)
    dax = 'data' if data_sz > 1 and B % data_sz == 0 else None
    max_ = 'model' if model_sz > 1 and H % model_sz == 0 else None
    if (data_sz > 1 and dax is None) or (model_sz > 1 and max_ is None):
        return 'dense'
    return (mesh, dax, max_)


def _shard_index(plan):
    """Linear index of this device's (data, model) shard inside the manual
    region — folded into the dropout rng so shards draw distinct noise
    (the in-kernel hash indexes weights per LOCAL (batch, head) slot).
    None when the wrap replicates over every axis (nothing to fold — all
    devices must produce identical outputs)."""
    mesh, dax, max_ = plan
    idx = None
    if dax is not None:
        idx = jax.lax.axis_index(dax)
    if max_ is not None:
        mi = jax.lax.axis_index(max_)
        idx = mi if idx is None else idx * mesh.shape[max_] + mi
    return idx


def _shard_map_fused(fn, plan, n_streams, n_lead_scalars):
    """Wrap a fused path over the whole mesh: tensor operands sharded on
    (B, H) by the plan's axes, the first `n_lead_scalars` operands (seeds /
    rng keys) replicated."""
    from jax.sharding import PartitionSpec as P
    mesh, dax, max_ = plan
    tspec = P(dax, max_, None, None, None)

    def wrap(q0, k0, v0, *rest):
        scalars, branches = rest[:n_lead_scalars], rest[n_lead_scalars:]
        in_specs = ((tspec, tspec, tspec) + (P(),) * n_lead_scalars
                    + (tspec,) * len(branches))
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=(tspec,) * n_streams,
                             check_vma=False)(q0, k0, v0, *rest)
    return wrap


def multi_end_block_attention(kset, vset, qset, dropout_rate=0.0, dropout_rng=None,
                              use_fused='auto', dropout_impl='rng'):
    """Full branching attention over a list of streams.

    kset/vset/qset: tuples of [B, H, T, L, dh], stream 0 first. Returns a
    tuple of per-stream outputs (semantics of ref
    compute_causal_block_multiend_attention).

    use_fused: 'auto' dispatches to the Pallas VMEM-resident kernels
    (ops/attention_pallas.py) when the shape is supported — with dropout
    active they regenerate the mask in-kernel (hash dropout variants);
    routing is per lowering platform (jax.lax.platform_dependent: tpu ->
    fused, anything else -> dense), so the same traced program works on a CPU
    mesh and the TPU. True forces fused, False disables."""
    B, H, T, L, dh = qset[0].shape
    plan = _shard_plan(B, H) if use_fused in ('auto', True) else None
    if plan == 'dense':
        if use_fused is True:
            raise ValueError(
                f'use_fused=True, but the Mosaic kernel cannot be evenly '
                f'partitioned over the mesh in scope (B={B}, H={H}, mesh '
                f'axes in use do not divide them) — it would have to be '
                f'silently replaced by the dense path. Use use_fused='
                f"'auto', or pick batch/head counts divisible by the mesh.")
        use_fused = False  # auto: Mosaic cannot lower multi-device unwrapped
    dropout_active = dropout_rng is not None and dropout_rate > 0.0
    if use_fused in ('auto', True) and dropout_active:
        from . import attention_pallas
        if use_fused is True or attention_pallas.supported(T, L, dh):
            # TPU: fused kernels with IN-KERNEL hash dropout on the attention
            # weights (mask regenerated from (seeds, index) in the backward —
            # no mask residual). Other platforms: the dense path below with
            # the caller-selected dropout impl. The Bernoulli(1-rate)
            # marginal matches; the noise stream is platform-specific.
            rng0, rng1 = jax.random.split(dropout_rng)
            seeds0 = attention_pallas.seed_words(rng0)
            seeds1 = attention_pallas.seed_words(rng1)

            def fused_path(q0, k0, v0, s0, s1, r0, r1, *branches):
                if plan is not None:
                    # inside the shard_map manual region: each (data, model)
                    # shard re-derives its seeds from the folded rng so the
                    # in-kernel hash (indexed per LOCAL batch/head slot)
                    # draws distinct noise per shard. idx is None for a
                    # fully-replicated wrap — keep the original seeds so
                    # every device produces identical (replicated) outputs.
                    idx = _shard_index(plan)
                    if idx is not None:
                        s0 = attention_pallas.seed_words(jax.random.fold_in(r0, idx))
                        s1 = attention_pallas.seed_words(jax.random.fold_in(r1, idx))
                out0 = attention_pallas.fused_block_causal_attention_dropout(
                    q0, k0, v0, s0, L, dropout_rate)
                outputs = (out0,)
                if branches:
                    n = len(branches) // 3
                    qb = jnp.stack(branches[:n], 0)
                    kb = jnp.stack(branches[n:2 * n], 0)
                    vb = jnp.stack(branches[2 * n:], 0)
                    outs = attention_pallas.fused_branch_attention_dropout(
                        qb, k0, v0, kb, vb, s1, L, dropout_rate)
                    outputs = outputs + tuple(outs[i] for i in range(outs.shape[0]))
                return outputs

            def dense_path(q0, k0, v0, s0, s1, r0, r1, *branches):
                out0 = block_causal_attention(q0, k0, v0, dropout_rate, r0,
                                              dropout_impl)
                outputs = (out0,)
                if branches:
                    n = len(branches) // 3
                    qb = jnp.stack(branches[:n], 0)
                    kb = jnp.stack(branches[n:2 * n], 0)
                    vb = jnp.stack(branches[2 * n:], 0)
                    outs = branch_attention(qb, k0, v0, kb, vb, dropout_rate,
                                            r1, dropout_impl)
                    outputs = outputs + tuple(outs[i] for i in range(outs.shape[0]))
                return outputs

            args = (qset[0], kset[0], vset[0], seeds0, seeds1, rng0, rng1) \
                + tuple(qset[1:]) + tuple(kset[1:]) + tuple(vset[1:])
            fused_exec = fused_path if plan is None else _shard_map_fused(
                fused_path, plan, len(qset), n_lead_scalars=4)
            if use_fused is True:
                return fused_exec(*args)
            return jax.lax.platform_dependent(*args, tpu=fused_exec,
                                              default=dense_path)

    if use_fused in ('auto', True) and not dropout_active:
        from . import attention_pallas
        if use_fused is True or attention_pallas.supported(T, L, dh):
            def fused_path(q0, k0, v0, *branches):
                out0 = attention_pallas.fused_block_causal_attention(q0, k0, v0, L)
                outputs = (out0,)
                if branches:
                    n = len(branches) // 3
                    qb = jnp.stack(branches[:n], 0)
                    kb = jnp.stack(branches[n:2 * n], 0)
                    vb = jnp.stack(branches[2 * n:], 0)
                    outs = attention_pallas.fused_branch_attention(qb, k0, v0, kb, vb, L)
                    outputs = outputs + tuple(outs[i] for i in range(outs.shape[0]))
                return outputs

            def dense_path(q0, k0, v0, *branches):
                out0 = block_causal_attention(q0, k0, v0)
                outputs = (out0,)
                if branches:
                    n = len(branches) // 3
                    qb = jnp.stack(branches[:n], 0)
                    kb = jnp.stack(branches[n:2 * n], 0)
                    vb = jnp.stack(branches[2 * n:], 0)
                    outs = branch_attention(qb, k0, v0, kb, vb)
                    outputs = outputs + tuple(outs[i] for i in range(outs.shape[0]))
                return outputs

            args = (qset[0], kset[0], vset[0]) + tuple(qset[1:]) + tuple(kset[1:]) \
                + tuple(vset[1:])
            fused_exec = fused_path if plan is None else _shard_map_fused(
                fused_path, plan, len(qset), n_lead_scalars=0)
            if use_fused is True:
                return fused_exec(*args)
            return jax.lax.platform_dependent(*args, tpu=fused_exec, default=dense_path)

    rng0 = rng1 = None
    if dropout_rng is not None:
        rng0, rng1 = jax.random.split(dropout_rng)
    out0 = block_causal_attention(qset[0], kset[0], vset[0], dropout_rate, rng0,
                                  dropout_impl)
    outputs = (out0,)
    if len(qset) > 1:
        qb = jnp.stack(qset[1:], 0)
        kb = jnp.stack(kset[1:], 0)
        vb = jnp.stack(vset[1:], 0)
        outs = branch_attention(qb, kset[0], vset[0], kb, vb, dropout_rate, rng1,
                                dropout_impl)
        outputs = outputs + tuple(outs[i] for i in range(outs.shape[0]))
    return outputs
