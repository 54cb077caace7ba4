"""Fused Pallas TPU kernels for branching block attention.

Performance pass over ops/branching_attention.py: the XLA path materializes
[B, H, T*L, T*L(+L)] score tensors in HBM (f32, ~6.5MB per head-batch at the
reference's 1280-token sequences, x12 layers x3 streams). These kernels keep
scores entirely in VMEM: at T*L <= ~2048 and dh=64 the whole K/V of one
(batch, head) fits on-chip (~0.3MB each), so a single-pass fused kernel —
score tile -> mask (computed from iota, no mask tensor in HBM) -> softmax ->
PV matmul — is both simpler and faster than a streaming flash kernel.

Masks match ops/branching_attention.py exactly:
  stream 0: frame(q) >= frame(k)               (block causal)
  branches: frame(k0) < frame(q)  for stream-0 keys
            frame(kb) == frame(q) for own-stream keys (joint softmax)
No 1/sqrt(dh) scaling (reference quirk, see branching_attention.py).

Gradients: jax.custom_vjp with fused flash-style backward kernels — the
softmax weights are recomputed from q/k inside VMEM (only the inputs are
saved as residuals), and dK/dV accumulate across q tiles in VMEM output
blocks. Neither forward nor backward ever materializes an attention score
tensor in HBM. Attention dropout ALSO runs fused (since r2): on TPU,
multi_end_block_attention dispatches dropout-active calls to the *_dropout
kernel variants, which regenerate the Bernoulli mask IN-KERNEL from
(seed words, program index) via a counter hash in both directions — no
dropout-mask residual is ever saved. The dense path (CPU lowering, or
unsupported shapes) keeps the caller-selected `dropout_impl` noise; the
noise STREAMS differ across platforms by design, the marginal matches.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG_INF = -1e9


def _pick_q_block(total, L):
    """Largest q tile <= 512 that is a multiple of L and divides total."""
    max_frames = min(512, total) // L
    for n_frames in range(max_frames, 0, -1):
        block = n_frames * L
        if total % block == 0:
            return block
    return None


# ---------------------------------------------------------------------------
# Kernels (refs carry a leading singleton block dim from the (1, qb, dh) specs)
# ---------------------------------------------------------------------------

def _block_causal_kernel3(L, q_ref, k_ref, v_ref, o_ref):
    qb = q_ref.shape[1]
    kv_len = k_ref.shape[1]
    i = pl.program_id(1)
    # native-dtype (bf16) MXU inputs with f32 accumulation — upcasting inputs
    # to f32 first would run the MXU at a fraction of its bf16 rate
    scores = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    row_frame = (i * qb + jax.lax.broadcasted_iota(jnp.int32, (qb, kv_len), 0)) // L
    col_frame = jax.lax.broadcasted_iota(jnp.int32, (qb, kv_len), 1) // L
    scores = jnp.where(row_frame >= col_frame, scores, _NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1)  # f32 softmax
    o_ref[0] = jax.lax.dot_general(
        weights.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _branch_kernel3(L, q_ref, k0_ref, v0_ref, kb_ref, vb_ref, o_ref):
    qb = q_ref.shape[1]
    kv_len = k0_ref.shape[1]
    i = pl.program_id(1)
    # native-dtype MXU inputs, f32 accumulation (see block-causal kernel)
    scores_old = jax.lax.dot_general(q_ref[0], k0_ref[0], (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    row_frame = (i * qb + jax.lax.broadcasted_iota(jnp.int32, (qb, kv_len), 0)) // L
    col_frame = jax.lax.broadcasted_iota(jnp.int32, (qb, kv_len), 1) // L
    scores_old = jnp.where(row_frame > col_frame, scores_old, _NEG_INF)

    # own-frame block: kb tile is the SAME tile index as q (aligned blocks)
    scores_new = jax.lax.dot_general(q_ref[0], kb_ref[0], (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    row_frame_n = jax.lax.broadcasted_iota(jnp.int32, (qb, qb), 0) // L
    col_frame_n = jax.lax.broadcasted_iota(jnp.int32, (qb, qb), 1) // L
    scores_new = jnp.where(row_frame_n == col_frame_n, scores_new, _NEG_INF)

    # jointly normalized softmax over [old | new]
    m = jnp.maximum(jnp.max(scores_old, -1, keepdims=True),
                    jnp.max(scores_new, -1, keepdims=True))
    e_old = jnp.exp(scores_old - m)
    e_new = jnp.exp(scores_new - m)
    denom = jnp.sum(e_old, -1, keepdims=True) + jnp.sum(e_new, -1, keepdims=True)
    out = jax.lax.dot_general((e_old / denom).astype(v0_ref.dtype), v0_ref[0],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = out + jax.lax.dot_general((e_new / denom).astype(vb_ref.dtype), vb_ref[0],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _run_block_causal(q, k, v, L, interpret=False):
    BH, TL, dh = q.shape
    qb = _pick_q_block(TL, L)
    return pl.pallas_call(
        functools.partial(_block_causal_kernel3, L),
        grid=(BH, TL // qb),
        in_specs=[
            pl.BlockSpec((1, qb, dh), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, TL, dh), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, TL, dh), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, qb, dh), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v)


def _run_branch(q, k0, v0, kb, vb, L, interpret=False):
    BH, TL, dh = q.shape
    qb = _pick_q_block(TL, L)
    return pl.pallas_call(
        functools.partial(_branch_kernel3, L),
        grid=(BH, TL // qb),
        in_specs=[
            pl.BlockSpec((1, qb, dh), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, TL, dh), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, TL, dh), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, qb, dh), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, qb, dh), lambda b, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, qb, dh), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k0, v0, kb, vb)


# ---------------------------------------------------------------------------
# Backward kernels. Same VMEM-resident single-pass structure as the forward:
# the softmax weights are recomputed from q/k (flash-style recompute, nothing
# saved but the inputs), then
#   dW = dO V^T,  dS = W * (dW - rowsum(dW * W)),  dQ = dS K,
#   dK = dS^T Q,  dV = W^T dO.
# dK/dV accumulate across q tiles: TPU Pallas grids run sequentially, so an
# output block whose index_map ignores the q-tile axis acts as a VMEM
# accumulator (zeroed at tile 0).
# ---------------------------------------------------------------------------

def _block_causal_bwd_kernel3(L, q_ref, k_ref, v_ref, do_ref,
                              dq_ref, dk_ref, dv_ref):
    qb = q_ref.shape[1]
    kv_len = k_ref.shape[1]
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    scores = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    row_frame = (i * qb + jax.lax.broadcasted_iota(jnp.int32, (qb, kv_len), 0)) // L
    col_frame = jax.lax.broadcasted_iota(jnp.int32, (qb, kv_len), 1) // L
    scores = jnp.where(row_frame >= col_frame, scores, _NEG_INF)
    w = jax.nn.softmax(scores, axis=-1)

    do = do_ref[0]
    dw = jax.lax.dot_general(do, v_ref[0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = w * (dw - jnp.sum(dw * w, -1, keepdims=True))
    dsl = ds.astype(k_ref.dtype)
    dq_ref[0] = jax.lax.dot_general(
        dsl, k_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_ref[0] += jax.lax.dot_general(dsl, q_ref[0], (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dv_ref[0] += jax.lax.dot_general(w.astype(do.dtype), do,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)


def _branch_bwd_kernel3(L, q_ref, k0_ref, v0_ref, kb_ref, vb_ref, do_ref,
                        dq_ref, dk0_ref, dv0_ref, dkb_ref, dvb_ref):
    qb = q_ref.shape[1]
    kv_len = k0_ref.shape[1]
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dk0_ref[0] = jnp.zeros_like(dk0_ref[0])
        dv0_ref[0] = jnp.zeros_like(dv0_ref[0])

    scores_old = jax.lax.dot_general(q_ref[0], k0_ref[0], (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    row_frame = (i * qb + jax.lax.broadcasted_iota(jnp.int32, (qb, kv_len), 0)) // L
    col_frame = jax.lax.broadcasted_iota(jnp.int32, (qb, kv_len), 1) // L
    scores_old = jnp.where(row_frame > col_frame, scores_old, _NEG_INF)
    scores_new = jax.lax.dot_general(q_ref[0], kb_ref[0], (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    row_frame_n = jax.lax.broadcasted_iota(jnp.int32, (qb, qb), 0) // L
    col_frame_n = jax.lax.broadcasted_iota(jnp.int32, (qb, qb), 1) // L
    scores_new = jnp.where(row_frame_n == col_frame_n, scores_new, _NEG_INF)

    m = jnp.maximum(jnp.max(scores_old, -1, keepdims=True),
                    jnp.max(scores_new, -1, keepdims=True))
    e_old = jnp.exp(scores_old - m)
    e_new = jnp.exp(scores_new - m)
    denom = jnp.sum(e_old, -1, keepdims=True) + jnp.sum(e_new, -1, keepdims=True)
    w_old = e_old / denom
    w_new = e_new / denom

    do = do_ref[0]
    dw_old = jax.lax.dot_general(do, v0_ref[0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    dw_new = jax.lax.dot_general(do, vb_ref[0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    rowsum = jnp.sum(dw_old * w_old, -1, keepdims=True) + \
        jnp.sum(dw_new * w_new, -1, keepdims=True)
    ds_old = (w_old * (dw_old - rowsum)).astype(k0_ref.dtype)
    ds_new = (w_new * (dw_new - rowsum)).astype(kb_ref.dtype)

    dq = jax.lax.dot_general(ds_old, k0_ref[0], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq = dq + jax.lax.dot_general(ds_new, kb_ref[0], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk0_ref[0] += jax.lax.dot_general(ds_old, q_ref[0], (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    dv0_ref[0] += jax.lax.dot_general(w_old.astype(do.dtype), do,
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    dkb_ref[0] = jax.lax.dot_general(
        ds_new, q_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dkb_ref.dtype)
    dvb_ref[0] = jax.lax.dot_general(
        w_new.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dvb_ref.dtype)


def _run_block_causal_bwd(q, k, v, do, L, interpret=False):
    BH, TL, dh = q.shape
    qb = _pick_q_block(TL, L)
    tile = pl.BlockSpec((1, qb, dh), lambda b, i: (b, i, 0))
    full = pl.BlockSpec((1, TL, dh), lambda b, i: (b, 0, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_block_causal_bwd_kernel3, L),
        grid=(BH, TL // qb),
        in_specs=[tile, full, full, tile],
        out_specs=[tile, full, full],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct((BH, TL, dh), jnp.float32),
                   jax.ShapeDtypeStruct((BH, TL, dh), jnp.float32)],
        interpret=interpret,
    )(q, k, v, do)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


def _run_branch_bwd(q, k0, v0, kb, vb, do, L, interpret=False):
    SBH, TL, dh = q.shape
    qb = _pick_q_block(TL, L)
    tile = pl.BlockSpec((1, qb, dh), lambda b, i: (b, i, 0))
    full = pl.BlockSpec((1, TL, dh), lambda b, i: (b, 0, 0))
    dq, dk0, dv0, dkb, dvb = pl.pallas_call(
        functools.partial(_branch_bwd_kernel3, L),
        grid=(SBH, TL // qb),
        in_specs=[tile, full, full, tile, tile, tile],
        out_specs=[tile, full, full, tile, tile],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct((SBH, TL, dh), jnp.float32),
                   jax.ShapeDtypeStruct((SBH, TL, dh), jnp.float32),
                   jax.ShapeDtypeStruct(kb.shape, kb.dtype),
                   jax.ShapeDtypeStruct(vb.shape, vb.dtype)],
        interpret=interpret,
    )(q, k0, v0, kb, vb, do)
    return dq, dk0, dv0, dkb, dvb


# ---------------------------------------------------------------------------
# In-kernel attention-weight dropout (xxhash-style integer mix of a seed and
# the GLOBAL weight index, same generator as ops/dropout.hash_uniform). The
# mask is a pure function of (seeds, index), so the backward kernel
# regenerates the identical mask with zero residual state — dropout training
# keeps the flash structure (nothing but q/k/v saved). The noise stream
# differs from jax.random dropout (used by the dense path on other
# platforms); it is the same Bernoulli(1-rate) marginal, deterministic per
# rng key.
# ---------------------------------------------------------------------------

def seed_words(key):
    """PRNG key -> uint32[1, 2] seed operand for the dropout kernels."""
    from .dropout import _key_words
    k0, k1 = _key_words(key)
    return jnp.stack([k0, k1]).reshape(1, 2)


def _hash_keep(seed_ref, idx, rate):
    """Scaled keep mask (0 or 1/(1-rate)) f32 from the global weight index."""
    h = idx * jnp.uint32(2654435761) + seed_ref[0, 0]
    h = h ^ (h >> 15)
    h = h * jnp.uint32(2246822519)
    h = h ^ (h >> 13) ^ seed_ref[0, 1]
    h = h * jnp.uint32(3266489917)
    h = h ^ (h >> 16)
    # Mosaic lacks a uint32->f32 cast; h >> 8 < 2^24 so int32 is lossless
    u = (h >> 8).astype(jnp.int32).astype(jnp.float32) / jnp.float32(1 << 24)
    return jnp.where(u >= rate, jnp.float32(1.0 / (1.0 - rate)), jnp.float32(0.0))


def _bc_weight_index(i, qb, kv_len, L):
    """Global flat index of each (row, col) weight for block-causal grids:
    (b*TL + row_global) * TL + col (uint32, wraparound is fine for hashing)."""
    b = pl.program_id(0).astype(jnp.uint32)
    row = (i.astype(jnp.uint32) * jnp.uint32(qb)
           + jax.lax.broadcasted_iota(jnp.uint32, (qb, kv_len), 0))
    col = jax.lax.broadcasted_iota(jnp.uint32, (qb, kv_len), 1)
    return (b * jnp.uint32(kv_len) + row) * jnp.uint32(kv_len) + col


def _branch_weight_indices(i, qb, kv_len, L):
    """Index spaces for the branch kernel's [old | own-tile] weights with a
    shared row stride of kv_len + qb."""
    g = pl.program_id(0).astype(jnp.uint32)
    stride = jnp.uint32(kv_len + qb)
    row_base = (g * jnp.uint32(kv_len) + i.astype(jnp.uint32) * jnp.uint32(qb)
                + jax.lax.broadcasted_iota(jnp.uint32, (qb, 1), 0)) * stride
    col_old = jax.lax.broadcasted_iota(jnp.uint32, (qb, kv_len), 1)
    col_new = jax.lax.broadcasted_iota(jnp.uint32, (qb, qb), 1) + jnp.uint32(kv_len)
    return row_base + col_old, row_base + col_new


def _block_causal_do_kernel3(L, rate, seed_ref, q_ref, k_ref, v_ref, o_ref):
    qb = q_ref.shape[1]
    kv_len = k_ref.shape[1]
    i = pl.program_id(1)
    scores = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    row_frame = (i * qb + jax.lax.broadcasted_iota(jnp.int32, (qb, kv_len), 0)) // L
    col_frame = jax.lax.broadcasted_iota(jnp.int32, (qb, kv_len), 1) // L
    scores = jnp.where(row_frame >= col_frame, scores, _NEG_INF)
    w = jax.nn.softmax(scores, axis=-1)
    w = w * _hash_keep(seed_ref, _bc_weight_index(i, qb, kv_len, L), rate)
    o_ref[0] = jax.lax.dot_general(
        w.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _block_causal_do_bwd_kernel3(L, rate, seed_ref, q_ref, k_ref, v_ref, do_ref,
                                 dq_ref, dk_ref, dv_ref):
    qb = q_ref.shape[1]
    kv_len = k_ref.shape[1]
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    scores = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    row_frame = (i * qb + jax.lax.broadcasted_iota(jnp.int32, (qb, kv_len), 0)) // L
    col_frame = jax.lax.broadcasted_iota(jnp.int32, (qb, kv_len), 1) // L
    scores = jnp.where(row_frame >= col_frame, scores, _NEG_INF)
    w = jax.nn.softmax(scores, axis=-1)
    keep = _hash_keep(seed_ref, _bc_weight_index(i, qb, kv_len, L), rate)

    do = do_ref[0]
    dw = jax.lax.dot_general(do, v_ref[0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) * keep
    ds = w * (dw - jnp.sum(dw * w, -1, keepdims=True))
    dsl = ds.astype(k_ref.dtype)
    dq_ref[0] = jax.lax.dot_general(
        dsl, k_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_ref[0] += jax.lax.dot_general(dsl, q_ref[0], (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dv_ref[0] += jax.lax.dot_general((w * keep).astype(do.dtype), do,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)


def _branch_do_kernel3(L, rate, seed_ref, q_ref, k0_ref, v0_ref, kb_ref, vb_ref,
                       o_ref):
    qb = q_ref.shape[1]
    kv_len = k0_ref.shape[1]
    i = pl.program_id(1)
    scores_old = jax.lax.dot_general(q_ref[0], k0_ref[0], (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    row_frame = (i * qb + jax.lax.broadcasted_iota(jnp.int32, (qb, kv_len), 0)) // L
    col_frame = jax.lax.broadcasted_iota(jnp.int32, (qb, kv_len), 1) // L
    scores_old = jnp.where(row_frame > col_frame, scores_old, _NEG_INF)
    scores_new = jax.lax.dot_general(q_ref[0], kb_ref[0], (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    row_frame_n = jax.lax.broadcasted_iota(jnp.int32, (qb, qb), 0) // L
    col_frame_n = jax.lax.broadcasted_iota(jnp.int32, (qb, qb), 1) // L
    scores_new = jnp.where(row_frame_n == col_frame_n, scores_new, _NEG_INF)

    m = jnp.maximum(jnp.max(scores_old, -1, keepdims=True),
                    jnp.max(scores_new, -1, keepdims=True))
    e_old = jnp.exp(scores_old - m)
    e_new = jnp.exp(scores_new - m)
    denom = jnp.sum(e_old, -1, keepdims=True) + jnp.sum(e_new, -1, keepdims=True)
    idx_old, idx_new = _branch_weight_indices(i, qb, kv_len, L)
    w_old = (e_old / denom) * _hash_keep(seed_ref, idx_old, rate)
    w_new = (e_new / denom) * _hash_keep(seed_ref, idx_new, rate)
    out = jax.lax.dot_general(w_old.astype(v0_ref.dtype), v0_ref[0],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = out + jax.lax.dot_general(w_new.astype(vb_ref.dtype), vb_ref[0],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _branch_do_bwd_kernel3(L, rate, seed_ref, q_ref, k0_ref, v0_ref, kb_ref,
                           vb_ref, do_ref, dq_ref, dk0_ref, dv0_ref, dkb_ref,
                           dvb_ref):
    qb = q_ref.shape[1]
    kv_len = k0_ref.shape[1]
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dk0_ref[0] = jnp.zeros_like(dk0_ref[0])
        dv0_ref[0] = jnp.zeros_like(dv0_ref[0])

    scores_old = jax.lax.dot_general(q_ref[0], k0_ref[0], (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    row_frame = (i * qb + jax.lax.broadcasted_iota(jnp.int32, (qb, kv_len), 0)) // L
    col_frame = jax.lax.broadcasted_iota(jnp.int32, (qb, kv_len), 1) // L
    scores_old = jnp.where(row_frame > col_frame, scores_old, _NEG_INF)
    scores_new = jax.lax.dot_general(q_ref[0], kb_ref[0], (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    row_frame_n = jax.lax.broadcasted_iota(jnp.int32, (qb, qb), 0) // L
    col_frame_n = jax.lax.broadcasted_iota(jnp.int32, (qb, qb), 1) // L
    scores_new = jnp.where(row_frame_n == col_frame_n, scores_new, _NEG_INF)

    m = jnp.maximum(jnp.max(scores_old, -1, keepdims=True),
                    jnp.max(scores_new, -1, keepdims=True))
    e_old = jnp.exp(scores_old - m)
    e_new = jnp.exp(scores_new - m)
    denom = jnp.sum(e_old, -1, keepdims=True) + jnp.sum(e_new, -1, keepdims=True)
    w_old = e_old / denom
    w_new = e_new / denom
    idx_old, idx_new = _branch_weight_indices(i, qb, kv_len, L)
    keep_old = _hash_keep(seed_ref, idx_old, rate)
    keep_new = _hash_keep(seed_ref, idx_new, rate)

    do = do_ref[0]
    dw_old = jax.lax.dot_general(do, v0_ref[0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * keep_old
    dw_new = jax.lax.dot_general(do, vb_ref[0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * keep_new
    rowsum = jnp.sum(dw_old * w_old, -1, keepdims=True) + \
        jnp.sum(dw_new * w_new, -1, keepdims=True)
    ds_old = (w_old * (dw_old - rowsum)).astype(k0_ref.dtype)
    ds_new = (w_new * (dw_new - rowsum)).astype(kb_ref.dtype)

    dq = jax.lax.dot_general(ds_old, k0_ref[0], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq = dq + jax.lax.dot_general(ds_new, kb_ref[0], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk0_ref[0] += jax.lax.dot_general(ds_old, q_ref[0], (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    dv0_ref[0] += jax.lax.dot_general((w_old * keep_old).astype(do.dtype), do,
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    dkb_ref[0] = jax.lax.dot_general(
        ds_new, q_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dkb_ref.dtype)
    dvb_ref[0] = jax.lax.dot_general(
        (w_new * keep_new).astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dvb_ref.dtype)


def _run_block_causal_do(q, k, v, seeds, L, rate, interpret=False):
    BH, TL, dh = q.shape
    qb = _pick_q_block(TL, L)
    tile = pl.BlockSpec((1, qb, dh), lambda b, i: (b, i, 0))
    full = pl.BlockSpec((1, TL, dh), lambda b, i: (b, 0, 0))
    seed = pl.BlockSpec((1, 2), lambda b, i: (0, 0))
    return pl.pallas_call(
        functools.partial(_block_causal_do_kernel3, L, rate),
        grid=(BH, TL // qb),
        in_specs=[seed, tile, full, full],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(seeds, q, k, v)


def _run_block_causal_do_bwd(q, k, v, seeds, do, L, rate, interpret=False):
    BH, TL, dh = q.shape
    qb = _pick_q_block(TL, L)
    tile = pl.BlockSpec((1, qb, dh), lambda b, i: (b, i, 0))
    full = pl.BlockSpec((1, TL, dh), lambda b, i: (b, 0, 0))
    seed = pl.BlockSpec((1, 2), lambda b, i: (0, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_block_causal_do_bwd_kernel3, L, rate),
        grid=(BH, TL // qb),
        in_specs=[seed, tile, full, full, tile],
        out_specs=[tile, full, full],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct((BH, TL, dh), jnp.float32),
                   jax.ShapeDtypeStruct((BH, TL, dh), jnp.float32)],
        interpret=interpret,
    )(seeds, q, k, v, do)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


def _run_branch_do(q, k0, v0, kb, vb, seeds, L, rate, interpret=False):
    SBH, TL, dh = q.shape
    qb = _pick_q_block(TL, L)
    tile = pl.BlockSpec((1, qb, dh), lambda b, i: (b, i, 0))
    full = pl.BlockSpec((1, TL, dh), lambda b, i: (b, 0, 0))
    seed = pl.BlockSpec((1, 2), lambda b, i: (0, 0))
    return pl.pallas_call(
        functools.partial(_branch_do_kernel3, L, rate),
        grid=(SBH, TL // qb),
        in_specs=[seed, tile, full, full, tile, tile],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(seeds, q, k0, v0, kb, vb)


def _run_branch_do_bwd(q, k0, v0, kb, vb, seeds, do, L, rate, interpret=False):
    SBH, TL, dh = q.shape
    qb = _pick_q_block(TL, L)
    tile = pl.BlockSpec((1, qb, dh), lambda b, i: (b, i, 0))
    full = pl.BlockSpec((1, TL, dh), lambda b, i: (b, 0, 0))
    seed = pl.BlockSpec((1, 2), lambda b, i: (0, 0))
    dq, dk0, dv0, dkb, dvb = pl.pallas_call(
        functools.partial(_branch_do_bwd_kernel3, L, rate),
        grid=(SBH, TL // qb),
        in_specs=[seed, tile, full, full, tile, tile, tile],
        out_specs=[tile, full, full, tile, tile],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct((SBH, TL, dh), jnp.float32),
                   jax.ShapeDtypeStruct((SBH, TL, dh), jnp.float32),
                   jax.ShapeDtypeStruct(kb.shape, kb.dtype),
                   jax.ShapeDtypeStruct(vb.shape, vb.dtype)],
        interpret=interpret,
    )(seeds, q, k0, v0, kb, vb, do)
    return dq, dk0, dv0, dkb, dvb


# ---------------------------------------------------------------------------
# Public API with fused-backward custom_vjp
# ---------------------------------------------------------------------------

def supported(T, L, dh, platform=None):
    """Whether the fused kernels handle this shape (platform routing happens
    via jax.lax.platform_dependent at lowering time; pass `platform` only to
    additionally pre-filter)."""
    if platform is not None and platform not in ('tpu',):
        return False
    TL = T * L
    if _pick_q_block(TL, L) is None:
        return False
    # K/V of one (batch, head) + score tile must fit VMEM comfortably
    return TL <= 4096 and dh in (32, 64, 128, 256) and L >= 8 and L % 8 == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_block_causal_attention(q, k, v, L):
    """[B, H, T, L, dh] stream-0 attention via the fused kernel."""
    B, H, T, Lq, dh = q.shape
    out = _run_block_causal(q.reshape(B * H, T * Lq, dh),
                            k.reshape(B * H, T * Lq, dh),
                            v.reshape(B * H, T * Lq, dh), L)
    return out.reshape(q.shape)


def _fbc_fwd(q, k, v, L):
    return fused_block_causal_attention(q, k, v, L), (q, k, v)


def _fbc_bwd(L, residuals, g):
    """Fused flash-style backward (recompute weights from q/k in VMEM; no
    score tensor ever reaches HBM). Only lowered for TPU: the dense path of
    multi_end_block_attention handles every other platform."""
    q, k, v = residuals
    B, H, T, Lq, dh = q.shape
    r = lambda x: x.reshape(B * H, T * Lq, dh)  # noqa: E731
    dq, dk, dv = _run_block_causal_bwd(r(q), r(k), r(v), r(g.astype(q.dtype)), L)
    return dq.reshape(q.shape), dk.reshape(k.shape), dv.reshape(v.shape)


fused_block_causal_attention.defvjp(_fbc_fwd, _fbc_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_branch_attention(q_branches, k0, v0, k_branches, v_branches, L):
    """[S, B, H, T, L, dh] side-stream attention via the fused kernel.
    Stream-0 K/V are broadcast across the S branches."""
    S, B, H, T, Lq, dh = q_branches.shape
    TL = T * Lq
    qf = q_branches.reshape(S * B * H, TL, dh)
    k0f = jnp.broadcast_to(k0.reshape(1, B * H, TL, dh),
                           (S, B * H, TL, dh)).reshape(S * B * H, TL, dh)
    v0f = jnp.broadcast_to(v0.reshape(1, B * H, TL, dh),
                           (S, B * H, TL, dh)).reshape(S * B * H, TL, dh)
    kbf = k_branches.reshape(S * B * H, TL, dh)
    vbf = v_branches.reshape(S * B * H, TL, dh)
    out = _run_branch(qf, k0f, v0f, kbf, vbf, L)
    return out.reshape(q_branches.shape)


def _fb_fwd(q_branches, k0, v0, k_branches, v_branches, L):
    return (fused_branch_attention(q_branches, k0, v0, k_branches, v_branches, L),
            (q_branches, k0, v0, k_branches, v_branches))


def _fb_bwd(L, residuals, g):
    """Fused backward for the branch streams. dK0/dV0 are accumulated per
    (branch, batch, head) inside the kernel and summed over branches here
    (in f32, before the dtype cast) since stream-0 K/V are shared."""
    q_branches, k0, v0, k_branches, v_branches = residuals
    S, B, H, T, Lq, dh = q_branches.shape
    TL = T * Lq
    rf = lambda x: x.reshape(S * B * H, TL, dh)  # noqa: E731
    k0f = jnp.broadcast_to(k0.reshape(1, B * H, TL, dh),
                           (S, B * H, TL, dh)).reshape(S * B * H, TL, dh)
    v0f = jnp.broadcast_to(v0.reshape(1, B * H, TL, dh),
                           (S, B * H, TL, dh)).reshape(S * B * H, TL, dh)
    dq, dk0, dv0, dkb, dvb = _run_branch_bwd(
        rf(q_branches), k0f, v0f, rf(k_branches), rf(v_branches),
        rf(g.astype(q_branches.dtype)), L)
    dk0 = dk0.reshape((S,) + k0.shape).sum(0).astype(k0.dtype)
    dv0 = dv0.reshape((S,) + v0.shape).sum(0).astype(v0.dtype)
    return (dq.reshape(q_branches.shape), dk0, dv0,
            dkb.reshape(k_branches.shape), dvb.reshape(v_branches.shape))


fused_branch_attention.defvjp(_fb_fwd, _fb_bwd)


def _float0_zeros(x):
    """Cotangent for integer inputs (the dropout seeds) in custom_vjp."""
    import numpy as np
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_block_causal_attention_dropout(q, k, v, seeds, L, rate):
    """Stream-0 attention with in-kernel hash dropout on the softmax weights.
    seeds: uint32[1, 2] (seed_words of the layer's dropout rng); rate is a
    static Python float."""
    B, H, T, Lq, dh = q.shape
    r = lambda x: x.reshape(B * H, T * Lq, dh)  # noqa: E731
    out = _run_block_causal_do(r(q), r(k), r(v), seeds, L, rate)
    return out.reshape(q.shape)


def _fbcd_fwd(q, k, v, seeds, L, rate):
    return fused_block_causal_attention_dropout(q, k, v, seeds, L, rate), \
        (q, k, v, seeds)


def _fbcd_bwd(L, rate, residuals, g):
    q, k, v, seeds = residuals
    B, H, T, Lq, dh = q.shape
    r = lambda x: x.reshape(B * H, T * Lq, dh)  # noqa: E731
    dq, dk, dv = _run_block_causal_do_bwd(r(q), r(k), r(v), seeds,
                                          r(g.astype(q.dtype)), L, rate)
    return (dq.reshape(q.shape), dk.reshape(k.shape), dv.reshape(v.shape),
            _float0_zeros(seeds))


fused_block_causal_attention_dropout.defvjp(_fbcd_fwd, _fbcd_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_branch_attention_dropout(q_branches, k0, v0, k_branches, v_branches,
                                   seeds, L, rate):
    """Branch attention with in-kernel hash dropout (joint softmax weights)."""
    S, B, H, T, Lq, dh = q_branches.shape
    TL = T * Lq
    rf = lambda x: x.reshape(S * B * H, TL, dh)  # noqa: E731
    k0f = jnp.broadcast_to(k0.reshape(1, B * H, TL, dh),
                           (S, B * H, TL, dh)).reshape(S * B * H, TL, dh)
    v0f = jnp.broadcast_to(v0.reshape(1, B * H, TL, dh),
                           (S, B * H, TL, dh)).reshape(S * B * H, TL, dh)
    out = _run_branch_do(rf(q_branches), k0f, v0f, rf(k_branches),
                         rf(v_branches), seeds, L, rate)
    return out.reshape(q_branches.shape)


def _fbd_fwd(q_branches, k0, v0, k_branches, v_branches, seeds, L, rate):
    return (fused_branch_attention_dropout(q_branches, k0, v0, k_branches,
                                           v_branches, seeds, L, rate),
            (q_branches, k0, v0, k_branches, v_branches, seeds))


def _fbd_bwd(L, rate, residuals, g):
    q_branches, k0, v0, k_branches, v_branches, seeds = residuals
    S, B, H, T, Lq, dh = q_branches.shape
    TL = T * Lq
    rf = lambda x: x.reshape(S * B * H, TL, dh)  # noqa: E731
    k0f = jnp.broadcast_to(k0.reshape(1, B * H, TL, dh),
                           (S, B * H, TL, dh)).reshape(S * B * H, TL, dh)
    v0f = jnp.broadcast_to(v0.reshape(1, B * H, TL, dh),
                           (S, B * H, TL, dh)).reshape(S * B * H, TL, dh)
    dq, dk0, dv0, dkb, dvb = _run_branch_do_bwd(
        rf(q_branches), k0f, v0f, rf(k_branches), rf(v_branches), seeds,
        rf(g.astype(q_branches.dtype)), L, rate)
    dk0 = dk0.reshape((S,) + k0.shape).sum(0).astype(k0.dtype)
    dv0 = dv0.reshape((S,) + v0.shape).sum(0).astype(v0.dtype)
    return (dq.reshape(q_branches.shape), dk0, dv0,
            dkb.reshape(k_branches.shape), dvb.reshape(v_branches.shape),
            _float0_zeros(seeds))


fused_branch_attention_dropout.defvjp(_fbd_fwd, _fbd_bwd)
