import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viewformer_tpu.ops.branching_attention import (block_causal_attention,
                                                    branch_attention,
                                                    multi_end_block_attention)


def naive_softmax_attention(q, keys, values):
    """Single-query oracle: q [dh], keys [N, dh], values [N, dh]."""
    scores = keys @ q  # no 1/sqrt(d) scaling, matching the reference
    w = np.exp(scores - scores.max())
    w = w / w.sum()
    return w @ values


def make_qkv(rng, B, H, T, L, dh):
    return rng.randn(B, H, T, L, dh).astype(np.float32)


def test_block_causal_attention_vs_naive():
    rng = np.random.RandomState(0)
    B, H, T, L, dh = 1, 2, 4, 3, 8
    q, k, v = (make_qkv(rng, B, H, T, L, dh) for _ in range(3))
    out = np.asarray(block_causal_attention(*map(jnp.asarray, (q, k, v))))
    for h in range(H):
        for t in range(T):
            allowed_k = k[0, h, :t + 1].reshape(-1, dh)
            allowed_v = v[0, h, :t + 1].reshape(-1, dh)
            for l in range(L):
                expected = naive_softmax_attention(q[0, h, t, l], allowed_k, allowed_v)
                np.testing.assert_allclose(out[0, h, t, l], expected, atol=1e-5)


def test_branch_attention_vs_naive():
    rng = np.random.RandomState(1)
    B, H, T, L, dh = 1, 2, 4, 3, 8
    k0, v0 = make_qkv(rng, B, H, T, L, dh), make_qkv(rng, B, H, T, L, dh)
    qb, kb, vb = (make_qkv(rng, B, H, T, L, dh)[None] for _ in range(3))
    out = np.asarray(branch_attention(*map(jnp.asarray, (qb, k0, v0, kb, vb))))[0]
    for h in range(H):
        for t in range(T):
            # allowed: stream0 frames < t  +  own frame t of the branch
            old_k = k0[0, h, :t].reshape(-1, dh)
            old_v = v0[0, h, :t].reshape(-1, dh)
            own_k = kb[0, 0, h, t]
            own_v = vb[0, 0, h, t]
            keys = np.concatenate([old_k, own_k], 0)
            values = np.concatenate([old_v, own_v], 0)
            for l in range(L):
                expected = naive_softmax_attention(qb[0, 0, h, t, l], keys, values)
                np.testing.assert_allclose(out[0, h, t, l], expected, atol=1e-5)


def test_multi_end_matches_parts():
    rng = np.random.RandomState(2)
    B, H, T, L, dh = 2, 2, 3, 4, 8
    streams = [tuple(make_qkv(rng, B, H, T, L, dh) for _ in range(3)) for _ in range(3)]
    kset = tuple(jnp.asarray(s[0]) for s in streams)
    vset = tuple(jnp.asarray(s[1]) for s in streams)
    qset = tuple(jnp.asarray(s[2]) for s in streams)
    outs = multi_end_block_attention(kset, vset, qset)
    assert len(outs) == 3
    expected0 = block_causal_attention(qset[0], kset[0], vset[0])
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(expected0), atol=1e-6)
    qb = jnp.stack(qset[1:])
    kb = jnp.stack(kset[1:])
    vb = jnp.stack(vset[1:])
    expected_branches = branch_attention(qb, kset[0], vset[0], kb, vb)
    np.testing.assert_allclose(np.asarray(outs[1]), np.asarray(expected_branches[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(outs[2]), np.asarray(expected_branches[1]), atol=1e-6)


def test_branch_causality_dependency():
    """Branch frame t must depend on stream0 frames < t and its own frame,
    and must NOT depend on stream0 frames >= t nor other branch frames."""
    rng = np.random.RandomState(3)
    B, H, T, L, dh = 1, 1, 4, 2, 4
    k0, v0 = make_qkv(rng, B, H, T, L, dh), make_qkv(rng, B, H, T, L, dh)
    qb, kb, vb = (make_qkv(rng, B, H, T, L, dh)[None] for _ in range(3))
    base = np.asarray(branch_attention(*map(jnp.asarray, (qb, k0, v0, kb, vb))))

    # perturb stream0 frame 2 -> branch outputs at frames <= 2 unchanged
    v0_pert = v0.copy()
    v0_pert[0, 0, 2] += 10.0
    out = np.asarray(branch_attention(*map(jnp.asarray, (qb, k0, v0_pert, kb, vb))))
    np.testing.assert_allclose(out[0, 0, 0, :3 - 1], base[0, 0, 0, :2])  # frames 0,1
    np.testing.assert_allclose(out[0, 0, 0, 2], base[0, 0, 0, 2])  # frame 2 itself
    assert not np.allclose(out[0, 0, 0, 3], base[0, 0, 0, 3])  # frame 3 changed

    # perturb branch's own frame 1 values -> only frame 1 changes
    vb_pert = vb.copy()
    vb_pert[0, 0, 0, 1] += 10.0
    out = np.asarray(branch_attention(*map(jnp.asarray, (qb, k0, v0, kb, vb_pert))))
    assert not np.allclose(out[0, 0, 0, 1], base[0, 0, 0, 1])
    np.testing.assert_allclose(out[0, 0, 0, 0], base[0, 0, 0, 0])
    np.testing.assert_allclose(out[0, 0, 0, 2:], base[0, 0, 0, 2:])


def test_stream0_causality():
    rng = np.random.RandomState(4)
    B, H, T, L, dh = 1, 1, 3, 2, 4
    q, k, v = (make_qkv(rng, B, H, T, L, dh) for _ in range(3))
    base = np.asarray(block_causal_attention(*map(jnp.asarray, (q, k, v))))
    v_pert = v.copy()
    v_pert[0, 0, 2] += 5.0
    out = np.asarray(block_causal_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v_pert)))
    np.testing.assert_allclose(out[0, 0, :2], base[0, 0, :2])  # frames 0,1 unchanged
    assert not np.allclose(out[0, 0, 2], base[0, 0, 2])


def test_first_branch_frame_attends_only_to_itself():
    """Frame 0 of a branch has no past context — output must be a softmax
    over only its own frame's keys."""
    rng = np.random.RandomState(5)
    B, H, T, L, dh = 1, 1, 3, 2, 4
    k0, v0 = make_qkv(rng, B, H, T, L, dh), make_qkv(rng, B, H, T, L, dh)
    qb, kb, vb = (make_qkv(rng, B, H, T, L, dh)[None] for _ in range(3))
    out = np.asarray(branch_attention(*map(jnp.asarray, (qb, k0, v0, kb, vb))))
    for l in range(L):
        expected = naive_softmax_attention(qb[0, 0, 0, 0, l], kb[0, 0, 0, 0], vb[0, 0, 0, 0])
        np.testing.assert_allclose(out[0, 0, 0, 0, l], expected, atol=1e-6)


def test_noncausal_multi_end_vs_naive():
    from viewformer_tpu.ops.branching_attention import multi_end_block_attention_noncausal
    rng = np.random.RandomState(6)
    B, H, T, L, dh = 1, 1, 3, 2, 4
    streams = [tuple(make_qkv(rng, B, H, T, L, dh) for _ in range(3)) for _ in range(2)]
    kset = tuple(jnp.asarray(s[0]) for s in streams)
    vset = tuple(jnp.asarray(s[1]) for s in streams)
    qset = tuple(jnp.asarray(s[2]) for s in streams)
    outs = multi_end_block_attention_noncausal(kset, vset, qset)
    out0 = np.asarray(outs[0])
    out1 = np.asarray(outs[1])
    k0, v0 = np.asarray(kset[0]), np.asarray(vset[0])
    k1, v1 = np.asarray(kset[1]), np.asarray(vset[1])
    q0, q1 = np.asarray(qset[0]), np.asarray(qset[1])
    # stream 0: attends everything
    for t in range(T):
        for l in range(L):
            expected = naive_softmax_attention(q0[0, 0, t, l],
                                               k0[0, 0].reshape(-1, dh),
                                               v0[0, 0].reshape(-1, dh))
            np.testing.assert_allclose(out0[0, 0, t, l], expected, atol=1e-5)
    # branch: all stream-0 frames except own + own branch frame
    for t in range(T):
        other = [f for f in range(T) if f != t]
        keys = np.concatenate([k0[0, 0, other].reshape(-1, dh), k1[0, 0, t]], 0)
        values = np.concatenate([v0[0, 0, other].reshape(-1, dh), v1[0, 0, t]], 0)
        for l in range(L):
            expected = naive_softmax_attention(q1[0, 0, t, l], keys, values)
            np.testing.assert_allclose(out1[0, 0, t, l], expected, atol=1e-5)


def test_per_token_causal_multi_end_vs_naive():
    from viewformer_tpu.ops.branching_attention import multi_end_causal_attention
    rng = np.random.RandomState(7)
    B, H, T, dh = 1, 1, 5, 4
    k0, v0, q0, k1, v1, q1 = (rng.randn(B, H, T, dh).astype(np.float32)
                              for _ in range(6))
    outs = multi_end_causal_attention((jnp.asarray(k0), jnp.asarray(k1)),
                                      (jnp.asarray(v0), jnp.asarray(v1)),
                                      (jnp.asarray(q0), jnp.asarray(q1)))
    out0, out1 = np.asarray(outs[0]), np.asarray(outs[1])
    for t in range(T):
        expected = naive_softmax_attention(q0[0, 0, t], k0[0, 0, :t + 1], v0[0, 0, :t + 1])
        np.testing.assert_allclose(out0[0, 0, t], expected, atol=1e-5)
        keys = np.concatenate([k0[0, 0, :t], k1[0, 0, t:t + 1]], 0)
        values = np.concatenate([v0[0, 0, :t], v1[0, 0, t:t + 1]], 0)
        expected = naive_softmax_attention(q1[0, 0, t], keys, values)
        np.testing.assert_allclose(out1[0, 0, t], expected, atol=1e-5)
