"""Pallas fused attention kernels vs the dense XLA reference (interpret mode
on CPU; the same kernels compile natively on TPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viewformer_tpu.ops import attention_pallas as ap
from viewformer_tpu.ops.branching_attention import (block_causal_attention,
                                                    branch_attention)

B, H, T, L, DH = 2, 2, 4, 64, 32
TL = T * L


def _rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def test_pick_q_block():
    assert ap._pick_q_block(1280, 64) == 448 or ap._pick_q_block(1280, 64) is not None
    # must divide totals and be a frame multiple
    qb = ap._pick_q_block(1280, 64)
    assert qb % 64 == 0 and 1280 % qb == 0
    assert ap._pick_q_block(256, 64) == 256
    assert ap._pick_q_block(8, 2) == 8


def test_fused_block_causal_matches_dense():
    q, k, v = (_rand(i, B, H, T, L, DH) for i in range(3))
    dense = block_causal_attention(q, k, v)
    fused = ap._run_block_causal(q.reshape(B * H, TL, DH), k.reshape(B * H, TL, DH),
                                 v.reshape(B * H, TL, DH), L, interpret=True)
    np.testing.assert_allclose(np.asarray(fused).reshape(B, H, T, L, DH),
                               np.asarray(dense), atol=2e-5)


def test_fused_branch_matches_dense():
    k0, v0 = _rand(0, B, H, T, L, DH), _rand(1, B, H, T, L, DH)
    qb, kb, vb = (_rand(i, 2, B, H, T, L, DH) for i in (2, 3, 4))
    dense = branch_attention(qb, k0, v0, kb, vb)

    S = 2
    qf = np.asarray(qb).reshape(S * B * H, TL, DH)
    k0f = np.broadcast_to(np.asarray(k0).reshape(1, B * H, TL, DH),
                          (S, B * H, TL, DH)).reshape(S * B * H, TL, DH)
    v0f = np.broadcast_to(np.asarray(v0).reshape(1, B * H, TL, DH),
                          (S, B * H, TL, DH)).reshape(S * B * H, TL, DH)
    kbf = np.asarray(kb).reshape(S * B * H, TL, DH)
    vbf = np.asarray(vb).reshape(S * B * H, TL, DH)
    fused = ap._run_branch(jnp.asarray(qf), jnp.asarray(k0f), jnp.asarray(v0f),
                           jnp.asarray(kbf), jnp.asarray(vbf), L, interpret=True)
    np.testing.assert_allclose(np.asarray(fused).reshape(S, B, H, T, L, DH),
                               np.asarray(dense), atol=2e-5)


def test_fused_block_causal_full_reference_shape():
    """The production shape: T=20 frames x L=64 tokens."""
    q, k, v = (_rand(i, 1, 1, 20, 64, 64) for i in range(3))
    dense = block_causal_attention(q, k, v)
    fused = ap._run_block_causal(q.reshape(1, 1280, 64), k.reshape(1, 1280, 64),
                                 v.reshape(1, 1280, 64), 64, interpret=True)
    np.testing.assert_allclose(np.asarray(fused).reshape(1, 1, 20, 64, 64),
                               np.asarray(dense), atol=2e-5)


def test_supported_gating():
    assert not ap.supported(4, 2, 8, platform='cpu')
    assert ap.supported(20, 64, 64, platform='tpu')
    assert not ap.supported(20, 64, 48, platform='tpu')  # unsupported head dim
    assert not ap.supported(4, 2, 64, platform='tpu')    # L too small


def test_custom_vjp_gradients_match_dense():
    """Fused forward + fused flash backward must equal pure dense grads."""
    q, k, v = (_rand(i, 1, 1, 2, 64, 32) for i in range(3))

    def loss_dense(q, k, v):
        return jnp.sum(block_causal_attention(q, k, v) ** 2)

    # exercise the custom_vjp machinery with the interpret-mode kernels
    import viewformer_tpu.ops.attention_pallas as mod
    orig_f, orig_b = mod._run_block_causal, mod._run_block_causal_bwd
    mod._run_block_causal = lambda *a, **kw: orig_f(*a, interpret=True)
    mod._run_block_causal_bwd = lambda *a, **kw: orig_b(*a, interpret=True)
    try:
        def loss_fused(q, k, v):
            return jnp.sum(mod.fused_block_causal_attention(q, k, v, 64) ** 2)

        gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gd, gf):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    finally:
        mod._run_block_causal = orig_f
        mod._run_block_causal_bwd = orig_b


def test_fused_block_causal_backward_matches_dense():
    """Direct kernel check: flash backward == jax.vjp of the dense impl, at a
    multi-tile shape (several q tiles exercise the dk/dv VMEM accumulators)."""
    q, k, v = (_rand(i, B, H, T, L, DH) for i in range(3))
    g = _rand(7, B, H, T, L, DH)

    _, vjp = jax.vjp(lambda q, k, v: block_causal_attention(q, k, v), q, k, v)
    dq_d, dk_d, dv_d = vjp(g)

    r = lambda x: jnp.asarray(np.asarray(x).reshape(B * H, TL, DH))  # noqa: E731
    dq, dk, dv = ap._run_block_causal_bwd(r(q), r(k), r(v), r(g), L,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(dq).reshape(B, H, T, L, DH),
                               np.asarray(dq_d), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk).reshape(B, H, T, L, DH),
                               np.asarray(dk_d), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv).reshape(B, H, T, L, DH),
                               np.asarray(dv_d), atol=2e-4)


def test_fused_branch_backward_matches_dense():
    """Branch flash backward == dense vjp, including the dk0/dv0 sum over
    branches (shared stream-0 K/V)."""
    S = 2
    k0, v0 = _rand(0, B, H, T, L, DH), _rand(1, B, H, T, L, DH)
    qb, kb, vb = (_rand(i, S, B, H, T, L, DH) for i in (2, 3, 4))
    g = _rand(9, S, B, H, T, L, DH)

    _, vjp = jax.vjp(
        lambda qb, k0, v0, kb, vb: branch_attention(qb, k0, v0, kb, vb),
        qb, k0, v0, kb, vb)
    dq_d, dk0_d, dv0_d, dkb_d, dvb_d = vjp(g)

    rf = lambda x: jnp.asarray(np.asarray(x).reshape(S * B * H, TL, DH))  # noqa: E731
    k0f = jnp.asarray(np.broadcast_to(
        np.asarray(k0).reshape(1, B * H, TL, DH),
        (S, B * H, TL, DH)).reshape(S * B * H, TL, DH))
    v0f = jnp.asarray(np.broadcast_to(
        np.asarray(v0).reshape(1, B * H, TL, DH),
        (S, B * H, TL, DH)).reshape(S * B * H, TL, DH))
    dq, dk0, dv0, dkb, dvb = ap._run_branch_bwd(
        rf(qb), k0f, v0f, rf(kb), rf(vb), rf(g), L, interpret=True)
    dk0 = np.asarray(dk0).reshape(S, B, H, T, L, DH).sum(0)
    dv0 = np.asarray(dv0).reshape(S, B, H, T, L, DH).sum(0)

    np.testing.assert_allclose(np.asarray(dq).reshape(S, B, H, T, L, DH),
                               np.asarray(dq_d), atol=2e-4)
    np.testing.assert_allclose(dk0, np.asarray(dk0_d), atol=2e-4)
    np.testing.assert_allclose(dv0, np.asarray(dv0_d), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dkb).reshape(S, B, H, T, L, DH),
                               np.asarray(dkb_d), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dvb).reshape(S, B, H, T, L, DH),
                               np.asarray(dvb_d), atol=2e-4)
