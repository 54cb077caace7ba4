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


def _host_keep(seeds, idx, rate):
    """Numpy replica of the in-kernel hash mask (scaled keep factors)."""
    idx = idx.astype(np.uint32)
    with np.errstate(over='ignore'):
        h = idx * np.uint32(2654435761) + np.uint32(seeds[0, 0])
        h = h ^ (h >> np.uint32(15))
        h = h * np.uint32(2246822519)
        h = h ^ (h >> np.uint32(13)) ^ np.uint32(seeds[0, 1])
        h = h * np.uint32(3266489917)
        h = h ^ (h >> np.uint32(16))
    u = (h >> np.uint32(8)).astype(np.float32) / np.float32(1 << 24)
    return np.where(u >= rate, np.float32(1.0 / (1.0 - rate)), np.float32(0.0))


def _host_bc_mask(seeds, BH, TL, rate):
    b = np.arange(BH, dtype=np.uint32)[:, None, None]
    row = np.arange(TL, dtype=np.uint32)[None, :, None]
    col = np.arange(TL, dtype=np.uint32)[None, None, :]
    with np.errstate(over='ignore'):
        idx = (b * np.uint32(TL) + row) * np.uint32(TL) + col
    return _host_keep(seeds, idx, rate)


def _dense_bc_dropped(q, k, v, mask):
    """Dense block-causal attention with a given scaled weight mask."""
    BH = q.shape[0] * q.shape[1]
    qf = q.reshape(BH, TL, DH)
    kf = k.reshape(BH, TL, DH)
    vf = v.reshape(BH, TL, DH)
    scores = jnp.einsum('bqd,bkd->bqk', qf, kf)
    frames_r = jnp.arange(TL)[:, None] // L
    frames_c = jnp.arange(TL)[None, :] // L
    scores = jnp.where(frames_r >= frames_c, scores, -1e9)
    w = jax.nn.softmax(scores, -1) * mask
    return jnp.einsum('bqk,bkd->bqd', w, vf).reshape(q.shape)


RATE = 0.3


def test_fused_dropout_forward_matches_host_mask():
    """Fused in-kernel dropout == dense attention with the host-replicated
    hash mask applied to the softmax weights."""
    q, k, v = (_rand(i, B, H, T, L, DH) for i in range(3))
    seeds = np.asarray([[123456789, 987654321]], np.uint32)
    mask = jnp.asarray(_host_bc_mask(seeds, B * H, TL, RATE))

    expected = _dense_bc_dropped(q, k, v, mask)
    fused = ap._run_block_causal_do(
        jnp.asarray(np.asarray(q).reshape(B * H, TL, DH)),
        jnp.asarray(np.asarray(k).reshape(B * H, TL, DH)),
        jnp.asarray(np.asarray(v).reshape(B * H, TL, DH)),
        jnp.asarray(seeds), L, RATE, interpret=True)
    np.testing.assert_allclose(np.asarray(fused).reshape(B, H, T, L, DH),
                               np.asarray(expected), atol=2e-5)


def test_fused_dropout_gradients_match_masked_dense():
    """custom_vjp grads of the dropout kernels == jax.grad of the dense
    implementation with the identical (host-computed) mask."""
    q, k, v = (_rand(i, B, H, T, L, DH) for i in range(3))
    seeds = jnp.asarray(np.asarray([[42, 4242]], np.uint32))
    mask = jnp.asarray(_host_bc_mask(np.asarray(seeds), B * H, TL, RATE))

    import viewformer_tpu.ops.attention_pallas as mod
    orig_f, orig_b = mod._run_block_causal_do, mod._run_block_causal_do_bwd
    mod._run_block_causal_do = lambda *a, **kw: orig_f(*a, interpret=True)
    mod._run_block_causal_do_bwd = lambda *a, **kw: orig_b(*a, interpret=True)
    try:
        def loss_fused(q, k, v):
            return jnp.sum(mod.fused_block_causal_attention_dropout(
                q, k, v, seeds, L, RATE) ** 2)

        def loss_dense(q, k, v):
            return jnp.sum(_dense_bc_dropped(q, k, v, mask) ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gd):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    finally:
        mod._run_block_causal_do = orig_f
        mod._run_block_causal_do_bwd = orig_b


def test_fused_dropout_deterministic_and_seed_sensitive():
    q, k, v = (_rand(i, 1, 1, T, L, DH) for i in range(3))
    r = lambda x: jnp.asarray(np.asarray(x).reshape(1, TL, DH))  # noqa: E731
    s1 = jnp.asarray(np.asarray([[7, 8]], np.uint32))
    s2 = jnp.asarray(np.asarray([[9, 10]], np.uint32))
    a = ap._run_block_causal_do(r(q), r(k), r(v), s1, L, RATE, interpret=True)
    b = ap._run_block_causal_do(r(q), r(k), r(v), s1, L, RATE, interpret=True)
    c = ap._run_block_causal_do(r(q), r(k), r(v), s2, L, RATE, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-3


def _host_branch_masks(seeds, SBH, TL, qb, rate):
    """Host replica of _branch_weight_indices + hash, single-tile case
    (qb == TL): old [SBH, TL, TL], new [SBH, TL, TL]."""
    g = np.arange(SBH, dtype=np.uint32)[:, None, None]
    row = np.arange(TL, dtype=np.uint32)[None, :, None]
    col = np.arange(TL, dtype=np.uint32)[None, None, :]
    stride = np.uint32(TL + qb)
    with np.errstate(over='ignore'):
        row_base = (g * np.uint32(TL) + row) * stride
        idx_old = row_base + col
        idx_new = row_base + np.uint32(TL) + col
    return _host_keep(seeds, idx_old, rate), _host_keep(seeds, idx_new, rate)


def _dense_branch_dropped(qb, k0, v0, kb, vb, mask_old, mask_new):
    """Dense branch attention with given scaled weight masks (joint softmax
    over [stream-0 | own-frame] keys)."""
    S = qb.shape[0]
    BH = qb.shape[1] * qb.shape[2]
    r = lambda x: x.reshape(S * BH, TL, DH)  # noqa: E731
    k0f = jnp.broadcast_to(k0.reshape(1, BH, TL, DH),
                           (S, BH, TL, DH)).reshape(S * BH, TL, DH)
    v0f = jnp.broadcast_to(v0.reshape(1, BH, TL, DH),
                           (S, BH, TL, DH)).reshape(S * BH, TL, DH)
    frames_r = jnp.arange(TL)[:, None] // L
    frames_c = jnp.arange(TL)[None, :] // L
    s_old = jnp.einsum('bqd,bkd->bqk', r(qb), k0f)
    s_old = jnp.where(frames_r > frames_c, s_old, -1e9)
    s_new = jnp.einsum('bqd,bkd->bqk', r(qb), r(kb))
    s_new = jnp.where(frames_r == frames_c, s_new, -1e9)
    joint = jax.nn.softmax(jnp.concatenate([s_old, s_new], -1), -1)
    w_old = joint[..., :TL] * mask_old
    w_new = joint[..., TL:] * mask_new
    out = jnp.einsum('bqk,bkd->bqd', w_old, v0f) + \
        jnp.einsum('bqk,bkd->bqd', w_new, r(vb))
    return out.reshape(qb.shape)


def test_fused_branch_dropout_matches_masked_dense():
    """Branch dropout kernels (fwd AND custom_vjp bwd) == dense reference
    with the identical host-computed hash masks. Single-tile case (qb == TL)
    so the kernel's own-block columns are absolute positions."""
    S = 2
    assert ap._pick_q_block(TL, L) == TL  # single tile; masks line up 1:1
    k0, v0 = _rand(0, B, H, T, L, DH), _rand(1, B, H, T, L, DH)
    qb, kb, vb = (_rand(i, S, B, H, T, L, DH) for i in (2, 3, 4))
    seeds = np.asarray([[5, 6]], np.uint32)
    mask_old, mask_new = _host_branch_masks(seeds, S * B * H, TL, TL, RATE)
    mask_old, mask_new = jnp.asarray(mask_old), jnp.asarray(mask_new)
    seeds_j = jnp.asarray(seeds)

    import viewformer_tpu.ops.attention_pallas as mod
    origs = (mod._run_branch_do, mod._run_branch_do_bwd)
    mod._run_branch_do = lambda *a, **kw: origs[0](*a, interpret=True)
    mod._run_branch_do_bwd = lambda *a, **kw: origs[1](*a, interpret=True)
    try:
        fused = mod.fused_branch_attention_dropout(qb, k0, v0, kb, vb,
                                                   seeds_j, L, RATE)
        dense = _dense_branch_dropped(qb, k0, v0, kb, vb, mask_old, mask_new)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(dense),
                                   atol=2e-5)

        def loss_fused(*a):
            return jnp.sum(mod.fused_branch_attention_dropout(
                *a, seeds_j, L, RATE) ** 2)

        def loss_dense(*a):
            return jnp.sum(_dense_branch_dropped(*a, mask_old, mask_new) ** 2)

        gf = jax.grad(loss_fused, argnums=tuple(range(5)))(qb, k0, v0, kb, vb)
        gd = jax.grad(loss_dense, argnums=tuple(range(5)))(qb, k0, v0, kb, vb)
        for a, b in zip(gf, gd):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)
    finally:
        mod._run_branch_do, mod._run_branch_do_bwd = origs


def test_multi_end_forced_fused_dropout_wiring():
    """use_fused=True with dropout exercises the full dispatch wiring (rng ->
    seed_words -> dropout kernels) in interpret mode: deterministic per key,
    different across keys, finite."""
    from viewformer_tpu.ops.branching_attention import multi_end_block_attention

    import viewformer_tpu.ops.attention_pallas as mod
    origs = (mod._run_block_causal_do, mod._run_branch_do)
    mod._run_block_causal_do = lambda *a, **kw: origs[0](*a, interpret=True)
    mod._run_branch_do = lambda *a, **kw: origs[1](*a, interpret=True)
    try:
        rs = np.random.RandomState(1)
        mk = lambda: jnp.asarray(rs.randn(1, 1, T, L, DH), jnp.float32)  # noqa: E731
        kset, vset, qset = (mk(), mk()), (mk(), mk()), (mk(), mk())
        r1, r2 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)
        a = multi_end_block_attention(kset, vset, qset, dropout_rate=0.25,
                                      dropout_rng=r1, use_fused=True)
        b = multi_end_block_attention(kset, vset, qset, dropout_rate=0.25,
                                      dropout_rng=r1, use_fused=True)
        c = multi_end_block_attention(kset, vset, qset, dropout_rate=0.25,
                                      dropout_rng=r2, use_fused=True)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        assert all(np.isfinite(np.asarray(x)).all() for x in a)
        assert max(np.abs(np.asarray(x) - np.asarray(y)).max()
                   for x, y in zip(a, c)) > 1e-3
    finally:
        mod._run_block_causal_do, mod._run_branch_do = origs


def test_multi_end_dispatch_with_dropout_cpu_matches_dense():
    """On CPU the dropout dispatch's platform_dependent must take the dense
    branch and equal the plain dense implementation (same rng splits)."""
    from viewformer_tpu.ops.branching_attention import multi_end_block_attention

    rs = np.random.RandomState(0)
    mk = lambda: jnp.asarray(rs.randn(1, 1, T, L, DH), jnp.float32)  # noqa: E731
    kset = (mk(), mk())
    vset = (mk(), mk())
    qset = (mk(), mk())
    rng = jax.random.PRNGKey(11)
    auto = multi_end_block_attention(kset, vset, qset, dropout_rate=0.25,
                                     dropout_rng=rng, use_fused='auto')
    dense = multi_end_block_attention(kset, vset, qset, dropout_rate=0.25,
                                      dropout_rng=rng, use_fused=False)
    for a, b in zip(auto, dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


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
