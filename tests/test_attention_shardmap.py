"""Fused Mosaic attention under a multi-device mesh (shard_map wrap).

XLA cannot auto-partition Mosaic custom calls: lowering a >1-device jit
containing one raises "Mosaic kernels cannot be automatically partitioned"
(jax tpu_custom_call.py) — which would break EVERY multi-chip TPU path
that routes through the fused kernels (dp training, sharded evaluate,
serving). ops/branching_attention._shard_plan therefore wraps the fused
path in a shard_map over the whole mesh, sharding batch over 'data' and
heads over 'model', with a per-shard dropout-rng fold.

These tests run the WRAPPED path on the CPU virtual-device mesh with the
kernels in interpret mode (the same monkeypatch recipe as
test_attention_pallas) and pin equality against the dense reference; the
real-TPU counterpart is the v5e-8 topology AOT compile in
tools/lowering_check_fullsize.py.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import viewformer_tpu.ops.attention_pallas as ap
from viewformer_tpu.ops.branching_attention import (block_causal_attention,
                                                    branch_attention,
                                                    multi_end_block_attention,
                                                    _shard_plan)
from viewformer_tpu.parallel import mesh as mesh_lib

B, H, T, L, DH = 4, 4, 4, 8, 32


def _rand(seed, *shape):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), jnp.float32)


@pytest.fixture
def interpret_kernels(monkeypatch):
    for name in ('_run_block_causal', '_run_branch', '_run_block_causal_bwd',
                 '_run_branch_bwd', '_run_block_causal_do', '_run_branch_do',
                 '_run_block_causal_do_bwd', '_run_branch_do_bwd'):
        orig = getattr(ap, name)
        monkeypatch.setattr(
            ap, name,
            lambda *a, _orig=orig, **kw: _orig(*a, interpret=True))


def _mesh(data, seq=1, model=1):
    devices = jax.devices()
    need = data * seq * model
    if len(devices) < need:
        pytest.skip(f'needs {need} devices')
    return mesh_lib.create_mesh(data_parallelism=data, model_parallelism=model,
                                devices=devices[:need], seq_parallelism=seq)


def test_shard_plan_modes():
    mesh = _mesh(2, model=2)
    with mesh:
        assert _shard_plan(B, H) == (mesh, 'data', 'model')
        # an IN-USE axis that cannot be evenly partitioned -> dense (a
        # partial wrap would replicate that axis's work; dense partitions it)
        assert _shard_plan(B, 3) == 'dense'
        assert _shard_plan(3, 3) == 'dense'
    assert _shard_plan(B, H) is None                       # no mesh in scope
    one = _mesh(1)
    with one:
        assert _shard_plan(B, H) is None                   # single device
    seq_only = _mesh(1, seq=2)
    with seq_only:
        # only unused axes >1: fully-replicated wrap keeps the fused kernel
        assert _shard_plan(3, 3) == (seq_only, None, None)


def test_use_fused_force_errors_on_unpartitionable_mesh():
    mesh = _mesh(2, model=2)
    qs = tuple(_rand(i, 3, 3, T, L, DH) for i in range(1))
    with mesh, pytest.raises(ValueError, match='cannot be evenly partitioned'):
        multi_end_block_attention(qs, qs, qs, use_fused=True)


def test_wrapped_fused_seq_only_mesh_replicated(interpret_kernels):
    """seq-only mesh: the fused kernel runs with fully replicated operands
    and still matches dense."""
    mesh = _mesh(1, seq=2)
    qs = tuple(_rand(i, B, H, T, L, DH) for i in range(2))
    ks = tuple(_rand(10 + i, B, H, T, L, DH) for i in range(2))
    vs = tuple(_rand(20 + i, B, H, T, L, DH) for i in range(2))
    dense0 = block_causal_attention(qs[0], ks[0], vs[0])
    with mesh:
        outs = jax.jit(lambda k, v, q: multi_end_block_attention(
            k, v, q, use_fused=True))(ks, vs, qs)
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(dense0), atol=2e-5)


def test_wrapped_fused_matches_dense_no_dropout(interpret_kernels):
    mesh = _mesh(2, seq=2, model=2)
    qs = tuple(_rand(i, B, H, T, L, DH) for i in range(3))
    ks = tuple(_rand(10 + i, B, H, T, L, DH) for i in range(3))
    vs = tuple(_rand(20 + i, B, H, T, L, DH) for i in range(3))

    dense0 = block_causal_attention(qs[0], ks[0], vs[0])
    denseb = branch_attention(jnp.stack(qs[1:]), ks[0], vs[0],
                              jnp.stack(ks[1:]), jnp.stack(vs[1:]))
    with mesh:
        outs = jax.jit(lambda k, v, q: multi_end_block_attention(
            k, v, q, use_fused=True))(ks, vs, qs)
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(dense0), atol=2e-5)
    for i in (1, 2):
        np.testing.assert_allclose(np.asarray(outs[i]), np.asarray(denseb[i - 1]),
                                   atol=2e-5)


def test_wrapped_fused_gradients_match_dense(interpret_kernels):
    mesh = _mesh(2, model=2)
    qs = tuple(_rand(i, B, H, T, L, DH) for i in range(2))
    ks = tuple(_rand(10 + i, B, H, T, L, DH) for i in range(2))
    vs = tuple(_rand(20 + i, B, H, T, L, DH) for i in range(2))

    def loss(fused):
        def f(k, v, q):
            outs = multi_end_block_attention(k, v, q, use_fused=fused)
            return sum(jnp.sum(o ** 2) for o in outs)
        return f

    g_dense = jax.grad(loss(False), argnums=(0, 1, 2))(ks, vs, qs)
    with mesh:
        g_fused = jax.jit(jax.grad(loss(True), argnums=(0, 1, 2)))(ks, vs, qs)
    for a, b in zip(jax.tree.leaves(g_dense), jax.tree.leaves(g_fused)):
        # f32 reduction order differs between the sharded accumulation and
        # the dense path; grads here are O(10)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-4)


def test_wrapped_fused_dropout_runs_and_is_deterministic(interpret_kernels):
    """Dropout noise under the wrap is per-shard (rng folded by shard index)
    — not comparable to the single-device stream, but it must be finite,
    deterministic for a fixed rng, and different for a different rng."""
    mesh = _mesh(2, model=2)
    qs = tuple(_rand(i, B, H, T, L, DH) for i in range(2))
    ks = tuple(_rand(10 + i, B, H, T, L, DH) for i in range(2))
    vs = tuple(_rand(20 + i, B, H, T, L, DH) for i in range(2))

    def run(key):
        return multi_end_block_attention(ks, vs, qs, dropout_rate=0.25,
                                         dropout_rng=key, use_fused=True)

    with mesh:
        f = jax.jit(run)
        a = f(jax.random.PRNGKey(0))
        b = f(jax.random.PRNGKey(0))
        c = f(jax.random.PRNGKey(1))
    for x, y in zip(a, b):
        assert np.isfinite(np.asarray(x)).all()
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert any(not np.array_equal(np.asarray(x), np.asarray(z))
               for x, z in zip(a, c))
