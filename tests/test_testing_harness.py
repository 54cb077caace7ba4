"""Tests for the cross-framework parity harness itself."""
import numpy as np
import pytest

import jax.numpy as jnp

from viewformer_tpu.utils.testing import assert_gradients_same, assert_outputs_same


@pytest.fixture()
def torch_linear_pair():
    torch = pytest.importorskip('torch')
    import torch.nn as tnn

    torch.manual_seed(0)
    module = tnn.Sequential(tnn.Linear(8, 16), tnn.Tanh(), tnn.Linear(16, 4))
    weights = [(module[0].weight.detach().numpy(), module[0].bias.detach().numpy()),
               (module[2].weight.detach().numpy(), module[2].bias.detach().numpy())]

    def jax_apply(x):
        h = jnp.asarray(x) @ weights[0][0].T + weights[0][1]
        h = jnp.tanh(h)
        return h @ weights[1][0].T + weights[1][1]

    return module, jax_apply


def test_outputs_same_passes_for_equivalent(torch_linear_pair):
    module, jax_apply = torch_linear_pair
    assert assert_outputs_same(module, jax_apply, (3, 8), channels_last_jax=False)


def test_outputs_same_detects_mismatch(torch_linear_pair):
    module, jax_apply = torch_linear_pair
    broken = lambda x: jax_apply(x) + 0.01  # noqa: E731
    with pytest.raises(AssertionError):
        assert_outputs_same(module, broken, (3, 8), channels_last_jax=False)


def test_gradients_same(torch_linear_pair):
    module, jax_apply = torch_linear_pair
    assert assert_gradients_same(module, jax_apply, (3, 8), channels_last_jax=False)


def test_gradients_detect_mismatch(torch_linear_pair):
    module, jax_apply = torch_linear_pair
    broken = lambda x: jax_apply(x * 1.01)  # noqa: E731
    with pytest.raises(AssertionError):
        assert_gradients_same(module, broken, (3, 8), channels_last_jax=False)


def test_nchw_nhwc_handling():
    torch = pytest.importorskip('torch')
    import torch.nn as tnn

    torch.manual_seed(1)
    conv = tnn.Conv2d(3, 8, 3, padding=1)
    w = conv.weight.detach().numpy()
    b = conv.bias.detach().numpy()

    def jax_apply(x_nhwc):
        import jax
        return jax.lax.conv_general_dilated(
            jnp.asarray(x_nhwc), jnp.asarray(w.transpose(2, 3, 1, 0)),
            (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            precision=jax.lax.Precision.HIGHEST) + b

    assert assert_outputs_same(conv, jax_apply, (2, 3, 8, 8))
    assert assert_gradients_same(conv, jax_apply, (2, 3, 8, 8))
