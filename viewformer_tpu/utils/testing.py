"""Cross-framework parity harness: torch modules vs jax apply functions.

Parity target: /root/reference/viewformer/utils/testing.py —
`assert_modules_same` validated the reference's TF reimplementation against
its torch original (forward outputs, a random-weighted scalar loss, and input
gradients, with NCHW<->NHWC handling). This is the same instrument for the
jax rebuild: import weights from a torch module, then assert the jax model
reproduces outputs and gradients. Used by the checkpoint-importer tests and
available to users porting their own checkpoints.
"""
import numpy as np


def _to_nhwc(x):
    if x.ndim == 4:
        return np.transpose(x, (0, 2, 3, 1))
    return x


def _to_nchw(x):
    if x.ndim == 4:
        return np.transpose(x, (0, 3, 1, 2))
    return x


def assert_outputs_same(torch_module, jax_apply, input_shape, *, seed=0,
                        atol=1e-4, channels_last_jax=True):
    """Assert torch_module(x) == jax_apply(x) on random input.

    torch_module: a torch nn.Module taking NCHW input.
    jax_apply: callable taking a numpy NHWC (or same-layout) array.
    input_shape: torch-layout input shape (e.g. [B, C, H, W])."""
    import torch

    rng = np.random.RandomState(seed)
    x = rng.randn(*input_shape).astype(np.float32)
    with torch.no_grad():
        torch_out = torch_module(torch.from_numpy(x))
    torch_out = _unpack(torch_out)
    jax_in = _to_nhwc(x) if channels_last_jax else x
    jax_out = _unpack(jax_apply(jax_in))
    assert len(torch_out) == len(jax_out), \
        f'output arity mismatch: {len(torch_out)} vs {len(jax_out)}'
    for i, (a, b) in enumerate(zip(torch_out, jax_out)):
        a = np.asarray(a.detach().numpy() if hasattr(a, 'detach') else a)
        b = np.asarray(b)
        if channels_last_jax and a.ndim == 4:
            a = _to_nhwc(a)
        np.testing.assert_allclose(b, a, atol=atol,
                                   err_msg=f'output {i} differs')
    return True


def assert_gradients_same(torch_module, jax_loss_fn, input_shape, *, seed=0,
                          atol=1e-4, channels_last_jax=True):
    """Assert d(scalar random-weighted loss)/d(input) matches across
    frameworks (the reference's strongest check, testing.py:98-186)."""
    import jax
    import jax.numpy as jnp
    import torch

    rng = np.random.RandomState(seed)
    x = rng.randn(*input_shape).astype(np.float32)

    x_th = torch.from_numpy(x).requires_grad_(True)
    out_th = _unpack(torch_module(x_th))
    weights = [torch.from_numpy(rng.randn(*o.shape).astype(np.float32))
               for o in out_th]
    loss_th = sum((o * w).sum() for o, w in zip(out_th, weights))
    loss_th.backward()
    grad_th = x_th.grad.numpy()

    weights_np = [w.numpy() for w in weights]

    def loss_jax(x_in):
        outs = _unpack(jax_loss_fn(x_in))
        total = 0.0
        for i, o in enumerate(outs):
            w = weights_np[i]
            if channels_last_jax and w.ndim == 4:
                w = _to_nhwc(w)
            total = total + jnp.sum(o * jnp.asarray(w))
        return total

    jax_in = _to_nhwc(x) if channels_last_jax else x
    grad_jax = np.asarray(jax.grad(loss_jax)(jnp.asarray(jax_in)))
    if channels_last_jax and grad_jax.ndim == 4:
        grad_jax = _to_nchw(grad_jax)
    np.testing.assert_allclose(grad_jax, grad_th, atol=atol,
                               err_msg='input gradients differ')
    return True


def _unpack(out):
    if isinstance(out, (tuple, list)):
        return list(out)
    if isinstance(out, dict):
        return [out[k] for k in sorted(out)]
    return [out]
