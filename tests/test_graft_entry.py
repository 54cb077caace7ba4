"""Guard the driver artifacts: __graft_entry__.entry() and dryrun_multichip.

entry()'s closure-captured params silently rotted into 20+ minute compiles
(round 2); tracing the returned fn over its example args catches
closure/argument mismatches without paying a full compile."""
import pytest

import jax

import __graft_entry__


@pytest.mark.slow
def test_entry_returns_jittable_fn_and_args():
    fn, args = __graft_entry__.entry()
    # params must travel in args (closure capture bakes them into the HLO)
    assert isinstance(args[0], dict) and 'params' in args[0]
    out = jax.eval_shape(fn, *args)  # full trace, no compile
    loss, logits = out
    assert logits.shape == (1, 20, 8, 8, 1024)
    assert loss.shape in ((), (1,))


@pytest.mark.slow
def test_dryrun_multichip_subprocess():
    """The driver's multi-chip check end to end (subprocess re-exec on a
    forced 2-device CPU platform, full dp train steps)."""
    __graft_entry__.dryrun_multichip(2)
