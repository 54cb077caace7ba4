"""generate-codes transformer: pipelined dispatch + mesh sharding must not
change results (the e2e CLI test covers the full shard-walking command)."""
import numpy as np

import jax

from viewformer_tpu.commands.generate_codes import LatentCodeTransformer
from viewformer_tpu.config import VQGANConfig
from viewformer_tpu.models.vqgan import VQGAN
from viewformer_tpu.parallel import mesh as mesh_lib

CCONFIG = VQGANConfig(ch=32, ch_mult=[1, 2], num_res_blocks=1,
                      attn_resolutions=[], z_channels=32, embed_dim=8,
                      n_embed=16, image_size=16, perceptual_weight=0.0)


def _items(rng, counts):
    import jax.numpy as jnp  # noqa: F401
    return [dict(frames=rng.randint(0, 256, (n, 16, 16, 3)).astype(np.uint8),
                 cameras=rng.randn(n, 7).astype(np.float32))
            for n in counts]


def test_mesh_and_pipelining_match_single_device():
    """Sequences of uneven length cross batch boundaries; the one-in-flight
    pipeline and the data-axis sharded encode must reassemble identical
    (cameras, codes) outputs to a plain single-device pass."""
    model = VQGAN(CCONFIG)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    variables = model.init({'params': k1, 'quantizer': k2},
                           np.zeros((1, 16, 16, 3), np.float32), training=False)
    rng = np.random.RandomState(0)
    items = _items(rng, [5, 9, 2, 4])

    single = LatentCodeTransformer(model, variables, batch_size=4)
    out_single = list(single('train', iter(items)))

    mesh = mesh_lib.create_mesh_for_batch(4)
    assert mesh.shape['data'] > 1  # 8 virtual CPU devices in conftest
    sharded = LatentCodeTransformer(model, variables, batch_size=4, mesh=mesh)
    out_mesh = list(sharded('train', iter(items)))

    assert len(out_single) == len(out_mesh) == len(items)
    for a, b, item in zip(out_single, out_mesh, items):
        np.testing.assert_array_equal(a['cameras'], item['cameras'])
        np.testing.assert_array_equal(a['codes'], b['codes'])
        assert a['codes'].shape[0] == len(item['frames'])
        np.testing.assert_array_equal(a['cameras'], b['cameras'])
