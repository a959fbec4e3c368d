"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slotvps_tpu.parallel.mesh import (
    batch_sharding, make_mesh, param_sharding, replicated)

needs_8 = pytest.mark.skipif(jax.device_count() < 8,
                             reason="needs 8 devices")


@needs_8
def test_make_mesh_shapes():
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh()
    assert mesh.shape["data"] == 8


@needs_8
def test_data_parallel_psum():
    mesh = make_mesh(n_data=8)
    x = jnp.arange(8.0)
    y = jax.device_put(x, batch_sharding(mesh))

    @jax.jit
    def f(v):
        return v.sum()

    assert float(f(y)) == 28.0


@needs_8
def test_param_sharding_tp_ffn():
    from slotvps_tpu.config import SlotHeadConfig
    from slotvps_tpu.models.slot_head import init_slot_head

    mesh = make_mesh(n_data=4, n_model=2)
    params = {"slot_head": init_slot_head(jax.random.PRNGKey(0),
                                          SlotHeadConfig())}
    shardings = param_sharding(params, mesh)
    s0 = shardings["slot_head"]["stages"][0]
    # FFN column/row parallel
    assert s0["linear1"]["w"].spec == jax.sharding.PartitionSpec(None, "model")
    assert s0["linear2"]["w"].spec == jax.sharding.PartitionSpec("model", None)
    # norms replicated
    assert s0["norm1"]["scale"].spec == jax.sharding.PartitionSpec()
    # placing params with these shardings must work
    placed = jax.device_put(params, shardings)
    assert placed["slot_head"]["stages"][0]["linear1"]["w"].sharding.spec \
        == jax.sharding.PartitionSpec(None, "model")


@needs_8
@pytest.mark.slow
def test_dryrun_multichip_trains():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


@needs_8
def test_sharded_inference_step_matches_single():
    """Data-parallel batched decode over the mesh == single-device result."""
    from slotvps_tpu.config import SlotHeadConfig
    from slotvps_tpu.models.slot_head import apply_slot_head, init_slot_head
    from slotvps_tpu.models.position_encoding import sine_position_embedding

    cfg = SlotHeadConfig(per_dh_num_heads=(1, 1, 1, 1), dh_num_heads=4,
                         apply_temporal_query_atten_stages=(2, 3))
    params = init_slot_head(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b = 8
    shapes = [(2, 4), (4, 8), (8, 16), (16, 32)]
    feats = [[jnp.asarray(rng.standard_normal((b, h, w, 128)),
                          jnp.float32) for h, w in shapes]
             for _ in range(2)]
    pos = [[sine_position_embedding(h, w) for h, w in shapes]
           for _ in range(2)]
    queries = jnp.asarray(rng.standard_normal((16, 256)), jnp.float32)

    def run(feats):
        logits, embeds, _ = apply_slot_head(params, cfg, feats, queries, pos)
        return logits[1][-1]

    single = jax.jit(run)(feats)

    mesh = make_mesh(n_data=8)
    sh = batch_sharding(mesh)
    feats_sharded = [[jax.device_put(f, sh) for f in ff] for ff in feats]
    with mesh:
        sharded = jax.jit(run)(feats_sharded)
    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded),
                               rtol=2e-4, atol=2e-4)
