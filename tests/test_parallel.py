import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from representationlearning_tpu.parallel import collectives as C
from representationlearning_tpu.parallel import mesh as Mz


def test_make_mesh_8(devices8):
    m = Mz.make_mesh()
    assert m.shape[Mz.DATA_AXIS] * m.shape[Mz.MODEL_AXIS] == 8


def test_pmean_tree(devices8):
    m = Mz.make_mesh(n_data=8)
    x = jnp.arange(8, dtype=jnp.float32).reshape(8, 1)

    def f(v):
        return C.pmean_tree({"g": v}, Mz.DATA_AXIS)["g"]

    out = shard_map(f, mesh=m, in_specs=P(Mz.DATA_AXIS), out_specs=P(Mz.DATA_AXIS))(x)
    np.testing.assert_allclose(np.asarray(out).ravel(), np.full(8, 3.5))


def test_halo_exchange(devices8):
    m = Mz.make_mesh(n_data=1, n_model=8)
    # 8 shards of 4 rows each, global 32 rows
    x = jnp.arange(32.0).reshape(32, 1)

    def f(v):
        return C.halo_exchange_1d(v, halo=1, axis=0, axis_name=Mz.MODEL_AXIS)

    out = shard_map(
        f, mesh=m, in_specs=P(Mz.MODEL_AXIS, None), out_specs=P(Mz.MODEL_AXIS, None)
    )(x)
    out = np.asarray(out).reshape(8, 6)
    # middle shard 3: rows 12..15 with halos 11 and 16
    np.testing.assert_allclose(out[3], [11, 12, 13, 14, 15, 16])
    # first shard: left halo zero
    np.testing.assert_allclose(out[0], [0, 0, 1, 2, 3, 4])
    # last shard: right halo zero
    np.testing.assert_allclose(out[7], [27, 28, 29, 30, 31, 0])


def test_sync_batch_stats(devices8):
    m = Mz.make_mesh(n_data=8)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((64, 5)).astype(np.float32)

    def f(v):
        mean = jnp.mean(v, axis=0)
        var = jnp.var(v, axis=0)
        return C.sync_batch_stats(mean, var, Mz.DATA_AXIS)

    gm, gv = shard_map(f, mesh=m, in_specs=P(Mz.DATA_AXIS), out_specs=(P(), P()))(x)
    np.testing.assert_allclose(np.asarray(gm), x.mean(0), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gv), x.var(0), rtol=1e-4, atol=1e-5)


def test_pad_to_multiple():
    x = np.ones((5, 3))
    p, n = Mz.pad_to_multiple(x, 4)
    assert p.shape == (8, 3) and n == 5
