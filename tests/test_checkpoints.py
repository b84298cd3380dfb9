import jax
import jax.numpy as jnp
import numpy as np

from representationlearning_tpu.models.tscd import TSCD
from representationlearning_tpu.train import checkpoints as CK
from representationlearning_tpu.train.optim import make_poly_warmup_adamw
from representationlearning_tpu.train.state import TrainState


def test_orbax_save_restore_roundtrip(tmp_path):
    model = TSCD(backbone="mit_b0", num_classes=4)
    x = jnp.zeros((1, 32, 32, 3))
    v = model.init(jax.random.PRNGKey(0), x)
    tx = make_poly_warmup_adamw(1e-4, 0.01, 10, 100)
    state = TrainState.create(model.apply, v, tx)
    state = state.replace(step=jnp.asarray(7, jnp.int32))

    path = CK.save(str(tmp_path), 7, state)
    assert CK.latest_step(str(tmp_path)) == 7

    # perturb then restore
    zeroed = state.replace(
        params=jax.tree_util.tree_map(jnp.zeros_like, state.params),
        step=jnp.asarray(0, jnp.int32),
    )
    restored = CK.restore(str(tmp_path), zeroed)
    assert int(restored.step) == 7
    l0 = jax.tree_util.tree_leaves(state.params)[0]
    l1 = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))


def test_restore_missing_raises(tmp_path):
    import pytest

    model = TSCD(backbone="mit_b0", num_classes=4)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    state = TrainState.create(model.apply, v, make_poly_warmup_adamw(1e-4, 0.01, 10, 100))
    with pytest.raises(FileNotFoundError):
        CK.restore(str(tmp_path / "nope"), state)
