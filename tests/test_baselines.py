import jax
import jax.numpy as jnp
import numpy as np
import pytest

from representationlearning_tpu.core.registry import MODELS
from representationlearning_tpu.models import baselines  # noqa: F401 (registers)

pytestmark = pytest.mark.slow  # heavyweight tier; deselect with -m 'not slow'


@pytest.mark.parametrize("name,kwargs", [
    ("FarSegV1", {}),
    ("SemanticFPN", {}),
    ("PSPNet", {}),
    ("FCN8s", {}),
    ("AnyUNet", {"base": 8, "depth": 3}),
])
def test_baseline_train_eval_contract(name, kwargs):
    model = MODELS.build(name, classes=7, loss_config={"ce": {}}, **kwargs)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(-1, 7, (1, 64, 64)))
    v = model.init(jax.random.PRNGKey(0), x)
    probs = model.apply(v, x)
    assert probs.shape == (1, 64, 64, 7)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-4)
    loss_dict, _ = model.apply(v, x, y, train=True, mutable=["batch_stats"],
                               rngs={"dropout": jax.random.PRNGKey(1)})
    assert any(np.isfinite(float(val)) for val in loss_dict.values())


def test_semantic_fpn_decouple():
    m = MODELS.build("SemanticFPNDecouple", classes=7)
    x = jnp.zeros((1, 64, 64, 3))
    y = jnp.asarray(np.random.default_rng(0).integers(-1, 7, (1, 64, 64)))
    v = m.init(jax.random.PRNGKey(0), x)
    sig = m.apply(v, x)
    assert sig.shape == (1, 64, 64, 6)
    assert 0.0 <= float(sig.min()) and float(sig.max()) <= 1.0
    losses, _ = m.apply(v, x, y, train=True, mutable=["batch_stats"])
    assert np.isfinite(float(losses["multi_binary"]))
