"""Train+eval smoke tests for the smp-equivalent baseline zoo
(`RSSFormer-TIP2023/module/baseline/unet.py:38-217`, `trans.py:44-91`): each model is
registered, runs one gradient step with a finite loss, and produces eval softmax."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from representationlearning_tpu.core.registry import MODELS
import representationlearning_tpu.models  # noqa: F401  (populates the registry)

ZOO = ["UNetPP", "LinkNet", "DeepLabV3", "DeepLabV3Plus", "MANet", "PAN"]


@pytest.mark.slow
@pytest.mark.parametrize("name", ZOO + ["trans"])
def test_zoo_member_train_and_eval(name, rng):
    cls = MODELS.get(name)
    kwargs = {"classes": 4, "loss_config": {"ce": {}}}
    if name == "trans":
        kwargs["hrnet_type"] = "hrnetv2_w18"
    model = cls(**kwargs)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 4, (1, 64, 64)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, y, train=True)

    def loss_fn(params):
        v = {"params": params, **{k: w for k, w in variables.items() if k != "params"}}
        out, _ = model.apply(v, x, y, train=True, mutable=["batch_stats"])
        return sum(jax.tree_util.tree_leaves(out))

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss)), name
    gnorm = optax.global_norm(grads)
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0, name

    prob = model.apply(variables, x)
    assert prob.shape == (1, 64, 64, 4), (name, prob.shape)
    np.testing.assert_allclose(np.asarray(prob.sum(-1)), 1.0, rtol=1e-4)
