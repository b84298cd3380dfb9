import jax
import jax.numpy as jnp
import numpy as np
import torch
import pytest

pytestmark = pytest.mark.slow  # heavyweight tier; deselect with -m 'not slow'

from representationlearning_tpu.data.medical import DRFLPairedDataset, collate_drfl
from representationlearning_tpu.losses import dice as D
from representationlearning_tpu.models.dcl import ConvTranspose, Softnet
from representationlearning_tpu.train.drfl import (
    DRFLConfig, create_drfl_state, make_drfl_train_step, train_drfl, validate,
    load_checkpoint, save_checkpoint,
)


def test_conv_transpose_matches_torch():
    torch.manual_seed(0)
    for k, s, p in [(4, 2, 1), (3, 1, 1)]:
        tconv = torch.nn.ConvTranspose2d(5, 7, k, s, p, bias=True)
        rng = np.random.default_rng(k)
        x = rng.standard_normal((2, 8, 8, 5)).astype(np.float32)
        with torch.no_grad():
            ref = tconv(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
        m = ConvTranspose(7, k, s, p)
        # torch weight (in, out, kh, kw) -> flax (kh, kw, in, out), spatially flipped
        w = tconv.weight.detach().numpy()[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
        params = {"kernel": jnp.asarray(np.ascontiguousarray(w)),
                  "bias": jnp.asarray(tconv.bias.detach().numpy())}
        out = m.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_dice_bce_matches_torch():
    rng = np.random.default_rng(1)
    y_true = (rng.random((2, 8, 8, 1)) > 0.5).astype(np.float32)
    y_pred = rng.random((2, 8, 8, 1)).astype(np.float32).clip(1e-4, 1 - 1e-4)
    ours = float(D.dice_bce_loss(jnp.asarray(y_true), jnp.asarray(y_pred)))
    bce = torch.nn.BCELoss()(torch.from_numpy(y_pred), torch.from_numpy(y_true))
    i, j = y_true.sum(), y_pred.sum()
    inter = (y_true * y_pred).sum()
    ref = (float(bce) + (1 - 2 * inter / (i + j))) / 2
    assert np.isclose(ours, ref, rtol=1e-5)


def test_softnet_output_shapes():
    model = Softnet(input_nc=3, num_vit_layers=1)
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x)
    out, out2, binm, d5a, d5sra = model.apply(v, x)
    assert out.shape == (1, 64, 64, 1)        # seg at input res
    assert out2.shape == (1, 128, 128, 1)     # sr stream at 2x
    assert binm.shape == (1, 64, 64, 1)       # refinement at input res
    assert d5a.shape == (1, 32, 32, 64)
    for t in (out, out2, binm):
        arr = np.asarray(t)
        assert arr.min() >= 0.0 and arr.max() <= 1.0  # sigmoid heads


def test_drfl_dataset_and_train_epoch(tmp_path):
    ds = DRFLPairedDataset(crop_size=64, synthetic_n=4, synthetic_size=64)
    s = ds[0]
    assert s["A"].shape == (64, 64, 3) and s["B"].shape == (64, 64, 1)
    assert s["C"].shape == (128, 128, 1)  # SR prior at 2x
    assert -1.0 <= s["A"].min() and s["A"].max() <= 1.0

    model = Softnet(input_nc=3, num_vit_layers=1)

    def batches():
        yield collate_drfl([ds[i] for i in range(2)])

    state, history = train_drfl(
        model, batches, batches, DRFLConfig(lr=1e-4), (64, 64, 3),
        epochs=2, work_dir=str(tmp_path),
    )
    assert len(history) == 2
    assert all(np.isfinite(h["loss"]) for h in history)
    assert 0.0 <= history[-1]["dice"] <= 1.0
    assert (tmp_path / "net_best.npy").exists() and (tmp_path / "net_latest.npy").exists()

    # resume path (`continue_train`)
    state2 = load_checkpoint(str(tmp_path), "latest", state)
    assert int(state2.step) == int(state.step)
