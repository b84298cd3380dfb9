"""CLI smoke tests: every entry point runs a tiny synthetic recipe end-to-end."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight tier; deselect with -m 'not slow'


def test_train_scd_cli(tmp_path):
    from representationlearning_tpu.cli.train_scd import main

    state = main([
        "--config", "configs/scd_voc.yaml",
        "backbone.config=mit_b0",
        "dataset.crop_size=64", "dataset.num_classes=6", "dataset.synthetic_n=8",
        "train.max_iters=2", "train.cam_iters=-1", "train.eval_iters=2",
        "train.log_iters=1", "train.samples_per_gpu=1",
        f"work_dir.dir={tmp_path}",
    ])
    assert int(state.step) == 2
    import os

    assert os.path.isdir(os.path.join(tmp_path, "checkpoints", "step_2"))


def test_train_scd_cli_device_augment(tmp_path):
    """Fused on-device augmentation path: raw uint8 canvases in, the
    scale/flip/pad/crop/normalize chain jitted into the train step
    (`data/device_transforms.py`)."""
    from representationlearning_tpu.cli.train_scd import main

    state = main([
        "--config", "configs/scd_voc.yaml",
        "backbone.config=mit_b0",
        "dataset.crop_size=64", "dataset.num_classes=6", "dataset.synthetic_n=8",
        "dataset.device_augment=true", "dataset.canvas_size=128",
        "train.max_iters=2", "train.cam_iters=-1", "train.eval_iters=2",
        "train.log_iters=1", "train.samples_per_gpu=1",
        f"work_dir.dir={tmp_path}",
    ])
    assert int(state.step) == 2


def test_rssformer_cli_train_eval_predict(tmp_path):
    from representationlearning_tpu.cli.rssformer import main

    wd = str(tmp_path / "wd")
    common = [
        "--config", "configs/rssformer_loveda.yaml",
        "model.hrnet_type=hrnetv2_w18", "data.crop_size=64", "data.batch_size=2",
        "data.synthetic_n=4", "train.num_iters=2", "train.log_interval_step=1",
        "train.eval_interval=2", f"work_dir={wd}",
    ]
    state = main(["train"] + common)
    assert int(state.step) == 2
    scores = main(["eval"] + common)
    assert 0.0 <= scores["miou"] <= 1.0
    out = main(["predict", "--out_dir", str(tmp_path / "pred")] + common)
    import os

    assert len(os.listdir(out)) == 4


def test_rssformer_cli_train_device_augment(tmp_path):
    """LoveDA chain fused on device: raw canvases + crop/fliprot/SSR/normalize
    inside the jitted train step."""
    from representationlearning_tpu.cli.rssformer import main

    state = main([
        "train", "--config", "configs/rssformer_loveda.yaml",
        "model.hrnet_type=hrnetv2_w18", "data.crop_size=64", "data.batch_size=2",
        "data.synthetic_n=4", "data.device_augment=true", "data.canvas_size=128",
        "train.num_iters=2", "train.log_interval_step=1", "train.eval_interval=2",
        f"work_dir={tmp_path / 'wd'}",
    ])
    assert int(state.step) == 2


def test_drfl_cli_train_and_sweep(tmp_path):
    from representationlearning_tpu.cli.train_drfl import main

    common = [
        "--config", "configs/drfl.yaml",
        "crop_size=64", "synthetic_size=64", "synthetic_n=2", "batch_size=2",
        "epochs=1", "num_vit_layers=1", f"output={tmp_path}",
    ]
    history = main(["train"] + common)
    assert len(history) == 1
    res = main(["test", "--sweep"] + common)
    assert "best_threshold" in res


def test_run_wavecam_cli(tmp_path):
    from representationlearning_tpu.cli.run_wavecam import main

    results = main([
        "--work_dir", str(tmp_path), "--crop_size", "48",
        "--cam_batch_size", "4", "--cam_epochs", "1",
        "--cam_learning_rate", "0.005",
        "--cam_scales", "1.0",
        "--train_cam_pass", "--make_cam_pass", "--eval_cam_pass",
    ])
    assert 0.0 <= results["eval_cam"] <= 1.0


def test_train_rml_cli(tmp_path):
    from representationlearning_tpu.cli.train_rml import main

    state = main([
        "--config", "configs/rml_voc.yaml",
        "backbone.config=mit_b0", "dataset.crop_size=64", "dataset.num_classes=6",
        "dataset.synthetic_n=8", "train.max_iters=1", "train.cam_iters=-1",
        "train.eval_iters=1", "train.log_iters=1", "train.samples_per_gpu=1",
        "cam.scales=[1.0,0.5]", f"work_dir={tmp_path}",
    ])
    assert int(state.step) == 1


def test_train_rml_cli_device_augment(tmp_path):
    from representationlearning_tpu.cli.train_rml import main

    state = main([
        "--config", "configs/rml_voc.yaml",
        "backbone.config=mit_b0", "dataset.crop_size=64", "dataset.num_classes=6",
        "dataset.synthetic_n=8", "dataset.device_augment=true",
        "dataset.canvas_size=128", "train.max_iters=1", "train.cam_iters=-1",
        "train.eval_iters=1", "train.log_iters=1", "train.samples_per_gpu=1",
        "cam.scales=[1.0,0.5]", f"work_dir={tmp_path}",
    ])
    assert int(state.step) == 1


def test_train_scd_cli_coco(tmp_path):
    """dataset.name=coco selects the COCO loaders inside the same trainer —
    the runnable equivalent of `scripts/dist_train_coco.py` (synthetic
    fallback; 81 classes shrunk for the smoke)."""
    from representationlearning_tpu.cli.train_scd import main

    state = main([
        "--config", "configs/scd_coco.yaml",
        "backbone.config=mit_b0",
        "dataset.crop_size=64", "dataset.num_classes=9", "dataset.synthetic_n=8",
        "train.max_iters=2", "train.cam_iters=-1", "train.eval_iters=2",
        "train.log_iters=1", "train.samples_per_gpu=1",
        f"work_dir.dir={tmp_path}",
    ])
    assert int(state.step) == 2


def test_train_rml_cli_coco(tmp_path):
    from representationlearning_tpu.cli.train_rml import main

    state = main([
        "--config", "configs/rml_coco.yaml",
        "backbone.config=mit_b0", "dataset.crop_size=64", "dataset.num_classes=9",
        "dataset.synthetic_n=8", "train.max_iters=1", "train.cam_iters=-1",
        "train.eval_iters=1", "train.log_iters=1", "train.samples_per_gpu=1",
        "cam.scales=[1.0,0.5]", f"work_dir={tmp_path}",
    ])
    assert int(state.step) == 1


def test_train_cli_coco_refuses_max_present(tmp_path):
    """A VOC-sized max_present cap silently drops classes from refinement on
    COCO (images can carry 10+ classes) — the CLI refuses it (ADVICE r4)."""
    import pytest

    from representationlearning_tpu.cli.train_scd import main

    with pytest.raises(ValueError, match="max_present"):
        main([
            "--config", "configs/scd_coco.yaml",
            "backbone.config=mit_b0", "dataset.crop_size=64",
            "dataset.num_classes=9", "dataset.synthetic_n=8",
            "dataset.max_present=8", "train.max_iters=1",
            f"work_dir.dir={tmp_path}",
        ])


def test_convert_checkpoint_cli(tmp_path):
    import torch
    import jax
    import jax.numpy as jnp
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_convert import _flatten, _mit_torch_names

    from representationlearning_tpu.cli.convert_checkpoint import main
    from representationlearning_tpu.models.mit import make_mit

    m = make_mit("mit_b0")
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    sd = {k: torch.from_numpy(np.ascontiguousarray(w))
          for k, w in _mit_torch_names(_flatten(v["params"])).items()}
    src = tmp_path / "mit.pth"
    torch.save(sd, src)
    dst = tmp_path / "mit.npy"
    out = main(["--family", "mit", "--src", str(src), "--dst", str(dst)])
    restored = np.load(dst, allow_pickle=True).item()
    feats, _ = m.apply({"params": restored["params"]}, jnp.zeros((1, 32, 32, 3)))
    assert feats[-1].shape == (1, 2, 2, 256)
