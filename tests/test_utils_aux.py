import json
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from representationlearning_tpu.convert.coco2voc import (
    ann_to_mask, coco2voc, decode_uncompressed_rle,
)
from representationlearning_tpu.data.coco import CocoClsDataset, robust_read_image
from representationlearning_tpu.infer.drfl_eval import (
    binary_stats, threshold_sweep, write_html_gallery,
)
from representationlearning_tpu.train.optim import sgdr_schedule
from representationlearning_tpu.utils import visualize as V
from representationlearning_tpu.utils.affine import AffineAugmentation, apply_affine, get_affine_transform


def test_colormap_matches_reference_values():
    cmap = V.colormap()
    # canonical VOC colors
    assert tuple(cmap[0]) == (0, 0, 0)
    assert tuple(cmap[1]) == (128, 0, 0)
    assert tuple(cmap[2]) == (0, 128, 0)
    assert tuple(cmap[15]) == (192, 128, 128)
    assert tuple(cmap[255]) == (224, 224, 192)


def test_cam_overlay_and_grid():
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((4, 16, 16, 3)).astype(np.float32)
    cams = rng.random((4, 8, 8, 5)).astype(np.float32)
    over = V.cam_overlay(imgs, cams)
    assert over.shape == (4, 16, 16, 3) and over.dtype == np.uint8
    grid = V.make_grid(over, nrow=2)
    assert grid.ndim == 3


def test_palette_png_roundtrip(tmp_path):
    lab = np.arange(16).reshape(4, 4) % 5
    p = tmp_path / "lab.png"
    V.save_palette_png(lab, str(p))
    from PIL import Image

    back = np.asarray(Image.open(p))
    np.testing.assert_array_equal(back, lab)


def test_sgdr_schedule_restarts():
    sched = sgdr_schedule(1.0, steps_per_epoch=4, epoch_start=1, restart_mult=2,
                          total_steps=12)
    vals = [float(sched(i)) for i in range(12)]
    assert np.isclose(vals[0], 1.0)  # cos(0) peak
    # first restart at step 4: amplitude halves
    assert np.isclose(vals[4], 0.5)
    # within-window cosine decreases
    assert vals[1] < vals[0] and vals[5] < vals[4]


def test_affine_identity_and_warp():
    # identity transform maps unit square to itself
    src = np.array([(0, 0), (0, 1), (1, 1)], np.float32)
    M = get_affine_transform(src, src)
    np.testing.assert_allclose(M, [[1, 0, 0], [0, 1, 0]], atol=1e-6)

    aug = AffineAugmentation(patch_ratio=1.0, do_rotation=True,
                             rotation_max_angle=np.pi / 8)
    rng = np.random.default_rng(0)
    M = aug(rng)
    assert M.shape == (2, 3)
    x = jnp.asarray(np.random.default_rng(1).random((1, 16, 16, 3)).astype(np.float32))
    out = apply_affine(x, np.array([[1, 0, 0], [0, 1, 0]], np.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)


def test_coco_synthetic_dataset():
    ds = CocoClsDataset(crop_size=64, synthetic_n=4, synthetic_size=(80, 96))
    name, img, cls_label, box = ds[0]
    assert img.shape == (64, 64, 3) and cls_label.shape == (80,)


def test_coco2voc_polygon_and_rle(tmp_path):
    anns = {
        "images": [{"id": 7, "height": 10, "width": 12}],
        "annotations": [
            {"id": 100, "image_id": 7, "category_id": 3,
             "segmentation": [[2, 2, 8, 2, 8, 8, 2, 8]]},
            {"id": 101, "image_id": 7, "category_id": 5,
             "segmentation": {"size": [10, 12], "counts": [20, 5, 95]}},
        ],
    }
    p = tmp_path / "anns.json"
    p.write_text(json.dumps(anns))
    ids = coco2voc(str(p), str(tmp_path / "out"), compress=True)
    assert ids == [7]
    cls = np.load(tmp_path / "out/class_labels/7.npz")["arr_0"]
    assert cls.shape == (10, 12)
    assert 3 in cls and 5 in cls
    inst = np.load(tmp_path / "out/instance_labels/7.npz")["arr_0"]
    assert set(np.unique(inst)) == {0, 1, 2}

    m = decode_uncompressed_rle([3, 2, 5], 2, 5)
    assert m.sum() == 2


def test_drfl_binary_stats_and_sweep_gallery(tmp_path):
    pred = np.zeros((8, 8)); pred[:4] = 200
    gt = np.zeros((8, 8)); gt[:4, :4] = 200
    s = binary_stats(pred, gt, 150)
    assert s["sen"] == 1.0 and 0 < s["pre"] < 1

    html = write_html_gallery(str(tmp_path), [("case0", [("input", "a.png")])])
    assert os.path.exists(html)
    assert "case0" in open(html).read()


def test_metrics_writer_csv_png_and_tensorboard(tmp_path):
    """The observability sink writes CSV scalars + PNG images always, and mirrors
    into real TensorBoard event files when the tensorboard package is available
    (reference parity: `SCD dist_train_voc.py:250,393-413`)."""
    from representationlearning_tpu.utils.events import MetricsWriter

    d = str(tmp_path / "events")
    w = MetricsWriter(d)
    w.add_scalar("loss/total", 1.5, 10)
    w.add_scalars({"miou": 0.5}, 20, prefix="val/")
    w.add_image("cam/overlay", np.random.default_rng(0).random((16, 16, 3)), 10)
    w.flush()
    w.close()

    rows = open(os.path.join(d, "scalars.csv")).read().strip().splitlines()
    assert rows[0] == "step,tag,value" and len(rows) == 3
    assert os.listdir(os.path.join(d, "images")) == ["cam_overlay_0000010.png"]
    try:
        import torch.utils.tensorboard  # noqa: F401
    except Exception:
        return
    assert any(f.startswith("events.out.tfevents") for f in os.listdir(d))
