"""End-to-end WaveCAM pipeline on synthetic data (tiny config): every stage runs,
artifacts chain on disk, final pseudo-label mIoU is a valid number."""
import numpy as np
import pytest

from representationlearning_tpu.wsss.wavecam_pipeline import WaveCAMConfig, WaveCAMPipeline

pytestmark = pytest.mark.slow  # heavyweight tier; deselect with -m 'not slow'


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    cfg = WaveCAMConfig(
        work_dir=str(tmp_path_factory.mktemp("wavecam")),
        n_classes=5,
        crop_size=48,
        cam_scales=(1.0, 0.5),
        cam_batch_size=4,
        cam_epochs=1,
        cam_lr=0.005,
        wavecam_lr=0.005,
        irn_lr=0.005,
        wavecam_epochs=1,
        irn_crop_size=48,
        irn_batch_size=4,
        irn_epochs=1,
        irn_radius=3.0,
        rw_radius=3,
        exp_times=2,
        synthetic_n=8,
        synthetic_size=(48, 48),
    )
    return WaveCAMPipeline(cfg)


def test_full_pipeline(pipeline):
    results = pipeline.run([
        "train_cam", "train_wavecam", "make_cam", "eval_cam",
        "cam_to_ir_label", "train_irn", "make_sem_seg", "eval_sem_seg",
    ])
    assert 0.0 <= results["eval_cam"] <= 1.0
    assert 0.0 <= results["eval_sem_seg"] <= 1.0

    import os

    cfg = pipeline.cfg
    assert len(os.listdir(cfg.dir("cam"))) == cfg.synthetic_n
    assert len(os.listdir(cfg.dir("ir_label"))) == cfg.synthetic_n
    assert len(os.listdir(cfg.dir("sem_seg"))) == cfg.synthetic_n

    # ir labels are ternary {0, class, 255}
    lab = np.load(os.path.join(cfg.dir("ir_label"), "synthetic_000000.npy"))
    assert set(np.unique(lab)).issubset(set(range(cfg.n_classes + 1)) | {255})


def test_make_wavecam_uses_reweighted_classifier(pipeline):
    pipeline.run(["make_wavecam"])  # depends on artifacts from test_full_pipeline
    import os

    assert len(os.listdir(pipeline.cfg.dir("cam"))) == pipeline.cfg.synthetic_n


def test_full_pipeline_coco_source(tmp_path):
    """COCO source branch (`wavecam_pipeline.py:85-89`, the run_wavecam_coco.py
    mirror): a file-backed COCO-14-shaped tree (JPEGImages/train2014 + masks +
    name list) drives the full stage chain through `CocoSource`."""
    import os

    from PIL import Image

    from representationlearning_tpu.data.coco import CocoSource

    root = tmp_path / "coco14"
    (root / "JPEGImages" / "train2014").mkdir(parents=True)
    (root / "SegmentationClass" / "train2014").mkdir(parents=True)
    lists = tmp_path / "lists"
    lists.mkdir()
    rng = np.random.default_rng(3)
    n_classes = 4
    names = [f"COCO_train2014_{i:012d}" for i in range(6)]
    with open(lists / "train.txt", "w") as f:
        for name in names:
            img = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
            mask = np.zeros((48, 48), np.uint8)
            cls = int(rng.integers(1, n_classes + 1))
            mask[10:30, 10:30] = cls
            Image.fromarray(img).save(root / "JPEGImages" / "train2014" / f"{name}.jpg")
            Image.fromarray(mask).save(
                root / "SegmentationClass" / "train2014" / f"{name}.png")
            f.write(name + "\n")

    cfg = WaveCAMConfig(
        work_dir=str(tmp_path / "work"),
        n_classes=n_classes,
        crop_size=48,
        cam_scales=(1.0,),
        cam_batch_size=3,
        cam_epochs=1,
        cam_lr=0.005,
        wavecam_lr=0.005,
        wavecam_epochs=1,
        irn_lr=0.005,
        irn_crop_size=48,
        irn_batch_size=3,
        irn_epochs=1,
        irn_radius=3.0,
        rw_radius=3,
        exp_times=2,
        coco_root=str(root),
        name_list_dir=str(lists),
        split="train",
    )
    pipe = WaveCAMPipeline(cfg)
    assert isinstance(pipe.source, CocoSource)
    results = pipe.run([
        "train_cam", "train_wavecam", "make_cam", "eval_cam",
        "cam_to_ir_label", "train_irn", "make_sem_seg", "eval_sem_seg",
    ])
    assert 0.0 <= results["eval_cam"] <= 1.0
    assert 0.0 <= results["eval_sem_seg"] <= 1.0
    assert len(os.listdir(cfg.dir("cam"))) == len(names)
    assert len(os.listdir(cfg.dir("sem_seg"))) == len(names)
