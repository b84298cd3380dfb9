from representationlearning_tpu.core.config import Config, _parse_literal


def test_attr_access_and_merge():
    cfg = Config({"train": {"max_iters": 100}, "cam": {"scales": [1, 0.5]}})
    assert cfg.train.max_iters == 100
    cfg.merge({"train": {"max_iters": 200, "lr": 1e-4}})
    assert cfg.train.max_iters == 200 and cfg.train.lr == 1e-4
    assert cfg.cam.scales == [1, 0.5]


def test_dotted_overrides_equals_style():
    cfg = Config()
    cfg.apply_overrides(["train.max_iters=50", "cam.scales=[1,0.5,1.5]", "name=voc"])
    assert cfg.train.max_iters == 50
    assert cfg.cam.scales == [1, 0.5, 1.5]
    assert cfg.name == "voc"


def test_dotted_overrides_pair_style():
    # RSSFormer scripts/train.sh style: "train.eval_interval_epoch 20"
    cfg = Config()
    cfg.apply_overrides(["train.eval_interval_epoch", "20"])
    assert cfg.train.eval_interval_epoch == 20


def test_literal_parse():
    assert _parse_literal("1e-4") == 1e-4
    assert _parse_literal("true") == "true"  # not python literal; stays string
    assert _parse_literal("[1, 2]") == [1, 2]


def test_to_dict_roundtrip():
    cfg = Config({"a": {"b": [1, {"c": 2}]}})
    d = cfg.to_dict()
    assert d == {"a": {"b": [1, {"c": 2}]}}
    assert not isinstance(d["a"], Config)
