"""Config system tests (reference core/config.py semantics)."""
import pytest

from npp_tpu.config import Config, load_config


def test_defaults():
    cfg = Config()
    assert cfg.model.num_joints == 16
    assert cfg.dataset.num_classes == 20
    assert cfg.loss.ohem_keep == 131072


def test_load_reference_lip_yaml():
    cfg = load_config("experiments/lip/384_384.yaml")
    assert cfg.model.image_size == (384, 384)
    assert cfg.model.sigma == 3
    assert cfg.model.refine_layers == 1
    assert cfg.dataset.num_classes == 20
    assert cfg.dataset.num_joints == 16
    assert cfg.search.layers == 16
    assert cfg.search.batch_size == 7
    assert cfg.search.init_channels == 32
    assert cfg.train.init_channels == 64
    assert cfg.train.epochs == 190
    assert cfg.train.lr_step == (150, 170)
    assert cfg.train.ignore_label == 255
    assert cfg.test.scale_list == (0.5, 0.75, 1, 1.25, 1.5)
    assert cfg.test.flip_test is True


def test_load_reference_pascal_yaml():
    cfg = load_config("experiments/pascal/384_384.yaml")
    assert cfg.dataset.num_classes == 7
    assert cfg.dataset.num_joints == 14
    assert cfg.search.layers == 12


def test_unknown_key_raises(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("MODEL:\n  NOT_A_KEY: 1\n")
    with pytest.raises(ValueError):
        load_config(str(p))


def test_unknown_section_raises(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("NOT_A_SECTION:\n  X: 1\n")
    with pytest.raises(ValueError):
        load_config(str(p))


def test_overrides():
    cfg = load_config(None, overrides={"TRAIN": {"BATCH_SIZE": 4}})
    assert cfg.train.batch_size == 4
