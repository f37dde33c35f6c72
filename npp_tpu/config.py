"""Typed configuration system.

TPU-native re-design of the reference's global ``easydict`` config
(``core/config.py:18-295`` in GuHuangAI/NPP): instead of a mutable module-level
singleton, configs are immutable dataclasses produced by :func:`load_config`.
YAML overrides are validated the same way the reference's ``_update_dict`` is
(unknown keys raise), and the shipped reference experiment YAMLs
(``experiments/lip/384_384.yaml``, ``experiments/pascal/384_384.yaml``) parse
directly.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any

import yaml


def _tuple2(v) -> tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    a, b = v
    return (int(a), int(b))


@dataclass(frozen=True)
class ModelConfig:
    """Mirrors reference ``config.MODEL`` (core/config.py:37-55)."""

    num_joints: int = 16
    image_size: tuple[int, int] = (384, 384)  # (width, height)
    target_type: str = "gaussian"
    heatmap_size: tuple[int, int] = (96, 96)  # (width, height)
    sigma: int = 3
    final_conv_kernel: int = 1
    head: str = "PSP"
    refine_layers: int = 1
    decoder_layers: int = 4
    deconv_with_bias: bool = False
    pretrained_pose: str = ""
    pretrained_par: str = ""
    # Unused-by-forward keys kept for YAML compatibility.
    num_deconv_layers: int = 3
    num_deconv_filters: tuple[int, ...] = (256, 256, 256)
    num_deconv_kernels: tuple[int, ...] = (4, 4, 4)
    num_layers: int = 50
    name: str = "nppnet"
    style: str = "pytorch"


@dataclass(frozen=True)
class LossConfig:
    """Mirrors reference ``config.LOSS`` (core/config.py:121-127)."""

    use_ohem: bool = False
    topk: int = 8
    # Reference config defaults True (core/config.py:124) but both released
    # CLIs hard-code Criterion_pose(use_target_weight=False)
    # (search_lip_sync.py:264, augment_lip_sync.py:187); False is the
    # effective released behavior, and this knob is actually honored here.
    use_target_weight: bool = False
    use_different_joints_weight: bool = False
    ohem_thres: float = 0.9
    ohem_keep: int = 131072


@dataclass(frozen=True)
class DatasetConfig:
    """Mirrors reference ``config.DATASET`` (core/config.py:130-156)."""

    root: str = ""
    dataset: str = "lip"
    train_set: str = "train"
    test_set: str = "valid"
    data_format: str = "jpg"
    num_classes: int = 20
    num_joints: int = 16
    train_imroot: str = ""
    val_imroot: str = ""
    test_imroot: str = ""
    train_segroot: str = ""
    val_segroot: str = ""
    extra_train_set: str = ""
    flip: bool = True
    scale_factor: float = 0.25
    rot_factor: float = 30
    prob_half_body: float = 0.0
    num_joints_half_body: int = 8
    color_rgb: bool = False
    select_data: bool = False
    hybrid_joints_type: str = ""


@dataclass(frozen=True)
class SearchConfig:
    """Mirrors reference ``config.SEARCH`` (core/config.py:159-181)."""

    w_lr: float = 0.001
    lr_factor: float = 0.2
    lr_step: tuple[int, ...] = (20, 40)
    w_lr_min: float = 0.00001
    momentum: float = 0.9
    weight_decay: float = 0.0001
    nesterov: bool = False
    init_epochs: int = 20
    epochs: int = 60
    batch_size: int = 32
    layers: int = 10
    init_channels: int = 32
    resume: bool = False
    alpha_lr: float = 0.0004
    alpha_weight_decay: float = 0.0001
    seed: int = 2
    w_gradclip: float = 5
    train_set: str = "train_train"
    mini_set: str = "train_a"
    test_set: str = "train_valid"
    name: str = "mpii"
    path: str = "searchs"
    # Epoch at which weight-only warmup ends and alternating bi-level
    # optimization begins (search_lip_sync.py:326-328 hard-codes 15).
    warmup_epochs: int = 15
    # Epoch after which entropy regularization is added (core/function.py:612).
    entropy_epoch: int = 70


@dataclass(frozen=True)
class TrainConfig:
    """Mirrors reference ``config.TRAIN`` (core/config.py:186-217)."""

    lr_factor: float = 0.1
    lr_step: tuple[int, ...] = (90, 110)
    lr: float = 0.001
    optimizer: str = "adam"
    momentum: float = 0.9
    wd: float = 0.0001
    nesterov: bool = False
    layers: int = 10
    init_channels: int = 32
    gamma1: float = 0.99
    gamma2: float = 0.0
    begin_epoch: int = 0
    epochs: int = 140
    resume: bool = False
    checkpoint: str = ""
    batch_size: int = 32
    shuffle: bool = True
    train_set: str = "train"
    mini_set: str = "mini"
    test_set: str = "valid"
    sample_set: str = "sample"
    name: str = "mpii"
    path: str = "augments"
    genotype: Any = None
    ignore_label: int = 255
    scale_factor: float = 16
    num_samples: int = 0
    flip: bool = True


@dataclass(frozen=True)
class TestConfig:
    """Mirrors reference ``config.TEST`` (core/config.py:220-241)."""

    batch_size: int = 32
    flip_test: bool = False
    post_process: bool = True
    shift_heatmap: bool = True
    use_gt_bbox: bool = False
    image_thre: float = 0.1
    nms_thre: float = 0.6
    soft_nms: bool = False
    oks_thre: float = 0.5
    in_vis_thre: float = 0.0
    coco_bbox_file: str = ""
    bbox_thre: float = 1.0
    model_file: str = ""
    num_samples: int = 0
    scale_list: tuple[float, ...] = (1,)
    test_set: str = ""


@dataclass(frozen=True)
class DebugConfig:
    debug: bool = False
    save_batch_images_gt: bool = False
    save_batch_images_pred: bool = False
    save_heatmaps_gt: bool = False
    save_heatmaps_pred: bool = False


@dataclass(frozen=True)
class CudnnConfig:
    """Kept only so reference YAMLs parse; no cuDNN on TPU."""

    benchmark: bool = True
    deterministic: bool = False
    enabled: bool = True


@dataclass(frozen=True)
class Config:
    """Top-level config (reference core/config.py:18-27 plus sections)."""

    output_dir: str = "output"
    log_dir: str = "log"
    data_dir: str = ""
    pose_gt_path: str = ""
    pose_pred_path: str = ""
    gpus: str = "0"
    workers: int = 16
    print_freq: int = 20
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    search: SearchConfig = field(default_factory=SearchConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    test: TestConfig = field(default_factory=TestConfig)
    debug: DebugConfig = field(default_factory=DebugConfig)
    cudnn: CudnnConfig = field(default_factory=CudnnConfig)
    # TPU-specific additions (no reference equivalent).
    mesh_shape: tuple[int, ...] = ()  # () = all local devices on one 'data' axis
    compute_dtype: str = "bfloat16"

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


# Map reference YAML section names -> dataclass field / class.
_SECTION_MAP = {
    "MODEL": "model",
    "LOSS": "loss",
    "DATASET": "dataset",
    "SEARCH": "search",
    "TRAIN": "train",
    "TEST": "test",
    "DEBUG": "debug",
    "CUDNN": "cudnn",
    "EXTRA_POSE": None,  # accepted, ignored (dead keys in the reference too)
    "EXTRA_PAR": None,
}

# Reference key names that differ from our field names.
_KEY_RENAMES = {
    "APLHA_LR": "alpha_lr",  # sic — reference typo (core/config.py:173)
    "W_GRADconfigLIP": "w_gradclip",  # sic (core/config.py:176)
    "OHEMTHRES": "ohem_thres",
    "OHEMKEEP": "ohem_keep",
}

_TUPLE2_KEYS = {"image_size", "heatmap_size"}


def _coerce(cls, name: str, value):
    if name in _TUPLE2_KEYS:
        return _tuple2(value)
    ftypes = {f.name: f for f in dataclasses.fields(cls)}
    f = ftypes[name]
    if isinstance(f.default, tuple) or (
        f.default_factory is not dataclasses.MISSING
    ):
        if isinstance(value, list):
            return tuple(value)
    return value


def _apply_section(cls, current, overrides: dict):
    updates = {}
    valid = {f.name for f in dataclasses.fields(cls)}
    for k, v in overrides.items():
        name = _KEY_RENAMES.get(k, k.lower())
        if name not in valid:
            raise ValueError(f"{cls.__name__}.{k} not a known config key")
        updates[name] = _coerce(cls, name, v)
    return dataclasses.replace(current, **updates)


def load_config(path: str | None = None, overrides: dict | None = None) -> Config:
    """Build a Config from a reference-format YAML file plus overrides.

    Behaves like ``update_config`` (core/config.py:281-295): any key not
    declared in the schema raises ``ValueError``.
    """
    cfg = Config()
    data: dict = {}
    if path is not None:
        with open(path) as f:
            data = yaml.safe_load(f) or {}
    if overrides:
        data = _deep_merge(data, overrides)

    top_valid = {f.name for f in dataclasses.fields(Config)}
    updates: dict[str, Any] = {}
    for k, v in data.items():
        if k in _SECTION_MAP:
            fieldname = _SECTION_MAP[k]
            if fieldname is None:
                continue  # accepted-but-ignored section
            section_cls = type(getattr(cfg, fieldname))
            updates[fieldname] = _apply_section(
                section_cls, getattr(cfg, fieldname), v
            )
        elif k.lower() in top_valid:
            name = k.lower()
            cur = getattr(cfg, name)
            if dataclasses.is_dataclass(cur) and isinstance(v, dict):
                updates[name] = _apply_section(type(cur), cur, v)
            else:
                updates[name] = tuple(v) if isinstance(v, list) else v
        else:
            raise ValueError(f"{k} not a known config section/key")
    return dataclasses.replace(cfg, **updates)


def _deep_merge(base: dict, extra: dict) -> dict:
    out = dict(base)
    for k, v in extra.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def dump_config(cfg: Config, path: str) -> None:
    """Equivalent of reference ``gen_config`` (core/config.py:298-305)."""
    with open(path, "w") as f:
        yaml.safe_dump(dataclasses.asdict(cfg), f, default_flow_style=False)
