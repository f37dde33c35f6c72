"""Tests for vis/palette/zipreader/summary/logging/multiscale utilities."""
import json
import os
import zipfile

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_palette_png_roundtrip(tmp_path):
    from npp_tpu.utils.vis import get_palette, save_parsing_png

    pred = np.arange(20, dtype=np.uint8).reshape(4, 5)
    path = str(tmp_path / "p.png")
    save_parsing_png(pred, path, 20)
    from PIL import Image

    img = Image.open(path)
    assert img.mode == "P"
    np.testing.assert_array_equal(np.asarray(img), pred)
    pal = get_palette(20)
    assert len(pal) == 60
    assert pal[3:6] == [128, 0, 0]  # class 1 is dark red (PASCAL palette)


def test_draw_skeleton_and_overlays():
    from npp_tpu.utils.vis import (colorize_parsing, draw_skeleton,
                                   overlay_heatmap, overlay_parsing)

    img = np.zeros((64, 64, 3), np.uint8)
    joints = np.random.default_rng(0).uniform(5, 59, (16, 2))
    out = draw_skeleton(img, joints)
    assert out.shape == img.shape and out.sum() > 0
    pred = np.random.default_rng(1).integers(0, 20, (64, 64))
    assert overlay_parsing(img, pred).shape == img.shape
    assert colorize_parsing(pred).shape == (64, 64, 3)
    hm = np.random.default_rng(2).random((16, 16))
    assert overlay_heatmap(img, hm).shape == img.shape


def test_zipreader(tmp_path):
    from npp_tpu.utils import zipreader

    img = np.random.default_rng(0).integers(0, 255, (8, 8, 3)).astype(
        np.uint8)
    ok, buf = cv2.imencode(".png", img)
    zpath = str(tmp_path / "a.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("sub/im.png", buf.tobytes())
        z.writestr("meta.xml", "<root><x>1</x></root>")
    assert zipreader.is_zip_path(zpath + "@sub/im.png")
    out = zipreader.imread(zpath + "@sub/im.png")
    np.testing.assert_array_equal(out, img)
    root = zipreader.xmlread(zpath + "@meta.xml")
    assert root.find("x").text == "1"


def test_summary_counts_and_flops():
    from npp_tpu.utils.summary import (count_parameters,
                                       count_parameters_in_mb, model_flops)

    params = {"a": jnp.zeros((4, 4)), "b": {"c": jnp.zeros((2,))}}
    assert count_parameters(params) == 18
    assert count_parameters_in_mb(params) == 18 / (1024 * 1024)
    flops = model_flops(lambda x: x @ x, jnp.zeros((64, 64)))
    assert flops > 0


def test_metric_writer(tmp_path):
    from npp_tpu.utils.logging_utils import MetricWriter

    w = MetricWriter(str(tmp_path))
    w.scalar("loss", 1.5, 0)
    w.scalar("loss", 1.2, 1)
    w.close()
    lines = [json.loads(line) for line in
             open(tmp_path / "metrics.jsonl")]
    assert lines[0]["tag"] == "loss" and lines[0]["value"] == 1.5


def test_create_logger(tmp_path):
    from npp_tpu.config import Config
    from npp_tpu.utils.logging_utils import create_logger

    cfg = Config().replace(output_dir=str(tmp_path / "out"),
                           log_dir=str(tmp_path / "log"))
    logger, out_dir, tb_dir = create_logger(cfg, "experiments/lip/x.yaml",
                                            "augment")
    logger.info("hello")
    assert os.path.isdir(out_dir)
    logs = [f for f in os.listdir(out_dir) if f.endswith(".log")]
    assert logs


def test_multiscale_tiling_counts():
    from npp_tpu.core.multiscale import _tile_origins

    # 2/3-overlap tiling (base_dataset.py:187-214): stride = 2/3 crop.
    assert _tile_origins(384, 384, 256) == [0]
    # Clip-tail semantics (base_dataset.py:219-231): the last window
    # starts at (rows-1)*stride and is CLIPPED at the image edge, not
    # shifted back to fit (rows = ceil((L-crop)/stride)+1 = 2 here).
    origins = _tile_origins(500, 384, 256)
    assert origins == [0, 256]
    # Every pixel is still covered: last window start <= L - 1.
    assert origins[-1] < 500


def test_multiscale_inference_identity_model():
    """A 'model' that returns one-hot of a fixed class must survive
    tiling/scale aggregation unchanged in argmax."""
    from npp_tpu.core.multiscale import multi_scale_inference

    c = 4

    def apply_fn(tiles):
        logits = jnp.zeros(tiles.shape[:3] + (c,))
        return logits.at[..., 2].set(5.0)

    img = np.zeros((1, 96, 128, 3), np.float32)
    pred = multi_scale_inference(apply_fn, img, num_classes=c,
                                 crop_size=(64, 64), scales=(0.5, 1.0),
                                 flip=True)
    assert pred.shape == (1, 96, 128, c)
    assert (np.argmax(pred, -1) == 2).all()


def test_multiscale_inference_params_form():
    """The params form (weights as jit ARGUMENTS — required so the
    whole-pipeline jit doesn't inline them as constants) must compute
    the same aggregation as a closure over the same values, and content
    must flow through tiles (not just shapes): a conv-like dependence on
    the input shows up at the right spatial location."""
    from npp_tpu.core.multiscale import multi_scale_inference

    c = 3
    rng = np.random.default_rng(3)
    img = rng.standard_normal((1, 80, 112, 3)).astype(np.float32)
    w = jnp.asarray(rng.standard_normal((3, c)).astype(np.float32))

    def apply_with_params(params, tiles):
        return jnp.einsum("bhwi,ic->bhwc", tiles, params)

    def apply_closure(tiles):
        return jnp.einsum("bhwi,ic->bhwc", tiles, w)

    a = multi_scale_inference(apply_with_params, img, params=w,
                              num_classes=c, crop_size=(64, 64),
                              scales=(0.75, 1.0), flip=True)
    b = multi_scale_inference(apply_closure, img, num_classes=c,
                              crop_size=(64, 64), scales=(0.75, 1.0),
                              flip=True)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    assert np.isfinite(a).all() and a.shape == (1, 80, 112, c)


def test_top_level_lazy_exports():
    """`import npp_tpu` stays light; names resolve lazily and wrong names
    raise AttributeError."""
    import npp_tpu

    assert npp_tpu.__version__
    assert "Predictor" in dir(npp_tpu)
    from npp_tpu.core.predictor import Predictor
    assert npp_tpu.Predictor is Predictor
    from npp_tpu.models.augment import build_model
    assert npp_tpu.build_model is build_model
    import pytest
    with pytest.raises(AttributeError):
        npp_tpu.NoSuchThing
