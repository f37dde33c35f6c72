"""The checkpoint-migration CLI (tools/convert_checkpoint.py) end-to-end:
a reference .pth (epoch-checkpoint dict with DDP prefixes) becomes an
orbax checkpoint whose restored variables reproduce the torch forward."""
import subprocess
import sys
from types import SimpleNamespace as NS

import numpy as np
import pytest

REFERENCE = "/root/reference"
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# Slow tier: compile-heavy / subprocess / reference-scale (see pytest.ini).
pytestmark = pytest.mark.slow


def test_extract_state_dict_variants():
    sys.path.insert(0, "tools")
    from convert_checkpoint import extract_state_dict

    sd = {"module.stem0.0.weight": torch.zeros(2),
          "module.cells1.0.bn.bias": torch.zeros(2)}
    out = extract_state_dict({"epoch": 3, "best_state_dict": sd})
    assert set(out) == {"stem0.0.weight", "cells1.0.bn.bias"}
    out2 = extract_state_dict(sd)
    assert set(out2) == set(out)


def test_cli_roundtrip(tmp_path):
    """Write a reference checkpoint .pth at the small parity config, run
    the CLI (augment mode), restore the orbax output, assert forward
    equality with the torch net."""
    from models.model_augment import Network  # reference

    cfg = NS(DATASET=NS(NUM_CLASSES=7, NUM_JOINTS=4),
             TRAIN=NS(LAYERS=8, INIT_CHANNELS=8),
             MODEL=NS(DECONV_WITH_BIAS=False, HEAD="", REFINE_LAYERS=1))
    torch.manual_seed(0)
    ref = Network(cfg).eval()
    pth = tmp_path / "checkpoint.pth"
    torch.save({"epoch": 1,
                "best_state_dict": {"module." + k: v for k, v in
                                    ref.state_dict().items()}}, str(pth))

    # matching npp_tpu YAML at the same scale
    yaml = tmp_path / "tiny.yaml"
    yaml.write_text(
        "DATASET:\n  NUM_CLASSES: 7\n  NUM_JOINTS: 4\n"
        "TRAIN:\n  LAYERS: 8\n  INIT_CHANNELS: 8\n"
        "MODEL:\n  REFINE_LAYERS: 1\n")
    out = tmp_path / "orbax_ckpt"
    env = dict(__import__("os").environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    r = subprocess.run(
        [sys.executable, "tools/convert_checkpoint.py", "--pth", str(pth),
         "--out", str(out), "--cfg", str(yaml)],
        capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]

    import orbax.checkpoint as ocp

    from npp_tpu.models.augment import NPPNet

    jax.config.update("jax_default_matmul_precision", "highest")
    restored = ocp.PyTreeCheckpointer().restore(str(out))
    model = NPPNet(num_classes=7, num_joints=4, layers=8, init_channels=8,
                   refine_layers=1, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_pose, _t_par = ref(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)).copy()))
    j_pose, _j_par = jax.jit(model.apply, static_argnames=("train",))(
        {"params": restored["params"],
         "batch_stats": restored["batch_stats"]}, jnp.asarray(x),
        train=False)
    got = np.transpose(np.asarray(j_pose[-1][0]), (0, 3, 1, 2))
    want = t_pose[-1][0].numpy()
    scale = max(np.abs(want).max(), 1e-3)
    assert np.abs(got - want).max() / scale < 2e-3


def test_cli_export_roundtrip(tmp_path):
    """convert CLI -> orbax -> export CLI -> .pth: the exported
    state_dict is byte-equal to the original reference checkpoint."""
    import os

    from models.model_augment import Network  # reference

    cfg = NS(DATASET=NS(NUM_CLASSES=7, NUM_JOINTS=4),
             TRAIN=NS(LAYERS=8, INIT_CHANNELS=8),
             MODEL=NS(DECONV_WITH_BIAS=False, HEAD="", REFINE_LAYERS=1))
    torch.manual_seed(0)
    ref = Network(cfg).eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    pth = tmp_path / "checkpoint.pth"
    torch.save(ref.state_dict(), str(pth))

    yaml = tmp_path / "tiny.yaml"
    yaml.write_text(
        "DATASET:\n  NUM_CLASSES: 7\n  NUM_JOINTS: 4\n"
        "TRAIN:\n  LAYERS: 8\n  INIT_CHANNELS: 8\n"
        "MODEL:\n  REFINE_LAYERS: 1\n")
    orbax_dir = tmp_path / "orbax_ckpt"
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    r = subprocess.run(
        [sys.executable, "tools/convert_checkpoint.py", "--pth", str(pth),
         "--out", str(orbax_dir), "--cfg", str(yaml)],
        capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]

    out_pth = tmp_path / "exported.pth"
    r = subprocess.run(
        [sys.executable, "tools/export_checkpoint.py", "--ckpt",
         str(orbax_dir), "--out", str(out_pth), "--cfg", str(yaml)],
        capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]

    out_sd = {k: v.numpy()
              for k, v in torch.load(str(out_pth),
                                     weights_only=False).items()}
    assert set(out_sd) == set(sd)
    for k in sd:
        assert np.array_equal(out_sd[k], sd[k]), k


def test_cli_export_from_epoch_save(tmp_path):
    """Export straight from a CheckpointManager EPOCH save (pytree nested
    under <epoch>/default/, unlike the flat best/warmed/final mirrors)."""
    import os

    from models.model_augment import Network  # reference

    import orbax.checkpoint as ocp

    from npp_tpu.core.checkpoint import CheckpointManager
    from npp_tpu.utils.torch_convert import convert_reference_state_dict
    from npp_tpu.models.augment import NPPNet

    cfg = NS(DATASET=NS(NUM_CLASSES=7, NUM_JOINTS=4),
             TRAIN=NS(LAYERS=8, INIT_CHANNELS=8),
             MODEL=NS(DECONV_WITH_BIAS=False, HEAD="", REFINE_LAYERS=1))
    torch.manual_seed(0)
    ref = Network(cfg).eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    model = NPPNet(num_classes=7, num_joints=4, layers=8, init_channels=8,
                   refine_layers=1, dtype=jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False))
    zeros = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                         dict(variables))
    converted, _ = convert_reference_state_dict(sd, zeros)

    # A TrainState-shaped pytree, saved as an epoch checkpoint.
    state_like = {"params": {"model": converted["params"],
                             "criterion": {"lamda_pose": np.zeros(2)}},
                  "batch_stats": converted["batch_stats"]}
    ckpt = CheckpointManager(str(tmp_path / "ckmgr"))
    ckpt.save(3, state_like)
    ckpt.wait()

    yaml = tmp_path / "tiny.yaml"
    yaml.write_text(
        "DATASET:\n  NUM_CLASSES: 7\n  NUM_JOINTS: 4\n"
        "TRAIN:\n  LAYERS: 8\n  INIT_CHANNELS: 8\n"
        "MODEL:\n  REFINE_LAYERS: 1\n")
    out_pth = tmp_path / "exported.pth"
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    r = subprocess.run(
        [sys.executable, "tools/export_checkpoint.py", "--ckpt",
         str(tmp_path / "ckmgr" / "3"), "--out", str(out_pth),
         "--cfg", str(yaml)],
        capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    out_sd = {k: v.numpy()
              for k, v in torch.load(str(out_pth),
                                     weights_only=False).items()}
    for k in sd:
        assert np.array_equal(out_sd[k], sd[k]), k
