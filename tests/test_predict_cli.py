"""The serving CLI (tools/predict.py) end-to-end: synthetic images ->
palette parsing PNGs + LIP-protocol pose_pred.csv."""
import csv
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_predict_cli_synthetic(tmp_path):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never touch the TPU tunnel
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
    out = tmp_path / "preds"
    # --fuse-necks/--fuse-cells are on by default (the measured-best
    # serving config, BENCH.md); pass them explicitly so this test keeps
    # driving both graph fusions even if the defaults change.
    r = subprocess.run(
        [sys.executable, "tools/predict.py",
         "--cfg", "experiments/lip/384_384.yaml",
         "--synthetic", "2", "--tiny", "--batch", "2",
         "--fuse-necks", "--fuse-cells", "--out", str(out)],
        env=env, capture_output=True, text=True, timeout=2400)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])

    pngs = sorted(p for p in os.listdir(out) if p.endswith(".png"))
    assert pngs == ["synthetic_000.png", "synthetic_001.png"]
    with open(out / "pose_pred.csv") as f:
        rows = list(csv.reader(f))
    # LIP protocol: name + 16 joints x (x, y).
    assert len(rows) == 2
    assert all(len(row) == 1 + 32 for row in rows)
    assert rows[0][0] == "synthetic_000"


def test_parse_pose_scales():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.predict import _parse_pose_scales

    assert _parse_pose_scales("0.8,1.0,1.2") == (0.8, 1.0, 1.2)
    # stray whitespace + trailing comma tolerated
    assert _parse_pose_scales(" 0.8 , 1.0,") == (0.8, 1.0)
    # duplicates deduped (would double-weight the uniform TTA average)
    assert _parse_pose_scales("1.0,0.8,1.0") == (1.0, 0.8)
    with pytest.raises(SystemExit, match="pose-scales.*not a number"):
        _parse_pose_scales("0.8,abc")
    with pytest.raises(SystemExit, match="no scales"):
        _parse_pose_scales(",,")


def test_predict_cli_fusion_flags():
    """The measured-best serving config (both exact graph fusions,
    BENCH.md) is the CLI default; --no-fuse / --no-fuse-* opt out
    (argparse-level; the Predictor behavior behind the flags is covered
    by tests/test_model.py + test_evaluate.py)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.predict import build_parser

    p = build_parser()
    a = p.parse_args(["--cfg", "x.yaml"])
    assert a.fuse_necks and a.fuse_cells and not a.no_fuse
    a = p.parse_args(["--cfg", "x.yaml", "--no-fuse-cells"])
    assert a.fuse_necks and not a.fuse_cells
    a = p.parse_args(["--cfg", "x.yaml", "--no-fuse"])
    assert a.no_fuse  # main() clears both fusions when set
