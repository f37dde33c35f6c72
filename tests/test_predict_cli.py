"""The serving CLI (tools/predict.py) end-to-end: synthetic images ->
palette parsing PNGs + LIP-protocol pose_pred.csv."""
import csv
import os
import subprocess
import sys


def test_predict_cli_synthetic(tmp_path):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never touch the TPU tunnel
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
    out = tmp_path / "preds"
    r = subprocess.run(
        [sys.executable, "tools/predict.py",
         "--cfg", "experiments/lip/384_384.yaml",
         "--synthetic", "2", "--tiny", "--batch", "2",
         "--fuse-necks", "--out", str(out)],
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
