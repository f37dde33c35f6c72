"""The flagship user journey, end-to-end through the ACTUAL CLIs
(VERDICT r3 item 2; reference usage contract README.md:13-24):

  1. tools/search_lip.py  — N bi-level search steps on synthetic data,
     extracting + saving best_genotype.json (search_lip_sync.py:317-394)
  2. tools/augment_lip.py — build NPPNet FROM THE EXTRACTED genotype (not
     the released one), train M steps, eval, checkpoint save
  3. tools/predict.py     — restore that checkpoint (same genotype) and
     serve raw RGB images -> palette PNGs + LIP pose CSV

Everything runs in subprocesses on CPU with the persistent compilation
cache shared, in a tmp cwd (OUTPUT_DIR/LOG_DIR are relative).
"""
import csv
import json
import os
import subprocess
import sys
import pytest

# Slow tier: compile-heavy / subprocess / reference-scale (see pytest.ini).
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, "experiments", "lip", "384_384.yaml")


def _run(args, cwd, timeout=2400):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never touch the TPU tunnel
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
    r = subprocess.run([sys.executable] + args, env=env, cwd=cwd,
                       capture_output=True, text=True, timeout=timeout)
    assert r.returncode == 0, (args[0], r.stdout[-2000:], r.stderr[-3000:])
    return r


def test_flagship_journey(tmp_path):
    # 1. Search: one weight+arch bi-level step, genotype extraction,
    #    best_genotype.json written on the best epoch. Cold compile of the
    #    bi-level supernet program on a 1-core CPU host is ~45-90 min
    #    (verify skill notes); warm persistent-cache runs are minutes.
    _run([os.path.join(REPO, "tools", "search_lip.py"), "--cfg", CFG,
          "--synthetic", "--tiny", "--steps", "1", "--epochs", "1",
          "--warmup-epochs", "0"], cwd=tmp_path, timeout=7200)
    geno = tmp_path / "output" / "lip" / "search" / "384_384" / \
        "best_genotype.json"
    assert geno.exists(), "search did not save best_genotype.json"
    blob = json.loads(geno.read_text())
    assert "inter" in blob and "fuse" in blob

    # 2. Augment: the fixed net is compiled from THAT genotype, trained,
    #    evaluated, checkpointed (epoch + best + final tags).
    _run([os.path.join(REPO, "tools", "augment_lip.py"), "--cfg", CFG,
          "--synthetic", "--tiny", "--steps", "2", "--epochs", "1",
          "--genotype", str(geno)], cwd=tmp_path)
    ckpt = tmp_path / "output" / "lip" / "augment" / "384_384" / \
        "checkpoints"
    assert (ckpt / "best").exists(), "augment did not save a best ckpt"

    # 3. Serve: restore the trained checkpoint into a net built from the
    #    same searched genotype; raw images -> parsing PNGs + pose CSV.
    out = tmp_path / "preds"
    _run([os.path.join(REPO, "tools", "predict.py"), "--cfg", CFG,
          "--tiny", "--synthetic", "2", "--batch", "2",
          "--genotype", str(geno), "--ckpt", str(ckpt),
          "--out", str(out)], cwd=tmp_path)
    pngs = sorted(p for p in os.listdir(out) if p.endswith(".png"))
    assert pngs == ["synthetic_000.png", "synthetic_001.png"]
    with open(out / "pose_pred.csv") as f:
        rows = list(csv.reader(f))
    assert len(rows) == 2 and all(len(r) == 1 + 32 for r in rows)
