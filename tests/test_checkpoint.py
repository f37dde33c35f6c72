"""Checkpoint save/restore/best/pretrained-merge tests
(reference checkpoint semantics, search_lip_sync.py:357-394)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from npp_tpu.core.checkpoint import CheckpointManager, load_pretrained_params

# Slow tier: compile-heavy / subprocess / reference-scale (see pytest.ini).
pytestmark = pytest.mark.slow


def _state(value: float):
    return {"params": {"w": jnp.full((2, 2), value)},
            "opt": {"mu": jnp.full((2, 2), value * 0.1)},
            "step": jnp.asarray(int(value), jnp.int32)}


def test_save_restore_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, _state(1.0), metrics={"miou": 0.5})
    mgr.save(1, _state(2.0), metrics={"miou": 0.6}, is_best=True)
    assert mgr.latest_epoch() == 1
    restored, meta = mgr.restore(_state(0.0))
    assert float(restored["params"]["w"][0, 0]) == 2.0
    assert meta["epoch"] == 1
    # Specific epoch restore.
    restored0, meta0 = mgr.restore(_state(0.0), epoch=0)
    assert float(restored0["params"]["w"][0, 0]) == 1.0
    # Best mirror.
    best, bmeta = mgr.restore_named(_state(0.0), "best")
    assert float(best["params"]["w"][0, 0]) == 2.0
    assert bmeta["miou"] == 0.6


def test_restore_empty_returns_none(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "empty"))
    state, meta = mgr.restore(_state(0.0))
    assert state is None and meta is None


def test_warmed_and_final_tags(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(14, _state(14.0), tag="warmed")
    mgr.save(15, _state(15.0), tag="final")
    warmed, wm = mgr.restore_named(_state(0.0), "warmed")
    final, fm = mgr.restore_named(_state(0.0), "final")
    assert float(warmed["step"]) == 14 and wm["epoch"] == 14
    assert float(final["step"]) == 15 and fm["epoch"] == 15


def test_search_state_roundtrip(tmp_path):
    """Resume path for a REAL SearchState: stacked (vmapped) fusion-cell
    params, arch params, and both optimizer states must survive an orbax
    round trip bit-exactly (reference checkpoint.pth contents,
    search_lip_sync.py:360-371)."""
    from npp_tpu.core import search as S
    from npp_tpu.models.search import ARCH_PARAM_NAMES, SearchNet

    model = SearchNet(num_classes=5, num_joints=4, layers=8,
                      init_channels=8, refine_layers=1, dtype=jnp.float32)
    w_tx, a_tx = S.make_search_optimizers(w_lr=1e-3, alpha_lr=1e-3,
                                          lr_step=(70,), lr_factor=0.2,
                                          steps_per_epoch=10)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    state = S.init_search_state(model, w_tx, a_tx, jax.random.PRNGKey(0),
                                x, 2)
    mgr = CheckpointManager(str(tmp_path / "search_ckpt"))
    mgr.save(7, state, metrics={"miou": 0.1, "pck": 2.0}, tag="warmed")

    template = jax.tree.map(jnp.zeros_like, state)
    restored, meta = mgr.restore(template)
    assert meta["epoch"] == 7 and meta["pck"] == 2.0
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for name in ARCH_PARAM_NAMES:
        assert name in restored.params["model"]
    # Stacked fusion-cell params kept their leading edge-group axis.
    p0 = restored.params["model"]["pose_net_0"]
    stacked = [k for k in p0 if k.startswith("step_ops_")]
    assert stacked, sorted(p0)[:5]


def test_load_pretrained_params_shape_tolerant():
    template = {"a": jnp.zeros((2, 2)), "b": jnp.zeros((3,)),
                "nested": {"c": jnp.zeros((4,))}}
    pretrained = {"a": jnp.ones((2, 2)), "b": jnp.ones((5,)),  # wrong shape
                  "nested": {"c": jnp.ones((4,)), "extra": jnp.ones((1,))}}
    merged = load_pretrained_params(template, pretrained, log_fn=lambda s: s)
    assert float(merged["a"][0, 0]) == 1.0        # loaded
    assert float(merged["b"][0]) == 0.0           # shape-skipped
    assert float(merged["nested"]["c"][0]) == 1.0  # loaded
