"""Loss parity tests vs torch implementations of the reference semantics
(core/criterion.py)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from npp_tpu.core import criterion as C


def _torch_ohem(score_nchw, target, weight, ignore=255, thres=0.9,
                min_kept=10):
    """Reference OhemCrossEntropy forward (criterion.py:54-72), verbatim
    semantics in torch."""
    score = torch.from_numpy(score_nchw)
    target_t = torch.from_numpy(target).long()
    w = torch.from_numpy(np.asarray(weight, np.float32))
    crit = torch.nn.CrossEntropyLoss(weight=w, ignore_index=ignore,
                                     reduction="none")
    pred = F.softmax(score, dim=1)
    pixel_losses = crit(score, target_t).contiguous().view(-1)
    mask = target_t.contiguous().view(-1) != ignore
    tmp_target = target_t.clone()
    tmp_target[tmp_target == ignore] = 0
    pred = pred.gather(1, tmp_target.unsqueeze(1))
    pred, ind = pred.contiguous().view(-1)[mask].contiguous().sort()
    min_value = pred[min(min_kept, pred.numel() - 1)]
    threshold = max(min_value, thres)
    pixel_losses = pixel_losses[mask][ind]
    pixel_losses = pixel_losses[pred < threshold]
    return pixel_losses.mean().item()


@pytest.mark.parametrize("min_kept", [5, 50, 1000])
def test_ohem_matches_reference_semantics(min_kept):
    rng = np.random.default_rng(0)
    b, h, w, c = 2, 16, 16, 4
    logits = rng.standard_normal((b, h, w, c)).astype(np.float32)
    target = rng.integers(0, c, (b, h, w)).astype(np.int32)
    target[0, :4, :4] = 255  # ignore region
    weights = [0.8, 1.0, 1.2, 0.9]

    ours = float(C.ohem_cross_entropy(jnp.asarray(logits),
                                      jnp.asarray(target), weights,
                                      ignore_index=255, thres=0.9,
                                      min_kept=min_kept))
    ref = _torch_ohem(np.transpose(logits, (0, 3, 1, 2)), target, weights,
                      min_kept=min_kept)
    np.testing.assert_allclose(ours, ref, rtol=2e-4)


def test_weighted_ce_matches_torch():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((2, 8, 8, 2)).astype(np.float32)
    target = rng.integers(0, 2, (2, 8, 8)).astype(np.int32)
    target[0, 0, :] = 255
    weights = np.array([0.3, 0.7], np.float32)
    ours = float(C.weighted_cross_entropy(jnp.asarray(logits),
                                          jnp.asarray(target),
                                          jnp.asarray(weights), 255))
    ref = F.cross_entropy(
        torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))),
        torch.from_numpy(target).long(),
        torch.from_numpy(weights), ignore_index=255).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_joint_mse_matches_torch():
    rng = np.random.default_rng(2)
    out = rng.standard_normal((2, 12, 12, 5)).astype(np.float32)
    tgt = rng.standard_normal((2, 12, 12, 5)).astype(np.float32)
    ours = float(C.joint_mse_loss(jnp.asarray(out), jnp.asarray(tgt)))
    # Reference: per-joint MSELoss summed then / num_joints
    # (criterion.py:102-128) == overall elementwise MSE.
    ref = np.mean((out - tgt) ** 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_pose_loss_lambda_weighting():
    out = jnp.zeros((1, 4, 4, 2))
    tgt = jnp.ones((1, 4, 4, 2))
    lam = jnp.asarray([0.5, -1.0])
    total = float(C.pose_loss([(out, None), (out, None)], tgt, None, lam))
    per_stage = 1.0  # mse(0, 1) = 1
    expected = (per_stage * np.exp(-0.5) + 0.5
                + per_stage * np.exp(1.0) - 1.0)
    np.testing.assert_allclose(total, expected, rtol=1e-5)


def test_lamda_inits():
    assert np.allclose(np.asarray(C.init_pose_lamda(2)), [-2.5, -2.5])
    assert np.allclose(np.asarray(C.init_par_lamda(2)), [2.3, 2.3])


def test_parsing_loss_runs_and_is_finite():
    rng = np.random.default_rng(3)
    par = rng.standard_normal((1, 24, 24, 20)).astype(np.float32)
    edge = rng.standard_normal((1, 24, 24, 2)).astype(np.float32)
    tgt_par = rng.integers(0, 20, (1, 48, 48)).astype(np.int32)
    tgt_edge = rng.integers(0, 2, (1, 48, 48)).astype(np.int32)
    lam = C.init_par_lamda(1)
    loss = float(C.parsing_loss([(jnp.asarray(par), jnp.asarray(edge))],
                                jnp.asarray(tgt_par), jnp.asarray(tgt_edge),
                                lam, min_kept=100))
    assert np.isfinite(loss)
