"""End-to-end train-step test on synthetic data: loss must decrease
(the reference's only 'test' of training is metric printouts; SURVEY.md §4)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from npp_tpu.core import train as T
from npp_tpu.core.criterion import LIP_CLASS_WEIGHTS


@pytest.fixture(scope="module")
def train_bundle():
    from npp_tpu.models.augment import NPPNet

    model = NPPNet(num_classes=5, num_joints=4, layers=8, init_channels=8,
                   refine_layers=1, dtype=jnp.float32)
    tx = T.make_train_optimizer(1e-3, lr_step=(100,), lr_factor=0.1,
                                steps_per_epoch=10)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    state = T.init_train_state(model, tx, jax.random.PRNGKey(0), x,
                               num_stages=2)
    return model, tx, state


def _batch(rng, b=2, hw=64, j=4, c=5):
    h = hw // 4
    return {
        "image": jnp.asarray(rng.standard_normal((b, hw, hw, 3)),
                             jnp.float32),
        "par": jnp.asarray(rng.integers(0, c, (b, hw, hw)), jnp.int32),
        "edge": jnp.asarray(rng.integers(0, 2, (b, hw, hw)), jnp.int32),
        "pose": jnp.asarray(rng.random((b, h, h, j)), jnp.float32),
        "pose_aux": jnp.asarray(rng.random((b, h, h, j)), jnp.float32),
        "pose_weight": jnp.ones((b, j), jnp.float32),
    }


def test_loss_decreases(train_bundle):
    model, tx, state = train_bundle
    step = T.make_train_step(model, tx,
                             class_weights=LIP_CLASS_WEIGHTS[:5],
                             ohem_keep=512, donate=False)
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_criterion_lamdas_are_trained(train_bundle):
    model, tx, state = train_bundle
    step = T.make_train_step(model, tx,
                             class_weights=LIP_CLASS_WEIGHTS[:5],
                             ohem_keep=512, donate=False)
    batch = _batch(np.random.default_rng(1))
    lam0 = np.asarray(state.params["criterion"]["lamda_pose"]).copy()
    state2, _ = step(state, batch)
    lam1 = np.asarray(state2.params["criterion"]["lamda_pose"])
    assert not np.allclose(lam0, lam1)


def test_use_target_weight_masks_pose_loss(train_bundle):
    """With use_target_weight=True, joints whose pose_weight is zero must
    contribute nothing to the pose loss: perturbing their targets leaves
    loss_pose unchanged, while unmasked perturbation moves it
    (reference Criterion_pose target_weight path, criterion.py:103-108)."""
    model, tx, state = train_bundle
    step = T.make_train_step(model, tx,
                             class_weights=LIP_CLASS_WEIGHTS[:5],
                             ohem_keep=512, donate=False,
                             use_target_weight=True)
    rng = np.random.default_rng(2)
    base = _batch(rng)
    # Mask joints 0 and 1; perturb their target heatmaps wildly.
    w = np.ones((2, 4), np.float32)
    w[:, :2] = 0.0
    masked = dict(base, pose_weight=jnp.asarray(w))
    perturbed = np.asarray(masked["pose"]).copy()
    perturbed[..., :2] += 100.0
    masked_pert = dict(masked, pose=jnp.asarray(perturbed))

    _, m_a = step(state, masked)
    _, m_b = step(state, masked_pert)
    assert float(m_a["loss_pose"]) == pytest.approx(
        float(m_b["loss_pose"]), rel=1e-6)

    # Same perturbation on an UNMASKED joint must change the loss.
    perturbed2 = np.asarray(masked["pose"]).copy()
    perturbed2[..., 2:] += 100.0
    _, m_c = step(state, dict(masked, pose=jnp.asarray(perturbed2)))
    assert abs(float(m_c["loss_pose"]) - float(m_a["loss_pose"])) > 1.0

    # And the default (parity) build ignores pose_weight entirely.
    step_off = T.make_train_step(model, tx,
                                 class_weights=LIP_CLASS_WEIGHTS[:5],
                                 ohem_keep=512, donate=False)
    _, m_d = step_off(state, base)
    _, m_e = step_off(state, masked)
    assert float(m_d["loss_pose"]) == pytest.approx(
        float(m_e["loss_pose"]), rel=1e-6)


def test_scanned_steps_match_sequential(train_bundle):
    """make_train_step_scanned (K steps per dispatch via lax.scan) must
    produce the same trajectory as K sequential dispatches, and
    engine.train_epoch_scanned must drive it (incl. a short tail chunk)."""
    from npp_tpu.engine import train_epoch_scanned

    model, tx, state = train_bundle
    kw = dict(class_weights=LIP_CLASS_WEIGHTS[:5], ohem_keep=512)
    step = T.make_train_step(model, tx, donate=False, **kw)
    multi = T.make_train_step_scanned(model, tx, donate=False, **kw)

    rng = np.random.default_rng(3)
    batches = [_batch(rng) for _ in range(3)]
    seq_state = state
    seq_losses = []
    for b in batches:
        seq_state, m = step(seq_state, b)
        seq_losses.append(float(m["loss"]))

    stacked = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}
    scan_state, metrics = multi(state, stacked)
    # rtol 1e-4: the scan body and the standalone step compile to
    # different programs whose conv reassociation differs on CPU
    # (documented ~1e-4 noise floor); drift compounds per step.
    np.testing.assert_allclose(np.asarray(metrics["loss"]), seq_losses,
                               rtol=1e-4, atol=0)
    assert int(scan_state.step) == int(seq_state.step) == 3
    # No elementwise param comparison: early-step Adam's m/sqrt(v) ratio
    # amplifies the ~1e-4 CPU conv-reassociation noise between the two
    # compiled programs arbitrarily per element (measured: isolated
    # elements at 1e-4..1e-2 while every loss matches to 1e-5). The
    # loss trajectory IS the state check — step k's loss is computed
    # from step k-1's params, so a mis-threaded scan carry would
    # diverge at O(1) by step 2, not at the noise floor asserted above.

    # Epoch driver: 3 batches at K=2 -> one full dispatch + one tail.
    end_state, avg, _ = train_epoch_scanned(
        multi, state, batches, epoch=0, steps_per_dispatch=2)
    assert int(end_state.step) == 3
    assert avg == pytest.approx(np.mean(seq_losses), rel=1e-4)


def test_param_labels():
    params = {
        "criterion": {"lamda_pose": jnp.zeros(2)},
        "model": {"cells1_0": {"k": jnp.zeros(1)},
                  "stem0": {"k": jnp.zeros(1)},
                  "pose_head_0": {"k": jnp.zeros(1)}},
    }
    labels = T._label_params(params, backbone_lr_scale=True)
    assert labels["criterion"]["lamda_pose"] == "criterion"
    assert labels["model"]["cells1_0"]["k"] == "backbone"
    assert labels["model"]["stem0"]["k"] == "backbone"
    assert labels["model"]["pose_head_0"]["k"] == "weights"


def test_multistep_lr_schedule():
    sched = T.multistep_lr(1.0, (2, 4), 0.1, steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(1.0)
    assert float(sched(25)) == pytest.approx(0.1)
    assert float(sched(45)) == pytest.approx(0.01)


def test_overfit_one_batch_parsing_accuracy():
    """End-to-end learning: overfitting one synthetic batch must push
    parsing accuracy far above background-fraction chance (the full loss
    stack incl. learned lambdas, OHEM, and edge CE must cooperate)."""
    from npp_tpu.data import SyntheticDataset, collate, make_target_renderer
    from npp_tpu.models.augment import NPPNet
    from npp_tpu.ops.resize import resize_bilinear

    ds = SyntheticDataset(length=2, crop_size=(64, 64), num_joints=8,
                          num_classes=10)
    renderer = make_target_renderer(stride=4, sigma=3, num_joints=8)
    raw = collate([ds[i] for i in range(2)])
    raw.pop("names")
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    batch.update(renderer(batch["image"], batch["par"], batch["joints"],
                          batch["visibility"]))

    model = NPPNet(num_classes=10, num_joints=8, layers=8, init_channels=8,
                   refine_layers=1, dtype=jnp.float32)
    tx = T.make_train_optimizer(3e-3, (1000,), 0.1, 100)
    state = T.init_train_state(model, tx, jax.random.PRNGKey(0),
                               batch["image"], 2)
    step = T.make_train_step(model, tx, class_weights=LIP_CLASS_WEIGHTS[:10],
                             ohem_keep=1024, donate=False)

    @jax.jit
    def par_acc(params, stats, batch):
        _, q = model.apply({"params": params["model"], "batch_stats": stats},
                           batch["image"], train=False)
        logits = resize_bilinear(q[-1][0].astype(jnp.float32), (64, 64),
                                 align_corners=False)
        return jnp.mean((jnp.argmax(logits, -1) == batch["par"]).astype(
            jnp.float32))

    acc0 = float(par_acc(state.params, state.batch_stats, batch))
    for _ in range(40):
        state, m = step(state, batch)
    acc1 = float(par_acc(state.params, state.batch_stats, batch))
    assert acc1 > max(3 * acc0, 0.3), (acc0, acc1)


def test_warn_batch_tiling_per_device_semantics(recwarn):
    """The bs%8 tiling warning is about the PER-DEVICE batch (the
    measured v5e collapse is per-chip — BENCH.md batch-size profile):
    global bs16 on a 4-way data mesh runs per-device bs4 and must warn;
    global bs32 on the same mesh is per-device bs8 and must not
    (VERDICT r4 weak item 5)."""
    import warnings

    T._warned_batch_sizes.clear()
    # single device: multiples of 8 are fine, others warn
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        T.warn_batch_tiling(np.zeros((16, 4, 4, 3)), "t0")
        assert not w
        T.warn_batch_tiling(np.zeros((12, 4, 4, 3)), "t0")
        assert len(w) == 1 and "12" in str(w[0].message)
    # 4-way data mesh, global bs16 -> per-device 4: warns
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        T.warn_batch_tiling(np.zeros((16, 4, 4, 3)), "t1", n_data=4)
        assert len(w) == 1 and "4" in str(w[0].message)
    # global bs32 on the same mesh -> per-device 8: silent
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        T.warn_batch_tiling(np.zeros((32, 4, 4, 3)), "t2", n_data=4)
        assert not w
    # committed jax.Array: per-device size read off the sharding
    # (single CPU device here, so shard == global)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        T.warn_batch_tiling(jnp.zeros((12, 2)), "t3")
        assert len(w) == 1
    T._warned_batch_sizes.clear()
