"""Shared-program bi-level step must match the two-program variant.

make_search_steps(share_program=True) compiles one gradient program with a
traced optimizer branch; this asserts both step types produce the same
losses and parameter updates as the separate-program build.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from npp_tpu.core import search as S
from npp_tpu.core.criterion import LIP_CLASS_WEIGHTS
from npp_tpu.models.search import SearchNet

# Slow tier: compile-heavy / subprocess / reference-scale (see pytest.ini).
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_search():
    model = SearchNet(num_classes=5, num_joints=4, layers=8,
                      init_channels=8, refine_layers=1, dtype=jnp.float32)
    w_tx, a_tx = S.make_search_optimizers(w_lr=1e-3, alpha_lr=1e-3,
                                          lr_step=(70,), lr_factor=0.2,
                                          steps_per_epoch=10)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    state = S.init_search_state(model, w_tx, a_tx, jax.random.PRNGKey(0),
                                x, 2)
    rng = np.random.default_rng(0)
    b, hw = 2, 64
    batch = {
        "image": jnp.asarray(rng.standard_normal((b, hw, hw, 3)),
                             jnp.float32),
        "par": jnp.asarray(rng.integers(0, 5, (b, hw, hw)), jnp.int32),
        "edge": jnp.asarray(rng.integers(0, 2, (b, hw, hw)), jnp.int32),
        "pose": jnp.asarray(rng.random((b, 8, 8, 4)), jnp.float32),
        "pose_aux": jnp.asarray(rng.random((b, 8, 8, 4)), jnp.float32),
        "pose_weight": jnp.ones((b, 4), jnp.float32),
    }
    return model, w_tx, a_tx, state, batch


def _steps(model, w_tx, a_tx, shared):
    return S.make_search_steps(model, w_tx, a_tx,
                               class_weights=LIP_CLASS_WEIGHTS[:5],
                               ohem_keep=64, share_program=shared)


def test_shared_weight_step_matches(tiny_search):
    model, w_tx, a_tx, state, batch = tiny_search
    ws_a, _ = _steps(model, w_tx, a_tx, True)
    ws_b, _ = _steps(model, w_tx, a_tx, False)
    sa, ma = ws_a(state, batch)
    sb, mb = ws_b(state, batch)
    assert float(ma["loss"]) == pytest.approx(float(mb["loss"]), rel=1e-5)
    la = np.asarray(jax.tree.leaves(sa.params["model"])[0])
    lb = np.asarray(jax.tree.leaves(sb.params["model"])[0])
    np.testing.assert_allclose(la, lb, rtol=1e-5, atol=1e-7)
    assert int(sa.step) == int(sb.step) == 1


def test_shared_arch_step_matches(tiny_search):
    model, w_tx, a_tx, state, batch = tiny_search
    _, as_a = _steps(model, w_tx, a_tx, True)
    _, as_b = _steps(model, w_tx, a_tx, False)
    coef = jnp.float32(1.0)
    sa, ma = as_a(state, batch, coef)
    sb, mb = as_b(state, batch, coef)
    assert float(ma["loss"]) == pytest.approx(float(mb["loss"]), rel=1e-5)
    assert float(ma["entropy"]) == pytest.approx(float(mb["entropy"]),
                                                 rel=1e-5)
    aa = np.asarray(sa.params["model"]["alphas_pose"])
    ab = np.asarray(sb.params["model"]["alphas_pose"])
    np.testing.assert_allclose(aa, ab, rtol=1e-5, atol=1e-7)
    # Arch step leaves the step counter and weight-opt state untouched.
    assert int(sa.step) == 0
    a0 = np.asarray(state.params["model"]["alphas_pose"])
    assert not np.allclose(aa, a0)  # alphas actually moved


def test_shared_program_single_compile(tiny_search):
    """weight and arch calls must hit ONE compiled program (is_arch is an
    operand, not a static arg)."""
    model, w_tx, a_tx, state, batch = tiny_search
    ws, as_ = _steps(model, w_tx, a_tx, True)
    s1, _ = ws(state, batch)
    s2, _ = as_(s1, batch, jnp.float32(0.0))
    s3, _ = ws(s2, batch)
    assert int(s3.step) == 2
