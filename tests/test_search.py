"""Supernet + bi-level search tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from npp_tpu import genotypes as gt
from npp_tpu.core import search as S
from npp_tpu.core.criterion import LIP_CLASS_WEIGHTS
from npp_tpu.models import genotype_parse as GP
from npp_tpu.models.search import (ARCH_PARAM_NAMES, MixedOp, SearchNet,
                                   channel_shuffle)

# Slow tier: compile-heavy / subprocess / reference-scale (see pytest.ini).
pytestmark = pytest.mark.slow


def test_channel_shuffle_matches_torch_semantics():
    # torch: view(b, g, c//g, h, w).transpose(1, 2) — channel c = g*cpg + k
    # maps to c' = k*groups + g.
    x = np.arange(8, dtype=np.float32).reshape(1, 1, 1, 8)
    y = np.asarray(channel_shuffle(jnp.asarray(x), 2))[0, 0, 0]
    expected = [0, 4, 1, 5, 2, 6, 3, 7]
    np.testing.assert_array_equal(y, expected)


def test_mixed_op_shapes():
    op = MixedOp(channels=8, dtype=jnp.float32)
    x = jnp.zeros((1, 16, 16, 8))
    w = jnp.ones((7,)) / 7
    variables = op.init(jax.random.PRNGKey(0), x, w, train=False)
    y = op.apply(variables, x, w, train=False)
    assert y.shape == x.shape


def test_mixed_op_downscale_adapter():
    op = MixedOp(channels=8, up_scale=0.5, extra_features=16,
                 dtype=jnp.float32)
    x = jnp.zeros((1, 16, 16, 8))
    w = jnp.ones((7,)) / 7
    variables = op.init(jax.random.PRNGKey(0), x, w, train=False)
    y = op.apply(variables, x, w, train=False)
    assert y.shape == (1, 8, 8, 16)


@pytest.fixture(scope="module")
def search_bundle():
    model = SearchNet(num_classes=5, num_joints=4, layers=8,
                      init_channels=8, refine_layers=1, dtype=jnp.float32)
    # Optimizer constants match tests/test_bilevel_shared.py so the
    # persistent compile cache shares one search program across files.
    w_tx, a_tx = S.make_search_optimizers(
        w_lr=1e-3, alpha_lr=1e-3, lr_step=(70,), lr_factor=0.2,
        steps_per_epoch=10)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    state = S.init_search_state(model, w_tx, a_tx, jax.random.PRNGKey(0), x,
                                num_stages=2)
    return model, w_tx, a_tx, state


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


def test_supernet_forward_and_arch_params(search_bundle):
    model, _, _, state = search_bundle
    for name in ARCH_PARAM_NAMES:
        assert name in state.params["model"], name
    assert state.params["model"]["alphas1"].shape == (10, 7)
    assert state.params["model"]["alphas_pose"].shape == (18, 7)


def test_bilevel_steps(search_bundle):
    model, w_tx, a_tx, state = search_bundle
    # ohem_keep matches tests/test_bilevel_shared.py so the persistent
    # compile cache shares one search program across both files.
    weight_step, arch_step = S.make_search_steps(
        model, w_tx, a_tx, class_weights=LIP_CLASS_WEIGHTS[:5],
        ohem_keep=64)
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    alphas0 = np.asarray(state.params["model"]["alphas1"]).copy()

    state1, m1 = weight_step(state, batch)
    # Weight step must NOT touch arch params.
    np.testing.assert_array_equal(
        np.asarray(state1.params["model"]["alphas1"]), alphas0)
    assert np.isfinite(float(m1["loss"]))

    w0 = np.asarray(
        state1.params["model"]["stem0"]["Conv_0"]["Conv_0"]["kernel"]).copy()
    state2, m2 = arch_step(state1, batch, jnp.float32(1.0))
    # Arch step must NOT touch weights but must move alphas.
    w1 = np.asarray(
        state2.params["model"]["stem0"]["Conv_0"]["Conv_0"]["kernel"])
    np.testing.assert_array_equal(w0, w1)
    assert not np.allclose(
        np.asarray(state2.params["model"]["alphas1"]), alphas0)
    assert float(m2["entropy"]) > 0


def test_genotype_extraction_structure(search_bundle):
    _, _, _, state = search_bundle
    arch = S.get_arch_params(state)
    inter, fuse = GP.extract_genotype(arch)
    assert len(inter.task1) == 4
    assert len(inter.task3) == 3
    for g, group in enumerate(inter.task1):
        assert 1 <= len(group) <= 4
        for name, idx in group:
            assert name in gt.PRIMITIVES_INTER
            assert 0 <= idx <= g
    assert len(fuse.pose) == 8
    # Extracted genotypes must be consumable by the fixed network compiler.
    from npp_tpu.models.augment import NPPNet
    NPPNet(num_classes=5, num_joints=4, layers=8, init_channels=8,
           refine_layers=1, inter=inter, fusion=fuse, dtype=jnp.float32)


def test_parse_topp_thresholding():
    # One dominant op -> single edge; uniform -> multiple edges.
    alpha = np.full((1, 7), 0.01)
    alpha[0, 3] = 10.0
    gene, wl = GP.parse_topp(GP.np_softmax(alpha), np.ones(1), 1, 1)
    assert gene[0] == [(gt.PRIMITIVES_INTER[3], 0)]
    uniform = GP.np_softmax(np.zeros((1, 7)))
    gene, wl = GP.parse_topp(uniform, np.ones(1), 1, 1)
    assert len(gene[0]) == 4  # 4 * 1/7 < 0.7 -> capped at max_edges


def test_btw_weights_sum_per_group():
    betas = np.random.default_rng(0).standard_normal(18).astype(np.float32)
    w = GP.btw_np(betas, 3, 4)
    # groups of 3,4,5,6 each sum to 1
    sizes = [3, 4, 5, 6]
    start = 0
    for n in sizes:
        np.testing.assert_allclose(w[start:start + n].sum(), 1.0, rtol=1e-5)
        start += n


def test_search_upsample_cell():
    from npp_tpu.models.search import SearchUpsampleCell, btw_weights

    cell = SearchUpsampleCell(c_prev=16, dtype=jnp.float32)
    s0 = jnp.zeros((1, 8, 8, 32))   # coarser feature
    s1 = jnp.zeros((1, 16, 16, 16))
    n_edges = sum(2 + i for i in range(4))
    aw = jnp.ones((n_edges, 7)) / 7
    bw = btw_weights(jnp.zeros((n_edges,)), 2, 4)
    v = cell.init(jax.random.PRNGKey(0), s0, s1, aw, bw, False)
    y = cell.apply(v, s0, s1, aw, bw, False)
    # Output: 4 * (c_prev // 4) channels at s1 resolution.
    assert y.shape == (1, 16, 16, 16)


def test_merged_streams_supernet_exact(search_bundle):
    """merged_streams=True + merge_stream_variables must reproduce the
    standard supernet forward: the vmapped cell pair runs each stream's
    weights on its own stream slice, so stacking stem/cell subtrees on a
    leading stream axis is function-preserving."""
    from npp_tpu.models.augment import (merge_stream_variables,
                                        unmerge_stream_variables)

    model, _, _, state = search_bundle
    variables = {"params": state.params["model"],
                 "batch_stats": state.batch_stats}
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    merged_model = model.clone(merged_streams=True)
    mv = merge_stream_variables(variables, model.layers)
    assert "vcells_0" in mv["params"] and "cells1_0" not in mv["params"]
    assert "vstem_a" in mv["params"] and "stem0" not in mv["params"]
    # Inverse round-trips bit-exactly (index of a stack, no arithmetic).
    back = unmerge_stream_variables(mv, model.layers)
    assert jax.tree.structure(back) == jax.tree.structure(variables)
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    fwd = jax.jit(model.apply, static_argnames=("train",))
    mfwd = jax.jit(merged_model.apply, static_argnames=("train",))
    ref_pose, ref_par = fwd(variables, x, train=False)
    got_pose, got_par = mfwd(mv, x, train=False)
    # atol 5e-3: vmapped CPU convs lower through a different algorithm
    # than unrolled ones (documented ~1e-4 relative noise, amplified
    # through 8 cells + injections); a wrong stream/cell mapping errors
    # at O(0.1-1).
    for ref_branch, got_branch in zip((ref_pose, ref_par),
                                      (got_pose, got_par)):
        for (rm, ra), (gm, ga) in zip(ref_branch, got_branch):
            np.testing.assert_allclose(np.asarray(gm), np.asarray(rm),
                                       rtol=0, atol=5e-3)
            np.testing.assert_allclose(np.asarray(ga), np.asarray(ra),
                                       rtol=0, atol=5e-3)
