"""Forward-pass tests for the fixed NPPNet (model_augment.py parity shapes)."""
import jax
import jax.numpy as jnp
import numpy as np


def test_forward_shapes(tiny_model_bundle):
    model, variables, x = tiny_model_bundle
    fwd = jax.jit(model.apply, static_argnames=("train",))
    pose_list, par_list = fwd(variables, x, train=False)
    b, h, w = x.shape[0], x.shape[1] // 4, x.shape[2] // 4
    # refine_layers + 1 stages, each (map, aux) (model_augment.py:560-574).
    assert len(pose_list) == 2 and len(par_list) == 2
    for pose_map, pose_aux in pose_list:
        assert pose_map.shape == (b, h, w, model.num_joints)
        assert pose_aux.shape == (b, h, w, model.num_joints)
    for par_map, edge in par_list:
        assert par_map.shape == (b, h, w, model.num_classes)
        assert edge.shape == (b, h, w, 2)


def test_forward_is_finite(tiny_model_bundle):
    model, variables, _ = tiny_model_bundle
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    fwd = jax.jit(model.apply, static_argnames=("train",))
    pose_list, par_list = fwd(variables, x, train=False)
    for pm, pa in pose_list:
        assert np.isfinite(np.asarray(pm)).all()
        assert np.isfinite(np.asarray(pa)).all()
    for pm, ed in par_list:
        assert np.isfinite(np.asarray(pm)).all()
        assert np.isfinite(np.asarray(ed)).all()


def test_train_mode_updates_batch_stats(tiny_model_bundle):
    model, variables, x = tiny_model_bundle

    def step(v, x):
        return model.apply(v, x, train=True, mutable=["batch_stats"])

    out, mutated = jax.jit(step)(variables, x)
    assert "batch_stats" in mutated
    # Batch stats must actually change from their init values.
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(after, before))


def test_batch_independence(tiny_model_bundle):
    """Eval-mode forward must be independent across batch elements."""
    model, variables, _ = tiny_model_bundle
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    fwd = jax.jit(model.apply, static_argnames=("train",))
    pose_full, _ = fwd(variables, x, train=False)
    pose_single, _ = fwd(variables, x[:1], train=False)
    # Tolerance covers fp reassociation between batch shapes; genuine
    # cross-batch coupling (e.g. train-mode BN) diverges at O(0.1).
    np.testing.assert_allclose(np.asarray(pose_full[0][0][0]),
                               np.asarray(pose_single[0][0][0]),
                               rtol=0, atol=5e-3)


def test_fused_necks_exact(tiny_model_bundle):
    """fused_necks=True + fuse_neck_variables must reproduce the unfused
    forward exactly (both modes): conv output channels are independent and
    BN statistics are per-channel, so channel-concatenating each stream's
    two necks is function-preserving."""
    from npp_tpu.models.augment import (fuse_neck_variables,
                                        unfuse_neck_variables)

    model, variables, _ = tiny_model_bundle
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    fused_model = model.clone(fused_necks=True)
    fused_vars = fuse_neck_variables(variables)
    # The transform only rewrites the four neck subtrees.
    assert "neck1" in fused_vars["params"]
    assert "pose_layer" not in fused_vars["params"]
    assert set(variables["params"]) - set(fused_vars["params"]) == {
        "pose_layer", "pose_auxlayer", "par_layer", "edge_layer"}
    # The inverse transform round-trips bit-exactly (it's a split of the
    # concatenation — no arithmetic).
    back = unfuse_neck_variables(fused_vars)
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    fwd = jax.jit(model.apply, static_argnames=("train",))
    ffwd = jax.jit(fused_model.apply, static_argnames=("train",))
    ref_pose, ref_par = fwd(variables, x, train=False)
    got_pose, got_par = ffwd(fused_vars, x, train=False)
    for (rm, ra), (gm, ga) in zip(ref_pose, got_pose):
        np.testing.assert_allclose(np.asarray(gm), np.asarray(rm),
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(ra),
                                   rtol=0, atol=1e-5)
    for (rm, re), (gm, ge) in zip(ref_par, got_par):
        np.testing.assert_allclose(np.asarray(gm), np.asarray(rm),
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ge), np.asarray(re),
                                   rtol=0, atol=1e-5)

    # Train mode: outputs AND updated batch stats must agree — the fused
    # BN's moments are the per-channel concatenation of the unfused ones.
    step = jax.jit(lambda v, x: model.apply(
        v, x, train=True, mutable=["batch_stats"]))
    fstep = jax.jit(lambda v, x: fused_model.apply(
        v, x, train=True, mutable=["batch_stats"]))
    (ref_out, ref_mut) = step(variables, x)
    (got_out, got_mut) = fstep(fused_vars, x)
    # atol 1e-4: CPU convs reassociate differently between the 896-wide
    # and 384/512-wide kernels (documented ~1e-4 noise floor); a genuine
    # fusion bug (wrong concat order, mixed BN stats) errors at O(0.1).
    np.testing.assert_allclose(np.asarray(got_out[1][-1][0]),
                               np.asarray(ref_out[1][-1][0]),
                               rtol=0, atol=1e-4)
    refused = fuse_neck_variables(ref_mut)
    for a, b in zip(jax.tree.leaves(refused["batch_stats"]),
                    jax.tree.leaves(got_mut["batch_stats"])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=1e-4)


def test_merged_streams_exact(tiny_model_bundle):
    """merged_streams=True + merge_stream_variables must reproduce the
    standard forward: the vmapped cell pair runs each stream's weights on
    its own stream slice, so stacking the stem/cell subtrees on a leading
    stream axis is function-preserving."""
    from npp_tpu.models.augment import (merge_stream_variables,
                                        unmerge_stream_variables)

    model, variables, _ = tiny_model_bundle
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    merged_model = model.clone(merged_streams=True)
    mv = merge_stream_variables(variables, model.layers)
    # Stacked stream axis on the vmapped cells' params.
    stem_kernel = jax.tree.leaves(mv["params"]["vstem_a"])[0]
    assert stem_kernel.shape[0] == 2
    assert "cells1_0" not in mv["params"] and "stem0" not in mv["params"]
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
    # through the encoder); a wrong stream/cell mapping errors at O(0.1).
    for ref_branch, got_branch in zip((ref_pose, ref_par),
                                      (got_pose, got_par)):
        for (rm, ra), (gm, ga) in zip(ref_branch, got_branch):
            np.testing.assert_allclose(np.asarray(gm), np.asarray(rm),
                                       rtol=0, atol=5e-3)
            np.testing.assert_allclose(np.asarray(ga), np.asarray(ra),
                                       rtol=0, atol=5e-3)


def test_fused_cells_exact(tiny_model_bundle):
    """fused_cells=True + fuse_sibling_variables must reproduce the
    standard forward (both modes): same-input std-conv edges merge into
    one K-wide conv + one concatenated BN (output channels independent,
    BN per-channel), slices restore each edge's contribution.

    The released genotypes make this worthwhile: the encoder normal cell
    carries three std_conv_3x3 edges all reading state 0 (one 3x-wider
    MXU matmul instead of three), and the decoder upsample cells are
    1x1-conv-heavy (whose 2x upsample then runs once per group)."""
    from npp_tpu.models.augment import (fuse_sibling_variables,
                                        unfuse_sibling_variables)
    from npp_tpu.models.cells import sibling_groups

    model, variables, _ = tiny_model_bundle
    # The released genotypes must actually produce groups.
    assert len(sibling_groups(model.encoder.normal)) >= 1
    assert len(sibling_groups(model.decoder.upsample1)) >= 1

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    fused_model = model.clone(fused_cells=True)
    fused_vars = fuse_sibling_variables(variables, model)
    assert "sib_0" in fused_vars["params"]["cells1_0"]
    # Inverse round-trips bit-exactly (split of a concat, no arithmetic).
    back = unfuse_sibling_variables(fused_vars, model)
    assert jax.tree.structure(back) == jax.tree.structure(variables)
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    fwd = jax.jit(model.apply, static_argnames=("train",))
    ffwd = jax.jit(fused_model.apply, static_argnames=("train",))
    ref_pose, ref_par = fwd(variables, x, train=False)
    got_pose, got_par = ffwd(fused_vars, x, train=False)
    # atol 2e-4: the K-wide CPU conv reassociates differently than K
    # narrow ones (documented CPU conv noise); a wrong group/slot mapping
    # errors at O(0.1).
    for ref_branch, got_branch in zip((ref_pose, ref_par),
                                      (got_pose, got_par)):
        for (rm, ra), (gm, ga) in zip(ref_branch, got_branch):
            np.testing.assert_allclose(np.asarray(gm), np.asarray(rm),
                                       rtol=0, atol=2e-4)
            np.testing.assert_allclose(np.asarray(ga), np.asarray(ra),
                                       rtol=0, atol=2e-4)

    # Train mode: outputs and updated running stats agree after mapping
    # the mutated stats through the same transform.
    step = jax.jit(lambda v, x: model.apply(
        v, x, train=True, mutable=["batch_stats"]))
    fstep = jax.jit(lambda v, x: fused_model.apply(
        v, x, train=True, mutable=["batch_stats"]))
    ref_out, ref_mut = step(variables, x)
    got_out, got_mut = fstep(fused_vars, x)
    np.testing.assert_allclose(np.asarray(got_out[1][-1][0]),
                               np.asarray(ref_out[1][-1][0]),
                               rtol=0, atol=5e-4)
    refused = fuse_sibling_variables(ref_mut, model)
    for a, b in zip(jax.tree.leaves(refused["batch_stats"]),
                    jax.tree.leaves(got_mut["batch_stats"])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=5e-4)


def test_fused_dil_sep_groups_exact():
    """Dil/sep-conv sibling groups (SiblingDilGroup / SiblingSepGroup)
    must reproduce the standard forward in both modes.

    The released genotypes only carry one dil pair (fusion.par state 2),
    so this builds an encoder genotype dense in the new group types:
    a dil_conv_3x3_2 pair, a sep_conv_3x3 pair, and stride-2
    dil_conv_3x3_4 / sep_conv_5x5 pairs in the reduce cell (exercising
    the blocked tile -> grouped depthwise -> grouped pointwise chain at
    both strides)."""
    from npp_tpu import genotypes as gt
    from npp_tpu.models.augment import (NPPNet, fuse_sibling_variables,
                                        unfuse_sibling_variables)
    from npp_tpu.models.cells import (ALL_SIBLING_FAMILIES,
                                      DEFAULT_SIBLING_FAMILIES,
                                      sibling_groups)

    # With families=ALL the released par fusion cell yields a dil group;
    # the measured-best DEFAULT excludes the dil/sep families (BENCH.md).
    released = dict(sibling_groups(gt.FUSION.par,
                                   families=ALL_SIBLING_FAMILIES))
    assert any(k[0] == "dil_conv_3x3_2" for k in released)
    assert not any(k[0] == "dil_conv_3x3_2"
                   for k in dict(sibling_groups(gt.FUSION.par)))

    enc = gt.Genotype(
        normal=gt._edges([("dil_conv_3x3_2", 0), ("dil_conv_3x3_2", 0),
                          ("sep_conv_3x3", 1), ("sep_conv_3x3", 1),
                          ("std_conv_3x3", 0), ("skip_connect", 2),
                          ("std_conv_1x1", 3), ("max_pool_3x3", 1)]),
        normal_concat=(2, 3, 4, 5),
        reduce=gt._edges([("dil_conv_3x3_4", 0), ("dil_conv_3x3_4", 0),
                          ("sep_conv_5x5", 1), ("sep_conv_5x5", 1),
                          ("std_conv_3x3", 2), ("skip_connect", 2),
                          ("se_connect", 3), ("max_pool_3x3", 2)]),
        reduce_concat=(2, 3, 4, 5),
    )
    g_norm = sibling_groups(enc.normal, families=ALL_SIBLING_FAMILIES)
    g_red = sibling_groups(enc.reduce, reduction=True,
                           families=ALL_SIBLING_FAMILIES)
    assert [k[0] for k, _ in g_norm] == ["dil_conv_3x3_2", "sep_conv_3x3"]
    assert [(k[0], k[2]) for k, _ in g_red] == [
        ("dil_conv_3x3_4", 2), ("sep_conv_5x5", 2)]

    model = NPPNet(num_classes=7, num_joints=14, layers=4, init_channels=8,
                   refine_layers=1, encoder=enc,
                   sibling_families=ALL_SIBLING_FAMILIES, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(7).standard_normal(
        (2, 64, 64, 3)), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)

    fused_model = model.clone(fused_cells=True)
    fused_vars = fuse_sibling_variables(variables, model)
    # Inverse round-trips bit-exactly.
    back = unfuse_sibling_variables(fused_vars, model)
    assert jax.tree.structure(back) == jax.tree.structure(variables)
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    fwd = jax.jit(model.apply, static_argnames=("train",))
    ffwd = jax.jit(fused_model.apply, static_argnames=("train",))
    ref_pose, ref_par = fwd(variables, x, train=False)
    got_pose, got_par = ffwd(fused_vars, x, train=False)
    for ref_branch, got_branch in zip((ref_pose, ref_par),
                                      (got_pose, got_par)):
        for (rm, ra), (gm, ga) in zip(ref_branch, got_branch):
            np.testing.assert_allclose(np.asarray(gm), np.asarray(rm),
                                       rtol=0, atol=2e-4)
            np.testing.assert_allclose(np.asarray(ga), np.asarray(ra),
                                       rtol=0, atol=2e-4)

    # Train mode: outputs + mapped running stats agree.
    step = jax.jit(lambda v, x: model.apply(
        v, x, train=True, mutable=["batch_stats"]))
    fstep = jax.jit(lambda v, x: fused_model.apply(
        v, x, train=True, mutable=["batch_stats"]))
    ref_out, ref_mut = step(variables, x)
    got_out, got_mut = fstep(fused_vars, x)
    # atol 2e-3 (vs 5e-4 in test_fused_cells_exact): the dil/sep chains
    # stack two reassociating CPU convs per edge and the train-mode BN
    # divides small batch moments — measured worst case 6e-4; a wrong
    # group/slot mapping errors at O(0.1).
    np.testing.assert_allclose(np.asarray(got_out[1][-1][0]),
                               np.asarray(ref_out[1][-1][0]),
                               rtol=0, atol=2e-3)
    refused = fuse_sibling_variables(ref_mut, model)
    for a, b in zip(jax.tree.leaves(refused["batch_stats"]),
                    jax.tree.leaves(got_mut["batch_stats"])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=2e-3)
