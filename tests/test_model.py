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


def test_merged_streams_variant():
    """merged_streams=True (vmapped dual-stream encoder) must produce the
    same output structure; weights are stacked so values differ from the
    separate-stream init, but shapes and finiteness must hold."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from npp_tpu.models.augment import NPPNet

    model = NPPNet(num_classes=5, num_joints=4, layers=8, init_channels=8,
                   refine_layers=1, merged_streams=True, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 64, 64, 3)),
                    jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)
    # Stacked stream axis on the vmapped cells' params.
    stem_kernel = jax.tree.leaves(variables["params"]["vstem_a"])[0]
    assert stem_kernel.shape[0] == 2
    pose_list, par_list = jax.jit(model.apply, static_argnames=("train",))(
        variables, x, train=False)
    assert pose_list[-1][0].shape == (1, 16, 16, 4)
    assert par_list[-1][0].shape == (1, 16, 16, 5)
    assert np.isfinite(np.asarray(pose_list[-1][0])).all()
