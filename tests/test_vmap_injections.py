"""Vmapped injection layout (inj_diag/inj_grp/up_diag/up_grp) must equal
the unrolled per-edge MixedOps given migrated parameters.

Equivalence argument: the bilinear cross-scale resize is linear, so
hoisting it outside the alpha-weighted primitive sum (InjectionGroup) is
the same function; vmap stacking changes only the conv batching.

Evidence ladder:
- ``test_injection_group_exact_float64``: one InjectionGroup vs its
  per-edge MixedOps in float64 — machine-exact (measured ~2e-15), the
  proof the layouts are the SAME FUNCTION.
- ``test_vmapped_injections_match_unrolled``: whole supernet in fp32 —
  loose tolerance. CPU lowers batched (vmapped) convs through a
  different algorithm than unrolled ones (~5e-4 relative PER EDGE,
  measured in isolation; the verify skill's known CPU-conv caveat), and
  the encoder injections sit mid-network, so per-edge noise compounds
  through the remaining ~12 layers — measured ~5.5e-3 end-to-end.
  fp32 noise, not a layout bug (see the float64 test).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from npp_tpu.models.search import SearchNet
from npp_tpu.utils.torch_convert import convert_injection_layout

# Slow tier: compile-heavy / subprocess / reference-scale (see pytest.ini).
pytestmark = pytest.mark.slow

KW = dict(num_classes=5, num_joints=4, layers=8, init_channels=8,
          refine_layers=1, remat=False, dtype=jnp.float32)


@pytest.fixture(scope="module")
def unrolled_bundle():
    model = SearchNet(vmap_injections=False, **KW)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(1), x, train=False)
    # Non-degenerate arch params so the mixing weights aren't uniform.
    params = dict(variables["params"])
    for k in params:
        if k.startswith(("alphas", "betas")):
            params[k] = 0.3 * jax.random.normal(
                jax.random.PRNGKey(hash(k) % 2**31), params[k].shape)
    variables = {"params": params,
                 "batch_stats": variables["batch_stats"]}
    return model, variables, x


def test_vmapped_injections_match_unrolled(unrolled_bundle):
    model_u, vu, x = unrolled_bundle
    model_v = SearchNet(vmap_injections=True, **KW)
    vv = {c: convert_injection_layout(t, True) for c, t in vu.items()}

    ya = jax.jit(model_u.apply, static_argnames=("train",))(vu, x,
                                                            train=False)
    yb = jax.jit(model_v.apply, static_argnames=("train",))(vv, x,
                                                            train=False)
    for branch_a, branch_b in zip(ya, yb):
        for (pa, aa), (pb, ab) in zip(branch_a, branch_b):
            for p, q in ((pa, pb), (aa, ab)):
                rel = float(jnp.max(jnp.abs(p - q))
                            / (jnp.max(jnp.abs(p)) + 1e-9))
                # fp32 CPU batched-vs-unrolled conv noise compounded
                # through the net (see module docstring); float64
                # equivalence below is machine-exact.
                assert rel < 2e-2, rel


def test_injection_group_exact_float64():
    """One InjectionGroup == its per-edge MixedOps, in float64: the
    layouts are the same mathematical function (fp32 deltas elsewhere
    are conv-lowering numerics)."""
    from npp_tpu import genotypes as gt
    from npp_tpu.models.search import InjectionGroup, MixedOp
    from npp_tpu.utils.torch_convert import _stack_subtrees

    with jax.enable_x64():
        C, up_scales, extras = 16, (0.5, 0.25), (32, 64)
        D, DT = len(up_scales), jnp.float64
        rng = np.random.default_rng(0)
        x1 = jnp.asarray(rng.standard_normal((2, 16, 16, C)), DT)
        x2 = jnp.asarray(rng.standard_normal((2, 16, 16, C)), DT)
        P = len(gt.PRIMITIVES_INTER)
        w1 = jax.nn.softmax(
            jnp.asarray(rng.standard_normal((D, P)), DT) * 0.3, axis=-1)
        w2 = jax.nn.softmax(
            jnp.asarray(rng.standard_normal((D, P)), DT) * 0.3, axis=-1)

        def to64(t):
            return jax.tree.map(
                lambda a: a.astype(DT)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, t)

        edges = []
        for s, x in ((0, x1), (1, x2)):
            for d in range(D):
                m = MixedOp(C, up_scales[d], extras[d], dtype=DT)
                v = to64(m.init(jax.random.PRNGKey(100 + s * D + d), x,
                                (w1 if s == 0 else w2)[d], False))
                edges.append((m, v))
        outs_u = [edges[s * D + d][0].apply(
                      edges[s * D + d][1], (x1, x2)[s],
                      (w1 if s == 0 else w2)[d], False)
                  for s in range(2) for d in range(D)]

        # Migrate the per-edge params into the stacked group layout
        # exactly the way convert_injection_layout does.
        grp = InjectionGroup(C, up_scales, extras, dtype=DT)
        cores, node, bs_cores = [], {}, []
        for s in range(2):
            for d in range(D):
                sub = dict(edges[s * D + d][1]["params"])
                node[f"projs_{s * D + d}"] = sub.pop("proj")
                cores.append(sub)
                bs_cores.append(dict(edges[s * D + d][1]["batch_stats"]))
        node["core"] = _stack_subtrees(cores)
        vv = {"params": node,
              "batch_stats": {"core": _stack_subtrees(bs_cores)}}
        c1, c2 = grp.apply(vv, x1, x2, w1, w2, False)

        for d in range(D):
            for cv, cu in ((c1[d], outs_u[d]), (c2[d], outs_u[D + d])):
                rel = float(jnp.max(jnp.abs(cv - cu))
                            / (jnp.max(jnp.abs(cu)) + 1e-9))
                assert rel < 1e-9, rel


def test_injection_layout_round_trip(unrolled_bundle):
    """to_vmapped then back reproduces every leaf bit-exactly."""
    _, vu, _ = unrolled_bundle
    fwd = {c: convert_injection_layout(t, True) for c, t in vu.items()}
    back = {c: convert_injection_layout(t, False) for c, t in fwd.items()}
    flat_a = jax.tree_util.tree_leaves_with_path(vu)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path]))


def test_vmapped_injections_param_count_matches(unrolled_bundle):
    _, vu, _ = unrolled_bundle
    model_v = SearchNet(vmap_injections=True, **KW)
    vv = jax.eval_shape(
        lambda: model_v.init(jax.random.PRNGKey(1),
                             jnp.zeros((2, 64, 64, 3)), train=False))
    n_u = sum(int(np.prod(p.shape))
              for p in jax.tree.leaves(vu["params"]))
    n_v = sum(int(np.prod(p.shape))
              for p in jax.tree.leaves(dict(vv)["params"]))
    assert n_u == n_v, (n_u, n_v)
    # Migrated tree structure must match the vmapped init's structure.
    mig = {c: convert_injection_layout(t, True) for c, t in vu.items()}
    s1 = jax.tree_util.tree_structure(mig["params"])
    s2 = jax.tree_util.tree_structure(dict(vv)["params"])
    assert s1 == s2
