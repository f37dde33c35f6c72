"""VSearchFusionCell (vmapped edge groups) must equal SearchFusionCell
(unrolled) given the same per-edge parameters.

Tolerance is bounded by the CPU conv path: batched (vmapped) convolutions
lower through a different XLA algorithm than individual convs on CPU,
giving ~1e-4 relative noise; on TPU the search runs in bf16 where this is
far below rounding.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict

from npp_tpu.models.search import SearchFusionCell, VSearchFusionCell

# (start, n_edges) of each step's beta/alpha slice: steps have 3..6 edges.
STEP_GROUPS = ((0, 3), (3, 4), (7, 5), (12, 6))


def _transplant(src_flat, dst_flat):
    """Stack the unrolled cell's per-edge op params into the vmapped
    cell's per-step stacked layout."""
    out = dict(dst_flat)
    for path in dst_flat:
        if path[0].startswith("step_ops_"):
            step = int(path[0].split("_")[-1])
            start, n = STEP_GROUPS[step]
            out[path] = jnp.stack(
                [src_flat[(f"ops_{start + j}",) + path[1:]]
                 for j in range(n)])
        elif path[0].startswith("preprocess"):
            out[path] = src_flat[path]
    return out


def test_vmapped_fusion_cell_matches_unrolled():
    c = 8
    a = SearchFusionCell(c, dtype=jnp.float32)
    b = VSearchFusionCell(c, dtype=jnp.float32)
    x = [jax.random.normal(jax.random.PRNGKey(i), (2, 16, 16, c))
         for i in range(3)]
    aw = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(7), (18, 7)),
                        -1)
    bw = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(8), (18,)), -1)
    va = a.init(jax.random.PRNGKey(0), *x, aw, bw, False)
    vb = b.init(jax.random.PRNGKey(0), *x, aw, bw, False)
    vb2 = {
        "params": unflatten_dict(_transplant(
            flatten_dict(va["params"]), flatten_dict(vb["params"]))),
        "batch_stats": unflatten_dict(_transplant(
            flatten_dict(va["batch_stats"]),
            flatten_dict(vb["batch_stats"]))),
    }
    ya = a.apply(va, *x, aw, bw, False)
    yb = b.apply(vb2, *x, aw, bw, False)
    for p, q in zip(ya, yb):
        rel = float(jnp.max(jnp.abs(p - q))
                    / (jnp.max(jnp.abs(p)) + 1e-9))
        assert rel < 5e-4, rel


def test_vmapped_fusion_cell_param_count_matches():
    """Stacking must not change the total parameter count."""
    c = 8
    x = [jnp.zeros((1, 8, 8, c))] * 3
    aw = jnp.zeros((18, 7))
    bw = jnp.zeros((18,))
    counts = []
    for cls in (SearchFusionCell, VSearchFusionCell):
        v = cls(c, dtype=jnp.float32).init(
            jax.random.PRNGKey(0), *x, aw, bw, False)
        counts.append(sum(np.prod(p.shape)
                          for p in jax.tree.leaves(v["params"])))
    assert counts[0] == counts[1], counts
