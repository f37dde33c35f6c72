"""Model cost summary: params + FLOPs.

TPU-native replacement for reference ``get_model_summary``
(utils/utils.py:68-184, forward-hook based): parameter counts come from
the param pytree; FLOPs come from XLA's compiled cost analysis — exact for
the fused program rather than a conv/linear-only estimate.
"""
from __future__ import annotations

import jax
import numpy as np


def count_parameters(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))


def count_parameters_in_mb(params) -> float:
    """Parameter count / 2^20 (utils/utils.py:187-189 counts elements,
    not bytes — we keep that convention)."""
    return count_parameters(params) / (1024 * 1024)


def model_flops(fn, *args) -> float:
    """Total FLOPs of the jitted fn from XLA cost analysis."""
    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", float("nan")))


def get_model_summary(model, variables, sample_input, train: bool = False
                      ) -> dict:
    params = variables.get("params", variables)
    flops = model_flops(
        lambda v, x: model.apply(v, x, train=train), variables, sample_input)
    return {
        "params": count_parameters(params),
        "params_mb": count_parameters_in_mb(params),
        "flops": flops,
        "gflops": flops / 1e9,
        "input_shape": tuple(sample_input.shape),
    }
