"""Profiling / tracing helpers.

The reference's only profiling surface is a forward-hook FLOPs counter and
batch-time meters (SURVEY.md §5). TPU-native equivalents:
- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory;
- :func:`timed_steps` — honest step timing on the axon dev tunnel
  (chained data-dependent executions + value fetch; see bench.py notes);
- :func:`step_cost` — XLA cost analysis (flops / bytes) of a jitted fn.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace('/tmp/trace'): ...`` -> TensorBoard trace."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def step_cost(fn: Callable, *args) -> dict:
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    mem = {}
    try:
        m = compiled.memory_analysis()
        mem = {"temp_bytes": getattr(m, "temp_size_in_bytes", None),
               "argument_bytes": getattr(m, "argument_size_in_bytes", None),
               "output_bytes": getattr(m, "output_size_in_bytes", None)}
    except Exception:
        pass
    return {"flops": ca.get("flops"),
            "bytes_accessed": ca.get("bytes accessed"), **mem}


def timed_steps(fn: Callable, *args, iters: int = 8) -> float:
    """Seconds per execution of ``fn(*args)`` measured with a
    data-dependent in-jit chain + scalar fetch (trustworthy on remote
    runtimes where block_until_ready lies). ``fn`` must accept its first
    arg perturbed by a tiny scalar and return something reducible.

    The final value fetch costs one tunnel round trip (~30ms on the dev
    relay) amortized over ``iters`` — use iters >= 32 when timing
    sub-millisecond kernels."""

    @jax.jit
    def chain(*a):
        def body(i, acc):
            out = fn(a[0] + acc * 1e-20, *a[1:])
            first = jax.tree.leaves(out)[0]
            return acc + jnp.mean(first.astype(jnp.float32)) * 1e-20
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(chain(*args))  # compile + warm
    t0 = time.perf_counter()
    float(chain(*args))
    return (time.perf_counter() - t0) / iters
