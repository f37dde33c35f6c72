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


def _decode_varint(buf: memoryview, i: int):
    shift = res = 0
    while True:
        b = buf[i]
        i += 1
        res |= (b & 0x7F) << shift
        if not b & 0x80:
            return res, i
        shift += 7


def _iter_fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over a protobuf message.
    Length-delimited values come back as memoryviews."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _decode_varint(buf, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _decode_varint(buf, i)
        elif wt == 1:
            v = bytes(buf[i:i + 8])
            i += 8
        elif wt == 2:
            ln, i = _decode_varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = bytes(buf[i:i + 4])
            i += 4
        else:  # groups unused by xplane
            raise ValueError(f"wire type {wt}")
        yield fn, wt, v


def aggregate_xplane(trace_dir: str, plane_filter: str = "TPU",
                     line_filter: str = "XLA Ops") -> dict:
    """Aggregate device-op durations from a ``trace()`` capture.

    Reads the ``*.xplane.pb`` under ``trace_dir`` with a minimal
    protobuf wire-format reader (no tensorflow/tensorboard dependency in
    this image) and returns ``{op_name: {"ps": total_ps, "count": n}}``
    for events on lines whose name contains ``line_filter`` within
    planes whose name contains ``plane_filter``, plus a ``"_total"``
    entry. Schema verified against a live capture (xplane.proto):
    XSpace.planes=1; XPlane{name=2, lines=3,
    event_metadata=4 map entries {1: id, 2: XEventMetadata{1: id,
    2: name}}}; XLine{name=2, events=4};
    XEvent{metadata_id=1, offset_ps=2, duration_ps=3}. The default
    filters select the device-op ("XLA Ops") line of the TPU plane —
    the roofline numerator; host/python lines are excluded."""
    import glob as _glob
    import os as _os

    paths = sorted(_glob.glob(
        _os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    agg: dict = {}
    total = 0
    for path in paths:
        space = memoryview(open(path, "rb").read())
        for fn, wt, plane in _iter_fields(space):
            if fn != 1 or wt != 2:
                continue
            name = ""
            metas: dict = {}
            lines = []
            for pfn, pwt, pv in _iter_fields(plane):
                if pfn == 2 and pwt == 2:
                    name = bytes(pv).decode("utf-8", "replace")
                elif pfn == 3 and pwt == 2:
                    lines.append(pv)
                elif pfn == 4 and pwt == 2:
                    k = sub = None
                    for mfn, _mwt, mv in _iter_fields(pv):
                        if mfn == 1:
                            k = mv
                        elif mfn == 2:
                            sub = mv
                    if k is not None and sub is not None:
                        mname = ""
                        for efn, ewt, ev in _iter_fields(sub):
                            if efn == 2 and ewt == 2:
                                mname = bytes(ev).decode("utf-8", "replace")
                        metas[k] = mname
            if plane_filter not in name:
                continue
            for line in lines:
                lname = ""
                events = []
                for lfn, lwt, lv in _iter_fields(line):
                    if lfn == 2 and lwt == 2:
                        lname = bytes(lv).decode("utf-8", "replace")
                    elif lfn == 4 and lwt == 2:
                        events.append(lv)
                if line_filter and line_filter not in lname:
                    continue
                for ev in events:
                    mid = dur = 0
                    for efn, ewt, evv in _iter_fields(ev):
                        if efn == 1 and ewt == 0:
                            mid = evv
                        elif efn == 3 and ewt == 0:
                            dur = evv
                    op = metas.get(mid, f"meta_{mid}")
                    d = agg.setdefault(op, {"ps": 0, "count": 0})
                    d["ps"] += dur
                    d["count"] += 1
                    total += dur
    agg["_total"] = {"ps": total, "count": sum(
        v["count"] for k, v in agg.items() if k != "_total")}
    return agg


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
