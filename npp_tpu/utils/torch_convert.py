"""Reference-checkpoint converter: torch ``model_augment.Network``
state_dict -> NPPNet flax variables.

Exists for two reasons:
1. **Full-model parity proof** — load identical weights into both
   implementations and assert forward equality
   (tests/test_reference_parity_model.py), the credible stand-in for the
   <=0.1pt mIoU/PCKh target while no LIP images are mounted.
2. **Checkpoint migration** — users of the reference can bring released
   `.pth` checkpoints (reference README.md:19-21) onto TPU.

Matching strategy: both implementations compile the same genotypes into
the same macro-topology, so leaf modules correspond 1:1. Torch leaves are
grouped by (top module, instance index, cell submodule) buckets in
state_dict (= registration = execution) order; flax leaves sort into the
same order within those buckets; convs pair with convs and BNs with BNs by
ordinal. Conv kernels transpose OIHW -> HWIO; BN weight/bias -> scale/bias
and running stats -> batch_stats.

Reference module names (model_augment.py:231-400): stem0..5, cells1/2,
_ops1/_ops2 (encoder injections), up_ops1/up_ops2 (decoder injections),
upsamples1/2, pose_layer/pose_auxlayer/par_layer/edge_layer (necks),
pose_net/par_net (refinement cells), pose_head/pose_auxnet/par_head/
edge_head (stage heads).
"""
from __future__ import annotations

import re

import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict

# our top-level base name -> torch top-level name (indexed modules).
_INDEXED_TOPS = {
    "cells1": "cells1",
    "cells2": "cells2",
    "inj_ops1": "_ops1",
    "inj_ops2": "_ops2",
    "up_inj_ops1": "up_ops1",
    "up_inj_ops2": "up_ops2",
    "upsamples1": "upsamples1",
    "upsamples2": "upsamples2",
    "pose_net": "pose_net",
    "par_net": "par_net",
    "pose_head": "pose_head",
    "pose_auxnet": "pose_auxnet",
    "par_head": "par_head",
    "edge_head": "edge_head",
}
_IDX_RE = re.compile(r"^(.*?)_(\d+)$")


def _flax_bucket(path: tuple[str, ...]):
    """(top, idx, second) bucket for one of our param paths."""
    m = _IDX_RE.match(path[0])
    if m and m.group(1) in _INDEXED_TOPS:
        top, idx = _INDEXED_TOPS[m.group(1)], int(m.group(2))
        rest = path[1:]
    else:
        top, idx, rest = path[0], None, path[1:]
    second = None
    if rest:
        if rest[0].startswith("preprocess"):
            second = rest[0]
        else:
            m2 = _IDX_RE.match(rest[0])
            if m2 and m2.group(1) == "ops":
                second = ("ops", int(m2.group(2)))
    return top, idx, second


_TORCH_INDEXED = set(_INDEXED_TOPS.values())


def _torch_bucket(prefix: str):
    comp = prefix.split(".")
    top = comp[0]
    idx = None
    rest = comp[1:]
    if top in _TORCH_INDEXED and rest and rest[0].isdigit():
        idx = int(rest[0])
        rest = rest[1:]
    second = None
    if rest:
        if rest[0].startswith("preprocess"):
            second = rest[0]
        elif rest[0] == "_ops" and len(rest) > 1 and rest[1].isdigit():
            second = ("ops", int(rest[1]))
    return top, idx, second


def _torch_leaves(state_dict):
    """Group a torch state_dict into leaf modules, classified conv/bn,
    bucketed, in registration order."""
    leaves: dict[str, dict] = {}
    for key, val in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        prefix, pname = key.rsplit(".", 1)
        leaves.setdefault(prefix, {})[pname] = np.asarray(val)
    buckets: dict[tuple, dict[str, list]] = {}
    for prefix, params in leaves.items():
        if "running_mean" in params:
            kind = "bn"
        elif params.get("weight") is not None and params["weight"].ndim == 4:
            kind = "conv"
        else:
            raise ValueError(f"unclassifiable torch leaf module: {prefix} "
                             f"({sorted(params)})")
        b = buckets.setdefault(_torch_bucket(prefix), {"conv": [], "bn": []})
        b[kind].append((prefix, params))
    return buckets


def convert_reference_state_dict(state_dict, flax_variables) -> dict:
    """Returns new flax variables ({'params', 'batch_stats'}) with every
    conv/BN leaf replaced by the reference checkpoint's values.

    ``state_dict``: torch name -> array-like (tensors or numpy).
    ``flax_variables``: target-structure variables (e.g. ``model.init``
    output); used for structure only, all conv/BN leaves are overwritten.
    """
    torch_buckets = _torch_leaves(state_dict)

    params = dict(flatten_dict(flax_variables["params"]))
    stats = dict(flatten_dict(flax_variables["batch_stats"]))

    # Collect our conv / bn leaf-module path prefixes per bucket, sorted.
    ours: dict[tuple, dict[str, list]] = {}
    for path in sorted(params):
        if path[-1] == "kernel":
            kind, prefix = "conv", path[:-1]
        elif path[-1] == "scale":
            kind, prefix = "bn", path[:-1]
        else:
            continue
        b = ours.setdefault(_flax_bucket(path), {"conv": [], "bn": []})
        b[kind].append(prefix)

    unmatched = set(torch_buckets) ^ set(ours)
    if unmatched:
        raise ValueError(
            f"bucket mismatch: {sorted(unmatched, key=repr)[:8]}")

    n_conv = n_bn = 0
    for key, tb in torch_buckets.items():
        ob = ours[key]
        if len(tb["bn"]) > len(ob["bn"]):
            # Reference SE_Block registers a BN that is dead at stride 1
            # (operations.py:117,126-129); our SEBlock only materializes it
            # when used. Drop the dead ones.
            conv_prefixes = {p for p, _ in tb["conv"]}
            tb["bn"] = [
                (p, v) for p, v in tb["bn"]
                if not (p.endswith(".bn")
                        and p[:-3] + ".conv1" in conv_prefixes)
            ]
        for kind in ("conv", "bn"):
            if len(tb[kind]) != len(ob[kind]):
                raise ValueError(
                    f"{key}: {kind} count mismatch "
                    f"{[p for p, _ in tb[kind]]} vs {ob[kind]}")
        for (tprefix, tp), oprefix in zip(tb["conv"], ob["conv"]):
            kernel = np.transpose(tp["weight"], (2, 3, 1, 0))
            tgt = params[oprefix + ("kernel",)]
            if kernel.shape != tgt.shape:
                raise ValueError(f"{tprefix}->{'/'.join(oprefix)}: "
                                 f"{kernel.shape} vs {tgt.shape}")
            params[oprefix + ("kernel",)] = kernel.astype(tgt.dtype)
            if "bias" in tp:
                bias = tp["bias"]
                params[oprefix + ("bias",)] = bias.astype(
                    params[oprefix + ("bias",)].dtype)
            n_conv += 1
        for (tprefix, tp), oprefix in zip(tb["bn"], ob["bn"]):
            if tp["weight"].shape != params[oprefix + ("scale",)].shape:
                raise ValueError(f"{tprefix}->{'/'.join(oprefix)}: bn shape")
            params[oprefix + ("scale",)] = tp["weight"].astype(np.float32)
            params[oprefix + ("bias",)] = tp["bias"].astype(np.float32)
            stats[oprefix + ("mean",)] = tp["running_mean"].astype(np.float32)
            stats[oprefix + ("var",)] = tp["running_var"].astype(np.float32)
            n_bn += 1

    out = dict(flax_variables)
    out["params"] = unflatten_dict(params)
    out["batch_stats"] = unflatten_dict(stats)
    return out, {"conv": n_conv, "bn": n_bn}
