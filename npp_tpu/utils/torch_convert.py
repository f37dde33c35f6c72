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

# Indices of 'pool' primitives in PRIMITIVES_INTER: these MixedOp candidates
# get an extra affine-free BN appended (model_search_interact.py:48-49); our
# MixedOp stores them in a separate ``extra_bns`` list.
_POOL_EXTRA_BN = [3]  # 'max_pool_3x3' (genotypes.py:20-28)

# Tops whose (torch) children are MixedOps / compiled injection ops whose
# trailing-digit Sequential leaf is an adapter conv, not a head layer.
_MIXED_TORCH_TOPS = {"_ops1", "_ops2", "up_ops1", "up_ops2"}


def _flax_bucket(path: tuple[str, ...]):
    """(top, idx, chain) bucket for one of our param paths.

    ``chain`` walks nested op lists so that the search supernet's
    per-candidate modules bucket 1:1 with torch registration: each
    ``ops_N``/``step (torch ``_ops.N``) hop appends ('ops', N);
    preprocess convs keep their name; appendages — the MixedOp's appended
    pool-BN (ours: ``extra_bns_j``; torch: an all-digit Sequential tail)
    and adapter 1x1 convs (ours: ``proj``; torch: ``extra_conv`` or an
    all-digit tail) — map to a shared 'app' marker (conv/bn kinds are
    separated inside the bucket, so one marker serves both)."""
    m = _IDX_RE.match(path[0])
    if m and m.group(1) in _INDEXED_TOPS:
        top, idx = _INDEXED_TOPS[m.group(1)], int(m.group(2))
        rest = path[1:]
    else:
        top, idx, rest = path[0], None, path[1:]
    chain: list = []
    while rest:
        m2 = _IDX_RE.match(rest[0])
        if m2 and m2.group(1) == "ops":
            chain.append(("ops", int(m2.group(2))))
            rest = rest[1:]
            continue
        if m2 and m2.group(1) == "extra_bns":
            chain.append(("ops", _POOL_EXTRA_BN[int(m2.group(2))]))
            chain.append("app")
            break
        if rest[0].startswith("preprocess"):
            chain.append(rest[0])
            break
        if rest[0] == "proj":
            chain.append("app")
            break
        break
    return top, idx, tuple(chain)


_TORCH_INDEXED = set(_INDEXED_TOPS.values())


def _torch_bucket(prefix: str):
    comp = prefix.split(".")
    top = comp[0]
    idx = None
    rest = comp[1:]
    if top in _TORCH_INDEXED and rest and rest[0].isdigit():
        idx = int(rest[0])
        rest = rest[1:]
    chain: list = []
    while len(rest) >= 2 and rest[0] == "_ops" and rest[1].isdigit():
        chain.append(("ops", int(rest[1])))
        rest = rest[2:]
    if rest and rest[0].startswith("preprocess"):
        chain.append(rest[0])
        rest = rest[1:]
    elif rest and rest[0] == "extra_conv":
        chain.append("app")
        rest = rest[1:]
    elif (rest and all(c.isdigit() for c in rest)
          and (chain or top in _MIXED_TORCH_TOPS)):
        # Sequential-only tail: the appended pool-BN (search MixedOp) or
        # the Interpolate+1x1 adapter conv (compiled injection/fusion op,
        # model_augment.py:591-596).
        chain.append("app")
        rest = []
    return top, idx, tuple(chain)


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


def _paired_modules(state_dict, flax_variables):
    """Pair torch leaf modules with our leaf-module path prefixes.

    Returns ``(pairs, params, stats)``: ``pairs`` is a registration-order
    list of ``(kind, torch_prefix, torch_params, flax_prefix)`` with
    ``kind`` in {'conv', 'bn'}; ``params``/``stats`` are the flattened
    flax trees. Raises on any structural mismatch. The reference
    SE_Block's dead stride-1 BNs (operations.py:117,126-129) are dropped
    from the pairing (our SEBlock never materializes them)."""
    torch_buckets = _torch_leaves(state_dict)

    params = dict(flatten_dict(flax_variables["params"]))
    stats = dict(flatten_dict(flax_variables["batch_stats"]))

    # Collect our conv / bn leaf-module path prefixes per bucket, sorted.
    # BNs are discovered via batch_stats 'mean' (affine=False BNs — the
    # supernet MixedOp candidates — have no 'scale' param).
    ours: dict[tuple, dict[str, list]] = {}
    for path in sorted(params):
        if path[-1] != "kernel":
            continue
        b = ours.setdefault(_flax_bucket(path), {"conv": [], "bn": []})
        b["conv"].append(path[:-1])
    for path in sorted(stats):
        if path[-1] != "mean":
            continue
        b = ours.setdefault(_flax_bucket(path), {"conv": [], "bn": []})
        b["bn"].append(path[:-1])

    unmatched = set(torch_buckets) ^ set(ours)
    if unmatched:
        raise ValueError(
            f"bucket mismatch: {sorted(unmatched, key=repr)[:8]}")

    pairs = []
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
            for (tprefix, tp), oprefix in zip(tb[kind], ob[kind]):
                pairs.append((kind, tprefix, tp, oprefix))
    return pairs, params, stats


def convert_reference_state_dict(
        state_dict, flax_variables) -> tuple[dict, dict]:
    """Returns ``(variables, counts)``: new flax variables
    ({'params', 'batch_stats'}) with every conv/BN leaf replaced by the
    reference checkpoint's values, and ``counts`` =
    ``{'conv': n_converted_convs, 'bn': n_converted_bns}``.

    ``state_dict``: torch name -> array-like (tensors or numpy).
    ``flax_variables``: target-structure variables (e.g. ``model.init``
    output); used for structure only, all conv/BN leaves are overwritten.
    """
    pairs, params, stats = _paired_modules(state_dict, flax_variables)

    n_conv = n_bn = 0
    for kind, tprefix, tp, oprefix in pairs:
        if kind == "conv":
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
        else:
            if tp["running_mean"].shape != stats[oprefix + ("mean",)].shape:
                raise ValueError(f"{tprefix}->{'/'.join(oprefix)}: bn shape")
            has_affine = oprefix + ("scale",) in params
            if ("weight" in tp) != has_affine:
                raise ValueError(
                    f"{tprefix}->{'/'.join(oprefix)}: affine mismatch")
            if has_affine:
                params[oprefix + ("scale",)] = tp["weight"].astype(
                    np.float32)
                params[oprefix + ("bias",)] = tp["bias"].astype(np.float32)
            stats[oprefix + ("mean",)] = tp["running_mean"].astype(np.float32)
            stats[oprefix + ("var",)] = tp["running_var"].astype(np.float32)
            n_bn += 1

    out = dict(flax_variables)
    out["params"] = unflatten_dict(params)
    out["batch_stats"] = unflatten_dict(stats)
    return out, {"conv": n_conv, "bn": n_bn}


def export_reference_state_dict(
        flax_variables, template_state_dict) -> tuple[dict, dict]:
    """The inverse of :func:`convert_reference_state_dict`: NPPNet flax
    variables -> reference ``model_augment.Network`` state_dict, so
    TPU-trained checkpoints flow back to the reference ecosystem
    (reference ``tools``/eval scripts consume ``.pth`` state_dicts,
    augment_lip_sync.py:222-231).

    ``template_state_dict`` supplies the reference names/shapes/dtypes —
    build it as ``Network(cfg).state_dict()`` at the matching config.
    Returns ``(state_dict, counts)``: a name -> numpy dict with every
    conv/BN entry replaced by the flax values (kernels HWIO -> OIHW, BN
    scale/bias -> weight/bias, batch_stats -> running stats); unmapped
    entries (``num_batches_tracked``, the SE dead BNs) keep template
    values. Models in the fused-neck layout must be unfused first
    (``models.augment.unfuse_neck_variables``).

    Round-trip exactness is tested against the reference oracle
    (tests/test_reference_parity_model.py)."""
    pairs, params, stats = _paired_modules(template_state_dict,
                                           flax_variables)

    out = {k: np.asarray(v) for k, v in template_state_dict.items()}
    n_conv = n_bn = 0
    for kind, tprefix, tp, oprefix in pairs:
        if kind == "conv":
            kernel = np.asarray(params[oprefix + ("kernel",)])
            weight = np.transpose(kernel, (3, 2, 0, 1))
            tgt = out[tprefix + ".weight"]
            if weight.shape != tgt.shape:
                raise ValueError(f"{'/'.join(oprefix)}->{tprefix}: "
                                 f"{weight.shape} vs {tgt.shape}")
            out[tprefix + ".weight"] = weight.astype(tgt.dtype)
            if "bias" in tp:
                out[tprefix + ".bias"] = np.asarray(
                    params[oprefix + ("bias",)]).astype(tgt.dtype)
            n_conv += 1
        else:
            mean = np.asarray(stats[oprefix + ("mean",)])
            if mean.shape != np.shape(tp["running_mean"]):
                raise ValueError(f"{'/'.join(oprefix)}->{tprefix}: bn shape")
            has_affine = oprefix + ("scale",) in params
            if ("weight" in tp) != has_affine:
                raise ValueError(
                    f"{'/'.join(oprefix)}->{tprefix}: affine mismatch")
            if has_affine:
                out[tprefix + ".weight"] = np.asarray(
                    params[oprefix + ("scale",)]).astype(np.float32)
                out[tprefix + ".bias"] = np.asarray(
                    params[oprefix + ("bias",)]).astype(np.float32)
            out[tprefix + ".running_mean"] = mean.astype(np.float32)
            out[tprefix + ".running_var"] = np.asarray(
                stats[oprefix + ("var",)]).astype(np.float32)
            n_bn += 1
    return out, {"conv": n_conv, "bn": n_bn}


# Arch-parameter names shared by the reference supernet
# (model_search_interact.py:778-804) and our SearchNet.
_ARCH_PARAM_NAMES = (
    "alphas1", "alphas2", "alphas3", "alphas4", "alphas_pose", "alphas_par",
    "betas1", "betas2", "betas3", "betas4", "betas_pose", "betas_par",
)


def convert_reference_search_state_dict(state_dict, flax_variables):
    """Reference ``model_search_interact.Network`` state_dict -> SearchNet
    flax variables (alphas/betas included).

    ``flax_variables`` must come from a ``SearchNet(vmap_fusion=False)``
    (the unrolled fusion-cell layout, whose per-edge modules map 1:1 to
    torch registration); use :func:`fusion_unrolled_to_vmapped` afterwards
    for the default stacked layout. Returns (variables, counts)."""
    arch, rest = {}, {}
    for key, val in state_dict.items():
        if key in _ARCH_PARAM_NAMES:
            arch[key] = np.asarray(val)
        else:
            rest[key] = val
    if set(arch) != set(_ARCH_PARAM_NAMES):
        raise ValueError(f"missing arch params: "
                         f"{sorted(set(_ARCH_PARAM_NAMES) - set(arch))}")
    out, counts = convert_reference_state_dict(rest, flax_variables)
    params = dict(out["params"])
    for key, val in arch.items():
        tgt = np.asarray(params[key])
        if tgt.shape != val.shape:
            raise ValueError(f"{key}: {val.shape} vs {tgt.shape}")
        params[key] = val.astype(np.float32)
    out["params"] = params
    return out, dict(counts, arch=len(arch))


def export_reference_search_state_dict(flax_variables, template_state_dict):
    """SearchNet flax variables -> reference supernet state_dict
    (alphas/betas included) — inverse of
    :func:`convert_reference_search_state_dict`. ``flax_variables`` must
    be in the unrolled fusion layout (``convert_fusion_layout(tree,
    to_vmapped=False)`` migrates the default stacked layout)."""
    missing = [k for k in _ARCH_PARAM_NAMES if k not in template_state_dict]
    if missing:
        raise ValueError(f"template missing arch params: {missing}")
    rest = {k: v for k, v in template_state_dict.items()
            if k not in _ARCH_PARAM_NAMES}
    out, counts = export_reference_state_dict(flax_variables, rest)
    for key in _ARCH_PARAM_NAMES:
        val = np.asarray(flax_variables["params"][key])
        tgt = np.asarray(template_state_dict[key])
        if val.shape != tgt.shape:
            raise ValueError(f"{key}: {val.shape} vs {tgt.shape}")
        out[key] = val.astype(tgt.dtype)
    return out, dict(counts, arch=len(_ARCH_PARAM_NAMES))


def _convert_fusion_cell(cell: dict, to_vmapped: bool, steps: int = 4):
    import jax.numpy as jnp

    out = {k: v for k, v in cell.items() if not k.startswith(("ops_",
                                                              "step_ops_"))}
    offset = 0
    for i in range(steps):
        n = 3 + i
        if to_vmapped:
            edges = [flatten_dict(cell[f"ops_{offset + j}"])
                     for j in range(n)]
            stacked = {k: jnp.stack([e[k] for e in edges])
                       for k in edges[0]}
            out[f"step_ops_{i}"] = unflatten_dict(stacked)
        else:
            stacked = flatten_dict(cell[f"step_ops_{i}"])
            for j in range(n):
                out[f"ops_{offset + j}"] = unflatten_dict(
                    {k: v[j] for k, v in stacked.items()})
        offset += n
    return out


def convert_fusion_layout(tree, to_vmapped: bool, steps: int = 4):
    """Convert SearchNet pose_net_*/par_net_* fusion-cell subtrees between
    the unrolled per-edge layout (``ops_{e}``, SearchFusionCell) and the
    stacked vmapped layout (``step_ops_{i}`` with a leading edge axis,
    VSearchFusionCell). Works on any variable collection (params /
    batch_stats / optimizer moments with the same structure). Step ``i``
    stacks edges ``offset..offset+2+i`` in state order — exactly the vmap
    axis order of VSearchFusionCell."""
    out = {}
    for key, val in tree.items():
        if key.startswith(("pose_net_", "par_net_")):
            out[key] = _convert_fusion_cell(val, to_vmapped, steps)
        else:
            out[key] = val
    return out


def fusion_unrolled_to_vmapped(variables: dict, steps: int = 4) -> dict:
    """Migrate SearchNet variables saved in the pre-round-2 unrolled
    fusion layout (or produced by convert_reference_search_state_dict) to
    the vmap_fusion=True layout."""
    return {coll: convert_fusion_layout(tree, True, steps)
            for coll, tree in variables.items()}


# ---------------------------------------------------------------------------
# Injection-layout migration: unrolled per-edge inj_ops*/up_inj_ops*
# (vmap_injections=False; 1:1 with reference torch registration,
# model_search_interact.py:501-556) <-> the default vmapped layout
# (inj_diag_{i} stream-pairs + inj_grp_{j}/up_grp_{j} per-source
# (stream, destination) stacks; models/search.py InjectionGroup).

_ENC_OFFSETS = (0, 1, 3, 6)
_DEC_OFFSETS = (0, 5, 11)


def _dec_dests(j: int) -> tuple:
    return tuple(range(3)) if j <= 3 else tuple(range(j - 3, 3))


def _stack_subtrees(subtrees):
    import jax.numpy as jnp

    flats = [dict(flatten_dict(t)) for t in subtrees]
    return unflatten_dict({k: jnp.stack([f[k] for f in flats])
                           for k in flats[0]})


def _unstack_subtree(subtree, n):
    flat = dict(flatten_dict(subtree))
    return [unflatten_dict({k: v[m] for k, v in flat.items()})
            for m in range(n)]


def _convert_injection_block(tree, to_vmapped, p1, p2, diag, grp,
                             offsets, diag_srcs, grp_dests):
    """``diag_srcs``: [(group_i, source_j)] diagonal pairs (module index
    along ``{diag}_{i}`` is the group). ``grp_dests``: {source_j: dest
    group tuple} (module index along ``{grp}_{gj}`` is enumeration order
    of the sorted sources). Stacking order matches InjectionGroup: core
    axis = [stream1 dests ascending, stream2 dests ascending]; diag axis =
    [stream1, stream2]."""
    out = dict(tree)
    if to_vmapped:
        for i, j in diag_srcs:
            k = offsets[i] + j
            out[f"{diag}_{i}"] = _stack_subtrees(
                [out.pop(f"{p1}_{k}"), out.pop(f"{p2}_{k}")])
        for gj, (j, dests) in enumerate(sorted(grp_dests.items())):
            D = len(dests)
            cores, node = [], {}
            for s, pref in ((0, p1), (1, p2)):
                for d, i in enumerate(dests):
                    sub = dict(out.pop(f"{pref}_{offsets[i] + j}"))
                    proj = sub.pop("proj", None)
                    cores.append(sub)
                    if proj is not None:
                        node[f"projs_{s * D + d}"] = proj
            node["core"] = _stack_subtrees(cores)
            out[f"{grp}_{gj}"] = node
    else:
        for i, j in diag_srcs:
            k = offsets[i] + j
            subs = _unstack_subtree(out.pop(f"{diag}_{i}"), 2)
            out[f"{p1}_{k}"], out[f"{p2}_{k}"] = subs
        for gj, (j, dests) in enumerate(sorted(grp_dests.items())):
            node = out.pop(f"{grp}_{gj}")
            D = len(dests)
            cores = _unstack_subtree(node["core"], 2 * D)
            for s, pref in ((0, p1), (1, p2)):
                for d, i in enumerate(dests):
                    sub = dict(cores[s * D + d])
                    pk = f"projs_{s * D + d}"
                    if pk in node:
                        sub["proj"] = node[pk]
                    out[f"{pref}_{offsets[i] + j}"] = sub
    return out


def convert_injection_layout(tree, to_vmapped: bool):
    """Convert one variable-collection tree between the unrolled and
    vmapped injection layouts (encoder + decoder blocks). Works on any
    collection with the module structure (params / batch_stats /
    optimizer moments)."""
    tree = _convert_injection_block(
        tree, to_vmapped, "inj_ops1", "inj_ops2", "inj_diag", "inj_grp",
        _ENC_OFFSETS, [(i, i) for i in range(4)],
        {j: tuple(range(j + 1, 4)) for j in range(3)})
    tree = _convert_injection_block(
        tree, to_vmapped, "up_inj_ops1", "up_inj_ops2", "up_diag",
        "up_grp", _DEC_OFFSETS, [(i, 4 + i) for i in range(3)],
        {j: _dec_dests(j) for j in range(6)})
    return tree


def search_unrolled_to_default(variables: dict, steps: int = 4) -> dict:
    """Migrate fully-unrolled SearchNet variables (vmap_fusion=False,
    vmap_injections=False — the layout convert_reference_search_state_dict
    produces) to the DEFAULT SearchNet layout (fusion + injections both
    vmapped)."""
    return {coll: convert_injection_layout(
                convert_fusion_layout(tree, True, steps), True)
            for coll, tree in variables.items()}


def search_default_to_unrolled(variables: dict, steps: int = 4) -> dict:
    """Inverse of :func:`search_unrolled_to_default` (for export to the
    reference torch state_dict)."""
    return {coll: convert_injection_layout(
                convert_fusion_layout(tree, False, steps), False)
            for coll, tree in variables.items()}
