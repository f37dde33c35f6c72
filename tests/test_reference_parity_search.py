"""Supernet-side parity against the reference oracle.

Round-2 VERDICT gap #2: the search half had no reference-oracle coverage.
This module proves, at a small config:

1. the torch->flax converter maps EVERY supernet conv/BN + all 12
   alpha/beta tensors (``convert_reference_search_state_dict``);
2. our ``SearchNet`` forward (both fusion-cell layouts) equals the
   reference ``model_search_interact.Network`` forward in eval mode;
3. ``genotype_parse.extract_genotype`` reproduces ``Network.genotype()``
   exactly on random arch params (model_search_interact.py:913-1051) —
   the search's entire deliverable is the same architecture;
4. ``genotype_parse.loss_entropy`` matches ``Network.loss_entropy()``
   (:881-896).
"""
import sys
from types import SimpleNamespace as NS

import numpy as np
import pytest

REFERENCE = "/root/reference"
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

torch = pytest.importorskip("torch")

if not torch.cuda.is_available():
    torch.Tensor.cuda = lambda self, *a, **k: self

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# Slow tier: compile-heavy / subprocess / reference-scale (see pytest.ini).
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def converted_supernet():
    jax.config.update("jax_default_matmul_precision", "highest")
    from models.model_search_interact import Network  # reference

    from npp_tpu.models.search import SearchNet
    from npp_tpu.utils.torch_convert import (
        convert_reference_search_state_dict)

    cfg = NS(DATASET=NS(NUM_CLASSES=7, NUM_JOINTS=4),
             SEARCH=NS(LAYERS=8, INIT_CHANNELS=8),
             MODEL=NS(HEAD="", REFINE_LAYERS=1))
    torch.manual_seed(0)
    ref = Network(cfg).eval()

    sd = ref.state_dict()
    g = torch.Generator().manual_seed(1)
    for k, v in sd.items():
        if k.endswith("running_mean"):
            sd[k] = torch.randn(v.shape, generator=g) * 0.05
        elif k.endswith("running_var"):
            sd[k] = 1.0 + 0.1 * torch.rand(v.shape, generator=g)
        elif k.startswith(("alphas", "betas")):
            # random arch params: non-degenerate softmaxes + genotype
            sd[k] = 0.3 * torch.randn(v.shape, generator=g)
    ref.load_state_dict(sd)

    model = SearchNet(num_classes=7, num_joints=4, layers=8,
                      init_channels=8, refine_layers=1, remat=False,
                      vmap_fusion=False, vmap_injections=False,
                      dtype=jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    converted, counts = convert_reference_search_state_dict(
        {k: v.numpy() for k, v in sd.items()}, dict(variables))
    return ref, model, converted, counts


def test_all_supernet_leaves_converted(converted_supernet):
    _, _, _, counts = converted_supernet
    assert counts["arch"] == 12
    # the supernet executes every candidate primitive per edge: far more
    # convs/BNs than the fixed net (augment: ~200/~150)
    assert counts["conv"] > 600, counts
    assert counts["bn"] > 400, counts


def test_supernet_forward_parity(converted_supernet):
    ref, model, converted, _ = converted_supernet
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        t_pose, t_par = ref(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)).copy()))

    j_pose, j_par = jax.jit(model.apply, static_argnames=("train",))(
        {"params": converted["params"],
         "batch_stats": converted["batch_stats"]},
        jnp.asarray(x), train=False)

    assert len(j_pose) == len(t_pose) and len(j_par) == len(t_par)
    for s in range(len(j_pose)):
        for b, (ours, theirs) in enumerate(
                [(j_pose[s][0], t_pose[s][0]), (j_pose[s][1], t_pose[s][1]),
                 (j_par[s][0], t_par[s][0]), (j_par[s][1], t_par[s][1])]):
            got = np.transpose(np.asarray(ours), (0, 3, 1, 2))
            want = theirs.numpy()
            scale = max(np.abs(want).max(), 1e-3)
            err = np.abs(got - want).max() / scale
            assert err < 2e-3, (s, b, err)


def test_supernet_forward_parity_vmapped(converted_supernet):
    """The DEFAULT stacked layout (vmapped fusion cells AND vmapped
    injections, via search_unrolled_to_default) is the same function as
    the torch net too."""
    ref, _, converted, _ = converted_supernet
    from npp_tpu.models.search import SearchNet
    from npp_tpu.utils.torch_convert import search_unrolled_to_default

    vmodel = SearchNet(num_classes=7, num_joints=4, layers=8,
                       init_channels=8, refine_layers=1, remat=False,
                       dtype=jnp.float32)
    vvars = search_unrolled_to_default(
        {"params": converted["params"],
         "batch_stats": converted["batch_stats"]})
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_pose, t_par = ref(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)).copy()))
    j_pose, j_par = jax.jit(vmodel.apply, static_argnames=("train",))(
        vvars, jnp.asarray(x), train=False)
    for s in range(len(j_pose)):
        for ours, theirs in [(j_pose[s][0], t_pose[s][0]),
                             (j_pose[s][1], t_pose[s][1]),
                             (j_par[s][0], t_par[s][0]),
                             (j_par[s][1], t_par[s][1])]:
            got = np.transpose(np.asarray(ours), (0, 3, 1, 2))
            want = theirs.numpy()
            scale = max(np.abs(want).max(), 1e-3)
            assert np.abs(got - want).max() / scale < 2e-3, s


def _norm_inter(task):
    return [[(str(p), int(j)) for p, j in group] for group in task]


def _norm_fuse(gene):
    return [(str(p), int(j)) for p, j in gene]


def test_genotype_extraction_oracle(converted_supernet):
    """extract_genotype == Network.genotype() on random arch params."""
    ref, _, converted, _ = converted_supernet
    from npp_tpu.models.genotype_parse import extract_genotype
    from npp_tpu.models.search import ARCH_PARAM_NAMES

    ref_inter, ref_fuse = ref.genotype()
    arch = {k: np.asarray(converted["params"][k]) for k in ARCH_PARAM_NAMES}
    our_inter, our_fuse = extract_genotype(arch)

    for t in ("task1", "task2", "task3", "task4"):
        assert _norm_inter(getattr(our_inter, t)) == _norm_inter(
            getattr(ref_inter, t)), t
    assert _norm_fuse(our_fuse.pose) == _norm_fuse(ref_fuse.pose)
    assert _norm_fuse(our_fuse.par) == _norm_fuse(ref_fuse.par)
    assert list(our_fuse.pose_concat) == list(ref_fuse.pose_concat)
    assert list(our_fuse.par_concat) == list(ref_fuse.par_concat)


def test_genotype_extraction_oracle_many_seeds():
    """Pure arch-param fuzz: no model build needed, 20 random draws."""
    from models.model_search_interact import Network  # reference

    from npp_tpu.models.genotype_parse import extract_genotype
    from npp_tpu.models.search import ARCH_PARAM_NAMES

    cfg = NS(DATASET=NS(NUM_CLASSES=7, NUM_JOINTS=4),
             SEARCH=NS(LAYERS=8, INIT_CHANNELS=8),
             MODEL=NS(HEAD="", REFINE_LAYERS=1))
    torch.manual_seed(0)
    ref = Network(cfg)
    rng = np.random.default_rng(7)
    for trial in range(20):
        arch = {}
        with torch.no_grad():
            for name in ARCH_PARAM_NAMES:
                p = getattr(ref, name)
                val = rng.normal(0, 0.5, p.shape).astype(np.float32)
                p.copy_(torch.from_numpy(val))
                arch[name] = val
        ref_inter, ref_fuse = ref.genotype()
        our_inter, our_fuse = extract_genotype(arch)
        for t in ("task1", "task2", "task3", "task4"):
            assert _norm_inter(getattr(our_inter, t)) == _norm_inter(
                getattr(ref_inter, t)), (trial, t)
        assert _norm_fuse(our_fuse.pose) == _norm_fuse(ref_fuse.pose), trial
        assert _norm_fuse(our_fuse.par) == _norm_fuse(ref_fuse.par), trial


def test_loss_entropy_oracle(converted_supernet):
    ref, _, converted, _ = converted_supernet
    from npp_tpu.models.genotype_parse import loss_entropy
    from npp_tpu.models.search import ARCH_PARAM_NAMES

    with torch.no_grad():
        want = float(ref.loss_entropy())
    arch = {k: jnp.asarray(converted["params"][k])
            for k in ARCH_PARAM_NAMES}
    got = float(loss_entropy(arch))
    assert abs(got - want) / abs(want) < 1e-5, (got, want)


def test_export_search_round_trip(converted_supernet):
    """flax -> torch supernet export (arch params included) inverts the
    conversion byte-exactly."""
    from npp_tpu.utils.torch_convert import (
        export_reference_search_state_dict)

    ref, _, converted, counts = converted_supernet
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    out, ecounts = export_reference_search_state_dict(converted, sd)
    assert ecounts == counts
    assert set(out) == set(sd)
    for k in sd:
        assert np.array_equal(out[k], sd[k]), k
