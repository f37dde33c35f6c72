"""Full-model forward parity against the reference implementation.

Builds the reference torch ``model_augment.Network`` and our ``NPPNet`` at
a small config, converts the torch weights with
``npp_tpu.utils.torch_convert``, and asserts every stage output matches in
eval mode — the strongest available evidence for the <=0.1pt metric-parity
target (BASELINE.md) without LIP image data.
"""
import sys
from types import SimpleNamespace as NS

import numpy as np
import pytest

REFERENCE = "/root/reference"
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# Slow tier: compile-heavy / subprocess / reference-scale (see pytest.ini).
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def converted_pair():
    jax.config.update("jax_default_matmul_precision", "highest")
    from models.model_augment import Network  # reference

    from npp_tpu.models.augment import NPPNet
    from npp_tpu.utils.torch_convert import convert_reference_state_dict

    cfg = NS(DATASET=NS(NUM_CLASSES=7, NUM_JOINTS=4),
             TRAIN=NS(LAYERS=8, INIT_CHANNELS=8),
             MODEL=NS(DECONV_WITH_BIAS=False, HEAD="", REFINE_LAYERS=1))
    torch.manual_seed(0)
    ref = Network(cfg).eval()
    # Non-default running stats so the BN copy is actually exercised.
    sd = ref.state_dict()
    g = torch.Generator().manual_seed(1)
    for k, v in sd.items():
        if k.endswith("running_mean"):
            sd[k] = torch.randn(v.shape, generator=g) * 0.05
        elif k.endswith("running_var"):
            sd[k] = 1.0 + 0.1 * torch.rand(v.shape, generator=g)
    ref.load_state_dict(sd)

    model = NPPNet(num_classes=7, num_joints=4, layers=8, init_channels=8,
                   refine_layers=1, dtype=jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    converted, counts = convert_reference_state_dict(
        {k: v.numpy() for k, v in sd.items()}, dict(variables))
    return ref, model, converted, counts


def test_all_leaves_converted(converted_pair):
    _, _, _, counts = converted_pair
    # Every conv and BN in the reference must have been mapped.
    assert counts["conv"] > 200, counts
    assert counts["bn"] > 150, counts


def test_forward_parity_all_stages(converted_pair):
    ref, model, converted, _ = converted_pair
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


def test_export_round_trip(converted_pair):
    """flax -> torch export inverts the torch -> flax conversion exactly:
    every state_dict entry (incl. untouched num_batches_tracked and the
    SE dead BNs, which keep template values) is byte-equal."""
    from npp_tpu.utils.torch_convert import export_reference_state_dict

    ref, _, converted, counts = converted_pair
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    out, ecounts = export_reference_state_dict(converted, sd)
    assert ecounts == counts
    assert set(out) == set(sd)
    for k in sd:
        assert np.array_equal(out[k], sd[k]), k
