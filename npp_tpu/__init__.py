"""npp_tpu — a TPU-native (JAX/XLA/Pallas) framework with the capabilities of
GuHuangAI/NPP: NAS search + training for joint human parsing and pose
estimation.

Convenience top-level API (lazily imported so ``import npp_tpu`` stays
cheap)::

    from npp_tpu import NPPNet, Predictor, build_model, load_config

Full surfaces live in the submodules — ``npp_tpu.core`` (train / search /
evaluate / predictor / checkpoint), ``npp_tpu.models``, ``npp_tpu.ops``,
``npp_tpu.data``, ``npp_tpu.parallel`` — see README.md.
"""
import importlib

__version__ = "0.1.0"

_EXPORTS = {
    "NPPNet": "npp_tpu.models.augment",
    "build_model": "npp_tpu.models.augment",
    "fuse_neck_variables": "npp_tpu.models.augment",
    "unfuse_neck_variables": "npp_tpu.models.augment",
    "fuse_sibling_variables": "npp_tpu.models.augment",
    "unfuse_sibling_variables": "npp_tpu.models.augment",
    "SearchNet": "npp_tpu.models.search",
    "Genotype": "npp_tpu.genotypes",
    "Predictor": "npp_tpu.core.predictor",
    "load_config": "npp_tpu.config",
    "load_eval_model": "npp_tpu.core.loading",
    "convert_reference_state_dict": "npp_tpu.utils.torch_convert",
    "export_reference_state_dict": "npp_tpu.utils.torch_convert",
}

__all__ = sorted(_EXPORTS) + ["__version__"]


def __getattr__(name: str):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(f"module 'npp_tpu' has no attribute {name!r}")
    return getattr(importlib.import_module(mod), name)


def __dir__():
    return __all__
