"""npp_tpu — a TPU-native (JAX/XLA/Pallas) framework with the capabilities of
GuHuangAI/NPP: NAS search + training for joint human parsing and pose
estimation."""

__version__ = "0.1.0"
