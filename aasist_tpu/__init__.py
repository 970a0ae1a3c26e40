"""aasist_tpu — a TPU-native (JAX/XLA/Pallas/pjit) audio anti-spoofing framework.

Re-implements the full capability surface of the PyTorch reference
(MT-963/aasist: AASIST / AASIST-L / AASIST2 / AASIST-Robust / RawNet2 /
RawGAT-ST training + evaluation on ASVspoof2019-LA) as an idiomatic JAX
framework: functional models over parameter pytrees, jit/pjit compiled
train/eval steps, SPMD data parallelism over a `jax.sharding.Mesh`, and a
pure-NumPy scoring engine kept bit-compatible with the reference
(`/root/reference/evaluation.py`).
"""

__version__ = "0.1.0"

from aasist_tpu.config import ExperimentConfig, load_config  # noqa: F401
from aasist_tpu.registry import build_model, list_architectures  # noqa: F401
