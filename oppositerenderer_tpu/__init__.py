"""opposite-tpu: a TPU-native differentiable renderer (JAX/XLA/Pallas).

Built from scratch with the capabilities of ico-eagleye/OppositeRenderer
(progressive photon mapping + VCM-style vertex connection + path tracing),
re-designed for TPU: wavefront integrators under jit, sorted-grid photon maps
via lax.sort/cumsum, Pallas kernels for ray-scene intersection and photon
gather, and pjit/shard_map distribution over device meshes.
"""
from .config import Intersector, PhotonMapStructure, RenderConfig, RenderMethod

__version__ = "0.1.0"

__all__ = [
    "RenderConfig",
    "RenderMethod",
    "PhotonMapStructure",
    "Intersector",
    "__version__",
]
