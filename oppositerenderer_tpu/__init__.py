"""opposite-tpu: a TPU-native differentiable renderer (JAX/XLA/Pallas).

Built from scratch with the capabilities of ico-eagleye/OppositeRenderer
(progressive photon mapping + VCM-style vertex connection + path tracing),
re-designed for TPU: wavefront integrators under jit, sorted-grid photon maps
via lax.sort/cumsum, Pallas kernels for ray-scene intersection and photon
gather, and pjit/shard_map distribution over device meshes.
"""
import os as _os

import jax as _jax

# Persistent compilation cache: render graphs compile in minutes-class on
# TPU (BENCH_r02: 250 s for the PPM/Atrium graphs) but are identical across
# runs — the reference pays an analogous 60 s OptiX JIT per process
# (README.md:78) with per-PTX persistence; we persist the XLA executables.
# TPU/accelerator backends only: XLA:CPU AOT reload is machine-feature
# sensitive (can SIGILL across hosts) and CPU compiles are fast anyway.
# Opt out with OPPOSITE_TPU_NO_COMPILE_CACHE=1 or by pre-setting the dir.
def _platform_is_cpu() -> bool:
    p = _jax.config.jax_platforms or _os.environ.get("JAX_PLATFORMS", "")
    return p.split(",")[0].strip() == "cpu"


if (not _os.environ.get("OPPOSITE_TPU_NO_COMPILE_CACHE")
        and not _platform_is_cpu()):
    try:
        if _jax.config.jax_compilation_cache_dir is None:
            _jax.config.update(
                "jax_compilation_cache_dir",
                _os.path.expanduser("~/.cache/opposite_tpu_xla"))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # unknown config names on future jax versions
        pass

from .config import Intersector, PhotonMapStructure, RenderConfig, RenderMethod

__version__ = "0.1.0"

__all__ = [
    "RenderConfig",
    "RenderMethod",
    "PhotonMapStructure",
    "Intersector",
    "__version__",
]
