"""ShapeClipper-TPU: a TPU-native (JAX/XLA/Pallas) rebuild of ShapeClipper.

Single-view 3D shape reconstruction via an image-conditioned implicit SDF +
texture field with a VolSDF-style differentiable volume renderer, supervised
by 2D images/masks/normals plus geometric and CLIP-retrieved cross-instance
consistency losses.

Re-designed TPU-first:
  * pure-functional models (flax.linen) driven by a single jit'd train step
  * data parallelism via jax.sharding over an ICI mesh (no process spawning)
  * SDF spatial gradients via composable jax autodiff (no autograd.grad
    gymnastics); second-order through volume normals nests cleanly
  * Pallas kernels for the brute-force Chamfer nearest-neighbor distance
  * host-side subsystems (data, marching cubes, vis) kept off the hot path

Reference (behavioral spec only): zxhuang1698/ShapeClipper @ /root/reference.
"""

__version__ = "0.1.0"

# Some TPU attach plugins override the JAX_PLATFORMS env var; SCL_PLATFORM
# provides a reliable escape hatch (used by CI/smoke tests to pin CPU).
import os as _os

if _os.environ.get("SCL_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["SCL_PLATFORM"])

# Persistent XLA compilation cache: compile times through remote-attach
# transports vary wildly (the SAME train step has compiled in 5 and in 20+
# minutes on one day); a disk cache makes every repeat run hit in seconds.
# Opt out with SCL_NO_COMPILE_CACHE=1; relocate with JAX_COMPILATION_CACHE_DIR.
if not _os.environ.get("SCL_NO_COMPILE_CACHE"):
    import jax as _jax

    _cache = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jax_cache"))
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        # cache misses on different-but-equivalent programs are fine; never
        # let cache machinery turn into a hard failure
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
