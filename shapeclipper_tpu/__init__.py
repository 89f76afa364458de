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
