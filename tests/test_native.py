"""Native C++ kernels vs their numpy/scipy reference implementations."""

import numpy as np
import pytest

from shapeclipper_tpu.eval3d import isosurface, native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def _numpy_mt(level, isovalue=0.0):
    """Call the numpy fallback directly (bypassing the native fast path)."""
    import shapeclipper_tpu.eval3d.native as nat
    saved = nat.marching_tetrahedra
    nat.marching_tetrahedra = lambda *a, **k: None
    try:
        return isosurface.marching_tetrahedra(level, isovalue)
    finally:
        nat.marching_tetrahedra = saved


def test_native_marching_tetrahedra_matches_numpy():
    N = 24
    grid = np.linspace(-0.6, 0.6, N)
    X, Y, Z = np.meshgrid(grid, grid, grid, indexing="ij")
    level = (np.sqrt(X ** 2 + Y ** 2 + Z ** 2) - 0.45).astype(np.float32)

    verts_native = native.marching_tetrahedra(level, 0.0)
    mesh_np = _numpy_mt(level, 0.0)
    assert verts_native.shape[0] == mesh_np.vertices.shape[0]
    # same triangle soup up to ordering: compare sorted flattened vertices
    a = np.sort(verts_native.reshape(-1, 9), axis=0)
    b = np.sort(mesh_np.vertices.reshape(-1, 9), axis=0)
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_native_marching_tetrahedra_empty():
    level = np.ones((8, 8, 8), np.float32)
    verts = native.marching_tetrahedra(level, 0.0)
    assert verts.shape == (0, 3)


def test_native_boundary_distance_matches_scipy():
    from scipy import ndimage
    rng = np.random.RandomState(0)
    mask = ndimage.binary_dilation(rng.rand(40, 50) > 0.95, iterations=3)
    d_native = native.boundary_distance(mask)
    d_in = ndimage.distance_transform_edt(mask)
    d_out = ndimage.distance_transform_edt(~mask)
    expected = np.maximum(
        np.where(mask, d_in, d_out).astype(np.float32) - 0.5, 0.0)
    np.testing.assert_allclose(d_native, expected, atol=1e-4)


def test_native_boundary_distance_degenerate():
    mask = np.ones((10, 12), bool)
    d = native.boundary_distance(mask)
    assert (d == 12.0).all()
