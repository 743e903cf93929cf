"""Native C++ BVH builder: parity with the numpy builder + performance floor."""

import time

import numpy as np
import pytest

from bpt_tpu.accel.builder import _build_bvh_native, build_bvh, triangle_aabbs
from bpt_tpu.accel.native import load


def random_aabbs(n, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-50, 50, (n, 3)).astype(np.float32)
    h = rng.uniform(0.01, 1.5, (n, 3)).astype(np.float32)
    return c - h, c + h


needs_native = pytest.mark.skipif(load() is None, reason="g++ unavailable")


@needs_native
def test_native_matches_numpy_bitwise():
    mn, mx = random_aabbs(501, seed=3)  # odd count exercises uneven splits
    a = build_bvh(mn, mx, use_native="never")
    b = _build_bvh_native(mn, mx)
    np.testing.assert_array_equal(a.node_tri, b.node_tri)
    np.testing.assert_array_equal(a.node_right, b.node_right)
    np.testing.assert_array_equal(a.node_min, b.node_min)
    np.testing.assert_array_equal(a.node_max, b.node_max)
    assert a.max_depth == b.max_depth


@needs_native
def test_native_degenerate_coincident_centroids():
    # all-identical AABBs force the even/odd fallback path
    mn = np.zeros((33, 3), np.float32)
    mx = np.ones((33, 3), np.float32)
    a = build_bvh(mn, mx, use_native="never")
    b = _build_bvh_native(mn, mx)
    np.testing.assert_array_equal(a.node_tri, b.node_tri)
    np.testing.assert_array_equal(a.node_right, b.node_right)


@needs_native
def test_native_large_mesh_fast():
    mn, mx = random_aabbs(200_000, seed=7)
    t0 = time.perf_counter()
    built = _build_bvh_native(mn, mx)
    dt = time.perf_counter() - t0
    assert built is not None
    assert sorted(built.node_tri[built.node_tri >= 0].tolist()) == list(range(200_000))
    # "model to BVH in a matter of seconds" (README.md:41) — native does
    # 200k triangles well under one
    assert dt < 5.0, f"native build took {dt:.2f}s"
