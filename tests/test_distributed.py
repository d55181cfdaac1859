"""Multi-host helper unit tests on the fake 8-device CPU mesh."""

import jax
import pytest

from simplepathtracer_tpu.parallel import (
    initialize_cluster,
    local_tile_slice,
    make_mesh,
    make_multihost_mesh,
)


def test_initialize_cluster_single_process_noop():
    initialize_cluster()  # must not raise without a coordinator
    assert jax.process_count() == 1


def test_make_multihost_mesh_shapes():
    m = make_multihost_mesh(samples_per_host=2)
    assert m.shape == {"tiles": 4, "samples": 2}
    m1 = make_multihost_mesh(samples_per_host=1)
    assert m1.shape == {"tiles": 8, "samples": 1}
    with pytest.raises(AssertionError):
        make_multihost_mesh(samples_per_host=3)  # 8 % 3 != 0


def test_local_tile_slice_covers_all_local_pixels():
    mesh = make_mesh(tiles=4, samples=2)
    start, size = local_tile_slice(mesh, num_pixels=4096)
    # Single process: every tile is local -> the slice is the whole image.
    assert start == 0 and size == 4096
    mesh1 = make_mesh(tiles=8, samples=1)
    start, size = local_tile_slice(mesh1, num_pixels=800)
    assert start == 0 and size == 800
