"""Test harness config: run everything on a virtual 8-device CPU mesh.

The standard way to test sharding without a TPU pod (SURVEY.md §4e). Must run
before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize pins JAX_PLATFORMS at interpreter start; the env var
# alone doesn't stick. Force the platform through the config API too.
import jax
jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache across test runs/processes, HARDENED:
# atomic entry publishes (jax's unlocked put tears under the suite's
# concurrent CLI subprocesses or when a writer is killed mid-put -- the
# root cause of the intermittent full-suite segfaults, which crash the
# native executable deserializer on READ) + zlib compression (see
# compile_cache.py). The dir is suffixed 3: cache2 accumulated torn
# entries from the pre-atomic era (a killed run's partial writes), and
# the original dir holds zstd entries -- reads pick the decompressor by
# a module global, so formats cannot mix. If a suite run ever segfaults
# inside compilation_cache.get_executable_and_time again, wipe the dir:
# only a file written WITHOUT the atomic put can be torn.
from horizonator_tpu.compile_cache import harden_cache
harden_cache("/tmp/jax_test_cache3")   # incl. era sweep of the dir
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache3")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(20260816)


def make_synthetic_dem_dir(tmp_path, tiles, srtm1=False):
    """Write synthetic .hgt tiles. ``tiles`` maps (tile_lat, tile_lon) ->
    either an (edge, edge) array (row 0 = NORTH) or a callable
    f(lat_deg_grid, lon_deg_grid) -> elevations."""
    from horizonator_tpu.dem import hgt

    edge = hgt.SRTM1_EDGE if srtm1 else hgt.SRTM3_EDGE
    d = tmp_path / "dems"
    d.mkdir(exist_ok=True)
    for (tlat, tlon), spec in tiles.items():
        if callable(spec):
            lat = tlat + 1.0 - np.arange(edge) / (edge - 1)  # row 0 = north
            lon = tlon + np.arange(edge) / (edge - 1)
            grid = spec(lat[:, None], lon[None, :])
        else:
            grid = spec
        hgt.write_hgt(d / hgt.hgt_filename(tlat, tlon), grid)
    return str(d)


@pytest.fixture
def synthetic_dem_dir(tmp_path):
    def make(tiles, srtm1=False):
        return make_synthetic_dem_dir(tmp_path, tiles, srtm1)
    return make
