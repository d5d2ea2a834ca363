"""Test harness: run everything on a virtual 8-device CPU mesh.

Note: this container's sitecustomize imports jax at interpreter startup
(axon TPU plugin), so env vars are too late — use jax.config.update, which
works as long as no backend has been initialized yet.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")  # harmless if already latched

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Pin the persistent compile cache to a per-run private directory BEFORE
# any test runs: test_cli drives cli.main in-process, whose
# enable_persistent_cache() would otherwise point the WHOLE suite at the
# shared user-level cache (~/.cache/pais_mvs_tpu_jax). A pytest process
# killed mid-write (timeout, crash) leaves a truncated entry there, and
# the next suite's cache READ aborts the interpreter from C (zstd/XLA
# deserialize — not catchable). enable_persistent_cache respects an
# already-set dir, so setting it here isolates every run.
import tempfile as _tempfile

_cache_tmp = _tempfile.mkdtemp(prefix="pais_mvs_test_jax_cache_")
jax.config.update("jax_compilation_cache_dir", _cache_tmp)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_scene():
    """Small synthetic 5-camera scene shared across tests."""
    from pais_mvs_tpu.data.synthetic import make_scene
    return make_scene(num_cams=5, width=200, height=150, num_seeds=40)


@pytest.fixture(scope="session")
def tiny_cfg():
    from pais_mvs_tpu.config import MvsConfig
    return MvsConfig(patch_radius=5, max_lod=4, particle_num=8,
                     max_iteration=12, batch_size=64,
                     dist_weighting=5.0 / 3.0)


@pytest.fixture(scope="session")
def tiny_built(tiny_scene, tiny_cfg):
    from pais_mvs_tpu.models.camera import build_scene
    return build_scene(tiny_scene.params, tiny_scene.images, tiny_cfg)
