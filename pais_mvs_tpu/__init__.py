"""pais_mvs_tpu — a TPU-native dense multi-view-stereo reconstruction engine.

A from-scratch JAX/XLA/Pallas re-design of the patch-based MVS pipeline of
PAIS/TMVS (reference: adahbingee/pais-mvs): NVM camera ingest, seed patch
triangulation, batched GLN-PSO patch optimization scored by adaptively
weighted photoconsistency, cell-grid expansion, outlier filtering, and
PLY/PSR export.

Architecture differences from the reference (by design, not accident):
  * All per-patch work is batched: thousands of PSO swarms advance in
    lockstep as ``[B, P]`` tensor programs under ``jit``/``vmap`` instead of
    one sequential swarm at a time (reference: TMVS/mvs/mvs.cpp:196-275).
  * Patch state is a fixed-capacity struct-of-arrays arena with validity
    masks, not a ``map<int, Patch>``.
  * Expansion is wavefront rounds over the cell grid, not a serial priority
    queue (set-level semantics preserved; insertion order is a heuristic in
    the reference itself — it ships four orderings).
  * Multi-device scaling shards the patch batch over a ``jax.sharding.Mesh``
    with XLA collectives; the reference has OpenMP only.
"""

import jax as _jax

# True-f32 einsums/matmuls by default: on TPU, f32 dot_general otherwise
# lowers to ONE bf16 MXU pass, and the geometry chain (homographies,
# projections, NCC tables) visibly degrades — measured 5x worse seed
# accuracy on real imagery (n=53 @ 4.4e-3 -> n=83 @ 8e-4 median surface
# distance on the pawn-rig scene). The hot Pallas kernels pin their own
# precision explicitly, so this costs nothing where it matters. Respect a
# user's own setting if one is already in place.
try:
    if _jax.config.jax_default_matmul_precision is None:
        _jax.config.update("jax_default_matmul_precision", "highest")
except AttributeError:          # future jax renames: fail open
    pass

# Honor JAX_PLATFORMS even under the axon plugin, whose sitecustomize
# imports jax at interpreter startup and overrides the env var. A config
# update still wins until the first backend query — and this package's
# module-level jnp constants would otherwise BE that first query, hanging
# a CPU-pinned run on TPU-tunnel discovery whenever the tunnel is down.
# An explicit jax.config.update("jax_platforms", ...) made BEFORE this
# import (e.g. tests pinning the 8-device CPU mesh) takes precedence:
# only apply the env var while the config is still unset.
import os as _os

_plat = _os.environ.get("JAX_PLATFORMS")
if _plat:
    try:
        # the axon plugin force-sets "axon,cpu" at interpreter startup no
        # matter what the env says; anything ELSE means someone upstream
        # (a test conftest, a harness) chose explicitly — leave it alone
        if _jax.config.jax_platforms in (None, "axon,cpu"):
            _jax.config.update("jax_platforms", _plat)
    except Exception:
        pass

from pais_mvs_tpu.config import MvsConfig, load_config_txt

__version__ = "0.1.0"

__all__ = ["MvsConfig", "load_config_txt", "__version__"]
