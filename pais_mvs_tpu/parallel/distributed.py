"""Multi-host initialization (SURVEY §5.8 build equivalent).

The reference is a single process; scaling across TPU hosts here uses
``jax.distributed.initialize`` — every host runs the same program, JAX
assembles the global device mesh, and the SPMD paths (`parallel.sharded`,
`parallel.expansion`, `ops.bundle.bundle_adjust_sharded`, the engine's
data-parallel refine) shard over all global devices transparently.

Single-host usage never needs this module. Multi-host:

    # on every host (or rely on TPU pod metadata auto-detection):
    python -m pais_mvs_tpu.cli -r scene.nvm \
        --coordinator host0:9876 --num-processes 4 --process-id $ID
"""

from __future__ import annotations

from typing import Optional


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize multi-host JAX. With no arguments, relies on the TPU
    pod's automatic environment detection (GCE metadata); returns True if
    a multi-process runtime came up, False when single-process.

    Must run before any other JAX call (backend initialization latches).
    """
    import jax
    if coordinator is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception:
            return False                      # not a pod environment
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id)
    return jax.process_count() > 1
