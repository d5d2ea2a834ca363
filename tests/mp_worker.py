"""Worker process for the 2-process distributed test (not a test module).

Each worker owns 4 virtual CPU devices; jax.distributed assembles the
8-device global mesh across the DCN-style process boundary. The worker
runs (a) the patch-sharded refine and (b) one full distributed expansion
round over the GLOBAL mesh, then saves its addressable shards for the
parent to stitch and compare against a single-process 8-device run.

Usage: python mp_worker.py <pid> <nproc> <coordinator_port> <out_prefix>
       [view]
"""

import sys


def main():
    pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
    view = len(sys.argv) > 5 and sys.argv[5] == "view"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass

    from pais_mvs_tpu.parallel.distributed import init_distributed
    assert init_distributed(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 4
    assert jax.device_count() == 8

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tests.mp_common import build_problem, run_sharded

    prob = build_problem(view=view)
    mesh = prob["mesh_fn"]()

    def make_global(x, spec):
        x = np.asarray(x)
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(x.shape, sh, lambda i: x[i])

    def to_global(x):
        x = np.asarray(x)
        return make_global(x, P("patch", *([None] * (x.ndim - 1))))

    results = run_sharded(prob, mesh, to_global, make_global)

    # save only the ADDRESSABLE shards (this process's 4 devices),
    # DEDUPED by row start: under the view mesh the patch shards are
    # view-replicated, so every process addresses one copy of every row
    local = {}
    for name, arr in results.items():
        shards = sorted(arr.addressable_shards,
                        key=lambda s: s.index[0].start or 0)
        seen, parts, rows = set(), [], []
        for sh in shards:
            st = sh.index[0].start or 0
            if st in seen:
                continue
            seen.add(st)
            parts.append(np.asarray(sh.data))
            rows.append(st)
        local[name] = np.concatenate(parts)
        local[name + "_rows"] = np.array(rows)
    np.savez(f"{out}-{pid}.npz", **local)
    print(f"worker {pid}: OK", flush=True)


if __name__ == "__main__":
    main()
