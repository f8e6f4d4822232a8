"""Multi-process (multi-host-shaped) execution of the distributed engine.

Everything else in the dist tier runs a single-process virtual mesh; this
file launches a REAL 2-process cluster (jax.distributed + Gloo, one
coordinator, 2 virtual CPU devices per process) and runs the engine across
the process boundary — distributed sorts (uniform / duplicate-heavy /
pipelined exchange), a DistTable filter->aggregate, and a planner SQL
query with the broadcast-lookup eager-aggregation rewrite — each checked
against the numpy oracle inside every worker (radix_sort_tpu/parallel/
mp_smoke.py). The reference's only synchronization is a thread join
(src/radix_sort/mod.rs:103-108); this is the DCN-shaped equivalent.
"""

from radix_sort_tpu.parallel.runtime import run_local_cluster


def test_two_process_cluster():
    results = run_local_cluster(num_processes=2, devices_per_process=2)
    assert len(results) == 2
    for pid, (rc, out) in enumerate(results):
        assert rc == 0, f"process {pid} failed:\n{out[-4000:]}"
        assert f"MP_SMOKE_OK process={pid}/2 devices=4" in out, out[-2000:]
