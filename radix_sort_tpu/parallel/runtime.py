"""Multi-host runtime helpers.

The reference is a single-process program (no MPI/NCCL anywhere — SURVEY
§2.2); on TPU the equivalent runtime is `jax.distributed` for process-level
bring-up plus a device mesh for the collectives. These helpers wrap both so
launch scripts stay one-liners.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["initialize_multihost", "data_mesh", "shard_rows"]


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Bring up the multi-host runtime (idempotent; no-op single-process).

    With no arguments, relies on the TPU environment's auto-detection
    (GKE/Cloud TPU metadata); arguments override for manual launches.
    Must run before any other JAX call touches the backend.
    """
    if getattr(jax.distributed, "is_initialized", lambda: False)():
        return  # idempotent
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError) as e:
        # ValueError: non-cluster environment without coordinator metadata
        # ("coordinator_address should be defined") — the documented no-op
        # single-process case. RuntimeError: double init ("should only be
        # called once") or late init.
        msg = str(e)
        if "called once" in msg or "already initialized" in msg:
            return
        if "must be called before" in msg:
            raise RuntimeError(
                "initialize_multihost must run before any JAX computation "
                "initializes the backend; call it first in the launch script"
            ) from e
        if num_processes in (None, 1) and coordinator_address is None:
            return  # single-process environment without TPU metadata
        # the caller explicitly asked for a multi-process cluster: a failed
        # bring-up must NOT silently degrade to local-only JAX (collectives
        # would hang or compute on a fraction of the devices)
        raise


def data_mesh(axis_name: str = "x", devices=None) -> Mesh:
    """1-D mesh over all devices — the row-sharding layout of the engine
    (rows across chips; collectives ride ICI within a slice, DCN across
    hosts)."""
    devices = np.array(devices if devices is not None else jax.devices())
    return Mesh(devices, (axis_name,))


def shard_rows(mesh: Mesh, *arrays, axis_name: str = "x"):
    """Place arrays row-sharded over the mesh axis."""
    sharding = NamedSharding(mesh, P(axis_name))
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out[0] if len(out) == 1 else out
