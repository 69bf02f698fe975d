"""Multi-host (multi-process) scaffolding: ``jax.distributed`` init + DCN-aware meshes.

The reference has no distributed code of any kind (SURVEY.md §5.8); the TPU-native
scale-out story is: one JAX process per host, ``jax.distributed.initialize`` to form
the global runtime, and a mesh whose ``data`` axis spans pod slices so that the fit's
single Gram ``psum`` (see ``parallel/mesh.py``) rides ICI within each slice and DCN
across slices — the layout ``jax.experimental.mesh_utils.create_hybrid_device_mesh``
produces. No hand-written communication backend exists or is needed: GSPMD/shard_map
emit the collectives.

The multi-process path is executed for real by ``tests/test_multiprocess.py``: two
CPU processes form the global runtime over a localhost coordinator, build a
cross-process mesh, and run both sharded fits SPMD-style with parity against a
single-process oracle. Real DCN-spanning pod slices additionally need multi-host TPU
hardware, unavailable here.
"""

from typing import Any, Sequence

import jax
from jax.sharding import Mesh

from neo_ls_svm_tpu.parallel.mesh import make_mesh


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: Sequence[int] | None = None,
) -> bool:
    """Initialise the multi-process JAX runtime; returns True if it did anything.

    Single-process usage (all arguments None, no cluster environment) is a no-op, so
    library code may call this unconditionally. On TPU pods launched through a cluster
    scheduler (GKE/Borg-style), ``jax.distributed.initialize()`` auto-detects every
    argument; otherwise pass them explicitly, one call per process, BEFORE any other
    JAX API touches the backend. Idempotent: the runtime's own initialisation state is
    consulted (not a process-global flag), so a runtime initialised by the caller
    directly through ``jax.distributed.initialize`` is also recognised.
    """
    if jax.distributed.is_initialized():
        return False
    if all(v is None for v in (coordinator_address, num_processes, process_id)):
        # Plain single-process run. (Cluster schedulers that want auto-detection
        # should call jax.distributed.initialize() themselves before importing this
        # library — auto-probing environment markers here is unsafe because single-
        # chip TPU VMs also carry TPU_* variables.)
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def make_multihost_mesh(
    num_feature: int = 1,
    devices: Any = None,
) -> Mesh:
    """A ("data", "feature") mesh laid out so collectives ride ICI before DCN.

    When the global device set spans multiple pod slices (each slice internally
    connected by ICI, slices connected by DCN), the mesh is built with
    ``create_hybrid_device_mesh`` so the ``data`` axis is ordered slice-major: the
    Gram psum then reduces within each slice over ICI first and crosses DCN once per
    slice, not once per chip. Single-slice (or CPU-simulated) device sets fall back
    to the plain ICI mesh.
    """
    devices = jax.devices() if devices is None else list(devices)
    slice_ids = {getattr(d, "slice_index", 0) or 0 for d in devices}
    if len(slice_ids) > 1:
        from jax.experimental import mesh_utils

        num_slices = len(slice_ids)
        if len(devices) % num_slices:
            msg = (
                f"{len(devices)} devices spread unevenly over {num_slices} pod slices; "
                "pass an explicit `devices` list with the same number of chips per slice."
            )
            raise ValueError(msg)
        per_slice = len(devices) // num_slices
        if per_slice % num_feature:
            msg = (
                f"per-slice device count {per_slice} is not divisible by "
                f"num_feature={num_feature}; choose a feature-axis size that divides it."
            )
            raise ValueError(msg)
        grid = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(per_slice // num_feature, num_feature),
            dcn_mesh_shape=(num_slices, 1),
            devices=devices,
        )
        return Mesh(grid, axis_names=("data", "feature"))
    return make_mesh(num_feature=num_feature, devices=devices)
