"""Multi-host runtime initialization (SURVEY.md §2.4 communication backend).

The reference has no distributed runtime at all — its only "backend" is a
single CUDA device plus unused NCCL wheels (reference: src/config/
config.py:16, environment.yml:67). The TPU framework's backend is JAX's
native one: `jax.distributed.initialize` connects the processes of a pod
slice (or a CPU test rig), after which `jax.devices()` is the GLOBAL
device list and the ("seq", "map") mesh spans hosts. XLA then compiles
the same programs with cross-host collectives — psum over "map" rides
ICI inside a slice and DCN across slices; nothing else changes.

On real TPU pods every argument is inferred from the environment
metadata, so `initialize_runtime()` with no arguments is the entire
multi-host entry point. On CPU test rigs (N processes on one machine,
`--xla_force_host_platform_device_count` each) the coordinator/process
arguments are passed explicitly; collectives go through gloo
(`jax_cpu_collectives_implementation`), which is how
tests/test_multiprocess.py runs the distributed Schur BA cross-process
in CI — per SURVEY.md §4 "distributed without a cluster".
"""

from __future__ import annotations

import dataclasses

import jax


@dataclasses.dataclass(frozen=True)
class RuntimeSpec:
    """What `initialize_runtime` actually brought up."""

    num_processes: int
    process_id: int
    global_devices: int
    local_devices: int
    platform: str


def initialize_runtime(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: list[int] | None = None,
    cpu_devices_per_process: int | None = None,
) -> RuntimeSpec:
    """Bring up the (possibly multi-host) JAX runtime and report topology.

    With no arguments on a TPU pod: auto-detects everything from the TPU
    environment (the jax.distributed cluster plugins). For CPU
    multi-process rigs: pass coordinator/num_processes/process_id and
    optionally cpu_devices_per_process (sets the host-platform device
    count and selects gloo collectives — must be called before any other
    JAX API touches a backend).

    Single-process callers (num_processes in (None, 1) and no
    coordinator) skip `jax.distributed.initialize` entirely, so local
    runs and tests don't pay coordination overhead.
    """
    if cpu_devices_per_process is not None:
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        want = f"--xla_force_host_platform_device_count={cpu_devices_per_process}"
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (flags + " " + want).strip()
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")

    multiproc = coordinator_address is not None or (
        num_processes is not None and num_processes > 1
    )
    if multiproc:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    devs = jax.devices()
    return RuntimeSpec(
        num_processes=jax.process_count(),
        process_id=jax.process_index(),
        global_devices=len(devs),
        local_devices=len(jax.local_devices()),
        platform=devs[0].platform,
    )


def shutdown_runtime() -> None:
    """Tear down the coordination service (multi-process runs only)."""
    if jax.process_count() > 1:
        jax.distributed.shutdown()


def process_local_batch(mesh, spec, host_data):
    """Build a global array from per-process shards.

    `host_data` is this process's slice of the batch (leading axis =
    local share of the sharded mesh axis). The returned jax.Array spans
    all processes — the multi-sequence step and distributed BA consume
    it like any other input. This is the host-side data-parallel feed:
    each host decodes/renders only its own sequences (SURVEY.md §2.4
    "host pipeline parallelism").
    """
    from jax.sharding import NamedSharding

    # the API infers the global shape from the local block (assumes the
    # batch axis is distributed evenly across processes)
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), host_data
    )
