"""Multi-host orchestration over DCN.

The reference is single-process (SURVEY §5.8); this module supplies the
multi-host story: ``jax.distributed`` initialization + a global
``(hosts*chips_per_host)`` mesh whose ``data``/``tau`` axes span hosts over
DCN and chips over ICI.  All the sharded pipelines in
:mod:`homomorph_tpu.parallel.bulk` and
:mod:`homomorph_tpu.parallel.limbmul` work unchanged on the returned mesh -
XLA routes the psum/ppermute collectives over ICI within a slice and DCN
across hosts.

Failure semantics follow jax.distributed: a host failure aborts the step;
restart re-enters through :func:`initialize` and keys reload from their
serialized form (the checkpoint/resume story - keys are the only durable
state, matching the reference's persistence model, src/lib.rs:39-54, plus
our added ciphertext serializer).
"""

from __future__ import annotations

from .mesh import ShardingConfig, make_mesh

__all__ = ["initialize", "global_mesh"]


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed (no-op when single-process).

    On TPU pods with standard environment variables, all arguments are
    auto-detected; pass them explicitly elsewhere.
    """
    import jax

    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(n_tau: int = 1) -> ShardingConfig:
    """Mesh over ALL processes' devices: data-parallel across hosts (DCN),
    tau-sharding within a host's chips (ICI) when ``n_tau > 1``."""
    import jax

    return make_mesh(None, n_tau, devices=jax.devices())
