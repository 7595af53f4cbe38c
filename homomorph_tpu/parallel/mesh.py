"""Device-mesh construction and sharding configuration.

The reference is single-threaded (SURVEY §2: no parallelism of any kind);
this module supplies the scale-out design the TPU framework adds
(SURVEY §5.7-5.8).  The workload's parallel axes:

* ``data`` - ciphertext bits (embarrassingly parallel: encryption,
  decryption, and every gate act per-bit).  Pure DP, no communication.
* ``tau``  - public-key rows.  Encryption contracts over tau, so sharding
  tau turns the subset-XOR into partial popcounts combined with an
  arithmetic all-reduce (`psum`) *before* the mod-2 - an exact XOR
  reduction expressed as a native XLA collective (no bitwise collective
  needed).

Within a pod slice both axes ride ICI; across hosts, `jax.distributed`
extends the same mesh over DCN.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["ShardingConfig", "make_mesh", "P", "NamedSharding"]

DATA_AXIS = "data"
TAU_AXIS = "tau"


@dataclasses.dataclass(frozen=True)
class ShardingConfig:
    """How to lay out the homomorphic workload on a mesh."""

    mesh: Mesh

    @property
    def data_axis(self) -> str:
        return DATA_AXIS

    @property
    def tau_axis(self) -> str:
        return TAU_AXIS

    def sel_sharding(self) -> NamedSharding:
        """Selection bits [B, n, tau]: batch over data, tau over tau."""
        return NamedSharding(self.mesh, P(DATA_AXIS, None, TAU_AXIS))

    def pk_sharding(self) -> NamedSharding:
        """Public-key bit planes [tau, D]: rows over tau, replicated over data."""
        return NamedSharding(self.mesh, P(TAU_AXIS, None))

    def cipher_sharding(self) -> NamedSharding:
        """Ciphertext limbs [B, n, L]: batch over data, replicated over tau."""
        return NamedSharding(self.mesh, P(DATA_AXIS, None, None))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())


def make_mesh(
    n_data: int | None = None,
    n_tau: int = 1,
    devices: list | None = None,
) -> ShardingConfig:
    """Build a ``(data, tau)`` mesh over the available devices.

    With ``n_data=None``, all remaining devices go to the data axis.
    """
    devs = devices if devices is not None else jax.devices()
    n = len(devs)
    if n_data is None:
        if n % n_tau:
            raise ValueError(f"{n} devices not divisible by n_tau={n_tau}")
        n_data = n // n_tau
    if n_data * n_tau != n:
        raise ValueError(f"mesh {n_data}x{n_tau} != {n} devices")
    arr = np.array(devs).reshape(n_data, n_tau)
    return ShardingConfig(Mesh(arr, (DATA_AXIS, TAU_AXIS)))
