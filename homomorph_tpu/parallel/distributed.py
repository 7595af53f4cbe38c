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

import json
import os

import numpy as np

from .mesh import ShardingConfig, make_mesh

__all__ = [
    "initialize",
    "global_mesh",
    "broadcast_keys",
    "assert_same_across_processes",
    "save_sharded",
    "load_sharded",
]


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


def broadcast_keys(ctx) -> None:
    """Broadcast process 0's keys to every process (multi-host bootstrap).

    The practical alternative to sharing an encryption seed: process 0
    generates (or loads) the keys, every other process receives the exact
    key BYTES over the coordinator fabric and installs them through the
    public ``from_bytes`` surface - so all processes hold byte-identical
    keys (the precondition for every sharded pipeline in this package).
    Key byte formats are the reference's (src/context.rs:153-155,
    239-245); transport is ``multihost_utils.broadcast_one_to_all``.

    Call with a :class:`~homomorph_tpu.context.Context` that has keys on
    process 0 (others may hold the same Parameters and no keys).
    No-op single-process.
    """
    import jax

    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    from ..keys import PublicKey, SecretKey

    is_src = jax.process_index() == 0

    def bcast_bytes(data: bytes | None) -> bytes:
        # two-phase: length first (fixed shape), then the padded payload
        n = np.asarray([len(data) if data else 0], dtype=np.int64)
        n = int(multihost_utils.broadcast_one_to_all(n, is_source=is_src)[0])
        if n == 0:
            return b""
        buf = np.zeros(n, dtype=np.uint8)
        if is_src:
            buf[:] = np.frombuffer(data, dtype=np.uint8)
        out = multihost_utils.broadcast_one_to_all(buf, is_source=is_src)
        return bytes(np.asarray(out, dtype=np.uint8).tobytes())

    sk = ctx.get_secret_key() if is_src else None
    pk = ctx.get_public_key() if is_src else None
    sk_bytes = bcast_bytes(sk.to_bytes() if sk is not None else None)
    # every process participates in the n_rows broadcast unconditionally
    # (source sends 0 when it holds no pk, mirroring bcast_bytes' sk=None
    # handling): a source-side skip would desynchronize every subsequent
    # collective on the non-source processes
    rows = pk.to_bytes() if is_src and pk is not None else None
    n_rows = np.asarray([len(rows) if rows else 0], dtype=np.int64)
    n_rows = int(
        multihost_utils.broadcast_one_to_all(n_rows, is_source=is_src)[0]
    )
    pk_rows = [
        bcast_bytes(rows[i] if is_src else None) for i in range(n_rows)
    ]
    if not is_src:
        if sk_bytes:
            ctx.set_secret_key(SecretKey.from_bytes(sk_bytes))
        if pk_rows:
            # set AFTER the secret key: set_secret_key clears pk
            # (reference invariant, src/context.rs:568-571)
            ctx.set_public_key(PublicKey.from_bytes(pk_rows))


def assert_same_across_processes(data: bytes, label: str = "value") -> None:
    """Assert a host byte-string is identical on every process.

    Sanity gate for key distribution: hashes locally, then compares the
    digest across processes with one tiny broadcast.  Raises
    ``AssertionError`` on the processes that disagree with process 0.
    """
    import hashlib

    import jax

    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    digest = np.frombuffer(
        hashlib.sha256(data).digest(), dtype=np.uint8
    ).copy()
    ref = multihost_utils.broadcast_one_to_all(
        digest, is_source=jax.process_index() == 0
    )
    if not np.array_equal(np.asarray(ref, dtype=np.uint8), digest):
        raise AssertionError(
            f"{label} differs from process 0 on process {jax.process_index()}"
        )


def save_sharded(directory: str, ciphered, *, name: str = "ciphertext") -> None:
    """Checkpoint a (possibly sharded, possibly multi-process) ciphertext.

    Each process writes ONLY its addressable shards
    (``<name>.p<pid>s<k>.npz`` with the global index recorded), plus a
    manifest on process 0 - so a pod-wide ciphertext checkpoints without
    gathering (a gather is impossible for arrays spanning processes).
    Restore with :func:`load_sharded` under a mesh with the same global
    shape.  Complements the key persistence story (the reference's only
    durable state, src/lib.rs:39-54) with the framework's own sharded
    ciphertext state.
    """
    import jax

    os.makedirs(directory, exist_ok=True)
    pid = jax.process_index() if jax.process_count() > 1 else 0
    seen = set()
    n_local = 0
    dims = ciphered.limbs.shape
    for shard in ciphered.limbs.addressable_shards:
        # replicated/unsharded axes index as slice(None): resolve against
        # the global dim so the recorded window is always concrete
        key = tuple(
            (s.start or 0, dims[d] if s.stop is None else s.stop)
            if isinstance(s, slice)
            else (int(s), int(s) + 1)
            for d, s in enumerate(shard.index)
        )
        if key in seen:  # replicated axes: one copy is enough
            continue
        seen.add(key)
        np.savez(
            os.path.join(directory, f"{name}.p{pid}s{n_local}.npz"),
            data=np.asarray(shard.data),
            index=np.asarray(key, dtype=np.int64),
        )
        n_local += 1
    if pid == 0:
        manifest = {
            "name": name,
            "shape": list(ciphered.limbs.shape),
            "bound": ciphered.bound,
            "noise": ciphered.noise,
            "zero_lanes": ciphered.zero_lanes,
            "desc": ciphered.desc.name,
        }
        with open(os.path.join(directory, f"{name}.json"), "w") as f:
            json.dump(manifest, f)


def load_sharded(directory: str, desc, *, name: str = "ciphertext"):
    """Restore a :func:`save_sharded` checkpoint (host-side assembly).

    Every process reads ALL shard files it can see (shared filesystem
    assumed, the normal pod setup) and assembles the full host array;
    re-sharding onto a live mesh is the caller's `device_put`.  ``desc``
    must be the plaintext descriptor the ciphertext was built with (the
    manifest records its name for validation).
    """
    from ..cipher import FRESH_NOISE, Ciphered
    from ..utils.errors import DeserializeError

    with open(os.path.join(directory, f"{name}.json")) as f:
        manifest = json.load(f)
    if desc.name != manifest["desc"]:
        raise DeserializeError(
            f"checkpoint {name} was {manifest['desc']}, not {desc.name}"
        )
    full = np.zeros(manifest["shape"], dtype=np.uint32)
    covered = np.zeros(manifest["shape"], dtype=bool)
    found = False
    for fn in sorted(os.listdir(directory)):
        if not (fn.startswith(f"{name}.p") and fn.endswith(".npz")):
            continue
        found = True
        with np.load(os.path.join(directory, fn)) as z:
            idx = tuple(slice(int(a), int(b)) for a, b in z["index"])
            full[idx] = z["data"]
            covered[idx] = True
    if not found or not covered.all():
        raise DeserializeError(
            f"checkpoint {name} is incomplete in {directory} (missing shards)"
        )
    import jax.numpy as jnp

    return Ciphered(
        jnp.asarray(full),
        manifest["bound"],
        desc,
        zero_lanes=manifest["zero_lanes"],
        noise=manifest.get("noise", FRESH_NOISE),
    )
