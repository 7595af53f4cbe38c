"""Bit-level encryption: ``CipheredBit`` and typed ``Ciphered`` containers.

TPU-native re-design of the reference's cipher layer (reference:
src/cipher.rs).  Semantics parity:

* encrypt one bit ``x``: draw a random subset ``U`` of ``[0, tau)`` and set
  ``C = (XOR_{i in U} T_i) + x`` (src/cipher.rs:92-115),
* decrypt: ``(C mod S)(0)`` (src/cipher.rs:117-123),
* ``Ciphered<T>``: bincode-encode then one ciphered bit per plaintext bit,
  LSB-first within each byte (src/cipher.rs:175-191); decipher reassembles
  LSB-first, requires a multiple-of-8 bit count and caps decode at 1 MiB
  (src/cipher.rs:15, 217-250).

TPU-first redesign:

* The subset XOR-sum is a *parity matmul*: XOR over selected rows equals the
  per-bit popcount mod 2, so ``C_bits = (sel @ pk_bits) & 1`` where ``sel``
  is [num_bits, tau] of 0/1 and ``pk_bits`` is the public key's unpacked
  bit-plane matrix.  One MXU matmul encrypts the whole batch - replacing
  the reference's per-bit loop of up to tau polynomial XORs
  (src/cipher.rs:105-111).
* Decryption uses the per-key reduction mask: one AND + popcount-parity per
  ciphered bit (see :func:`homomorph_tpu.gf2.poly.decrypt_mask`).
* Everything is batched: a ``Ciphered`` may carry leading batch dimensions,
  encrypting/decrypting many values in one device program.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import codec as _codec
from . import rng as _rng
from .gf2 import kernels as gf2k
from .gf2 import poly as gf2
from .keys import PublicKey, SecretKey
from .utils.errors import (
    DecodeTooLargeError,
    DeserializeError,
    InvalidCipheredLengthError,
    SerializeError,
)

__all__ = ["CipheredBit", "Ciphered", "MAX_DECODE_BYTES"]

MAX_DECODE_BYTES = _codec.MAX_DECODE_BYTES  # src/cipher.rs:15


def _encode_values(
    desc: _codec.TypeDescriptor, values: list
) -> tuple[bytes, int]:
    """Encode a batch; return (payload, bits per value).

    Fixed-size types take the vectorized ``encode_batch`` staging path
    (numpy, no per-value Python calls); variable-length types
    (Vec/String/Option/enum) must encode to EQUAL lengths within one batch
    because a ``Ciphered`` is one rectangular lane tensor (pad plaintexts
    or split the batch otherwise)."""
    if not values:
        raise SerializeError("cannot encrypt an empty batch")
    if desc.is_fixed_size:
        return desc.encode_batch(values), desc.num_bits
    payloads = [desc.encode(v) for v in values]
    n_bytes = len(payloads[0])
    if any(len(p) != n_bytes for p in payloads):
        raise SerializeError(
            f"batched {desc.name} values must encode to equal byte lengths; "
            f"got {sorted({len(p) for p in payloads})} - pad the plaintexts "
            "or encrypt them separately"
        )
    if n_bytes == 0:
        raise SerializeError(f"{desc.name} encoded to zero bytes")
    return b"".join(payloads), n_bytes * 8


# --------------------------------------------------------------------------
# Jitted device cores
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(3,))
def _encrypt_core(
    sel: jax.Array, pk_bits: jax.Array, plain_bits: jax.Array, out_limbs: int
) -> jax.Array:
    """Parity-matmul encryption.

    ``sel``: [..., tau] subset indicators (uint8/bool);
    ``pk_bits``: [tau, D] bf16 bit planes; ``plain_bits``: [...] 0/1.
    Returns packed ciphertext limbs [..., out_limbs].

    Counts accumulate on the MXU; they stay exact in bf16 output up to
    tau <= 256 (bf16 integers are exact to 2^8), f32 beyond.  The
    parity + limb pack is a second MXU matmul (:func:`gf2.parity_pack`).
    """
    tau = pk_bits.shape[0]
    acc = jnp.bfloat16 if tau <= 256 else jnp.float32
    counts = jnp.matmul(
        sel.astype(jnp.bfloat16), pk_bits, preferred_element_type=acc
    )
    limbs = gf2.parity_pack(counts, out_limbs)
    return gf2.xor_const_bit(limbs, plain_bits.astype(jnp.uint32))


@jax.jit
def _decrypt_core(limbs: jax.Array, w: jax.Array) -> jax.Array:
    """Masked popcount-parity decryption: [..., L] -> [...] bits."""
    return gf2.decipher_bits(limbs, w)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _random_selection(key: jax.Array, shape: tuple[int, ...], tau: int) -> jax.Array:
    """Device-side subset indicators [*shape, tau] (production path)."""
    words = jax.random.bits(key, shape + (-(-tau // 32),), dtype=jnp.uint32)
    return gf2.unpack_bits(words, tau)


# --------------------------------------------------------------------------
# CipheredBit
# --------------------------------------------------------------------------


#: Normalized (delta=1) worst-case noise degree of a FRESH ciphertext:
#: ``delta + 1`` evaluated at delta=1.  Noise bounds are tracked in these
#: normalized units on every ciphertext; the checked API's requirement is
#: ``tracked + 1`` (models/noise.py::required_ratio soundness argument -
#: every tracked value is a max/+ composition of fresh seeds, and
#: ``seed(delta) = delta + 1 <= 2 * delta`` makes delta=1 the binding case).
FRESH_NOISE = 2


class CipheredBit:
    """One encrypted bit - a GF(2) polynomial (reference: src/cipher.rs:26-123).

    May carry leading batch dimensions: ``limbs`` has shape [*batch, L].
    ``bound`` is the static degree-class bound (replaces the reference's
    dynamic per-polynomial ``degree`` field for shape purposes; the exact
    degree is available via :meth:`degree`).  ``noise`` is the worst-case
    NOISE degree in normalized delta=1 units (see :data:`FRESH_NOISE`),
    propagated through gates with the same degree algebra as ``bound``
    (xor -> max, and -> sum); the checked API consumes it so composed
    ciphertexts keep a sound correctness envelope.
    """

    __slots__ = ("limbs", "bound", "noise")

    def __init__(self, limbs: jax.Array, bound: int, noise: int = FRESH_NOISE):
        self.limbs = limbs
        self.bound = int(bound)
        self.noise = int(noise)

    # -- trivial ciphertexts (src/cipher.rs:33-51) --------------------------

    @classmethod
    def zero(cls, batch: tuple[int, ...] = ()) -> "CipheredBit":
        return cls(gf2.null(1, batch), 0, noise=0)

    @classmethod
    def one(cls, batch: tuple[int, ...] = ()) -> "CipheredBit":
        m = gf2.monomial(0)
        if batch:
            m = jnp.broadcast_to(m, batch + (1,))
        return cls(m, 0, noise=0)

    # -- gates (src/cipher.rs:53-90) ----------------------------------------

    def xor(self, other: "CipheredBit") -> "CipheredBit":
        return CipheredBit(
            gf2.xor(self.limbs, other.limbs),
            max(self.bound, other.bound),
            noise=max(self.noise, other.noise),
        )

    def and_(self, other: "CipheredBit") -> "CipheredBit":
        prod = gf2k.clmul(self.limbs, other.limbs)
        bound = self.bound + other.bound
        # Degree-class quantization: keep the static shape universe small
        # so repeated circuit steps hit the XLA compile cache.
        return CipheredBit(
            gf2.fit_limbs(prod, gf2.bucket(gf2.limbs_for(bound))),
            bound,
            noise=self.noise + other.noise,
        )

    def or_(self, other: "CipheredBit") -> "CipheredBit":
        # a + b + a*b (src/cipher.rs:71-81)
        return self.xor(other).xor(self.and_(other))

    def not_(self) -> "CipheredBit":
        # xor with the unit polynomial (src/cipher.rs:83-90)
        return CipheredBit(
            gf2.xor_const_bit(self.limbs, 1), self.bound, noise=self.noise
        )

    # alias matching the reference's method names
    __xor__ = xor
    __and__ = and_
    __or__ = or_
    __invert__ = not_

    # -- accessors -----------------------------------------------------------

    @property
    def batch_shape(self) -> tuple[int, ...]:
        return self.limbs.shape[:-1]

    @property
    def num_limbs(self) -> int:
        return self.limbs.shape[-1]

    def degree(self) -> jax.Array:
        return gf2.compute_degree(self.limbs)

    def decipher(self, sk: SecretKey) -> jax.Array:
        """Decrypt to 0/1 (src/cipher.rs:117-123) via the reduction mask."""
        return _decrypt_core(self.limbs, sk.decrypt_mask(self.num_limbs))

    def pad_to(self, num_limbs: int) -> "CipheredBit":
        return CipheredBit(
            gf2.pad_limbs(self.limbs, num_limbs), self.bound, noise=self.noise
        )

    def __repr__(self) -> str:
        return (
            f"CipheredBit(batch={self.batch_shape}, L={self.num_limbs}, "
            f"bound={self.bound}, noise={self.noise})"
        )


# --------------------------------------------------------------------------
# Ciphered
# --------------------------------------------------------------------------


class Ciphered:
    """Typed container of ciphered bits (reference: src/cipher.rs:125-259).

    ``limbs``: [*batch, n_bits, L] uint32; lane ``i`` is plaintext bit ``i``
    (LSB-first within each serialized byte, src/cipher.rs:180-185).
    ``desc``: the plaintext :class:`~homomorph_tpu.codec.TypeDescriptor`.
    ``bound``: static degree bound shared by all lanes.
    ``zero_lanes``: number of IMPLICIT trailing trivial-zero lanes - lanes
    that are known-zero plaintext with degree 0 and are therefore not
    stored (the degree-trimmed storage discipline of
    src/polynomial.rs:404-426 lifted to the lane axis).  Compare/eq
    results carry 7 such lanes (a bincode bool is one byte, bit 0 =
    value), so decipher-after-compare reads 1/8 the bytes.
    ``noise``: worst-case noise degree over all lanes, in normalized
    delta=1 units (:data:`FRESH_NOISE`); stamped by every shipped circuit
    and consumed by the checked API so the correctness envelope stays
    sound under COMPOSITION (applying ops to results of previous ops) -
    a guarantee the reference's static per-op constants cannot give
    (src/impls/numbers.rs:27-50).
    """

    __slots__ = ("limbs", "bound", "desc", "zero_lanes", "noise")

    def __init__(
        self,
        limbs: jax.Array,
        bound: int,
        desc: _codec.TypeDescriptor,
        zero_lanes: int = 0,
        noise: int = FRESH_NOISE,
    ):
        if limbs.ndim < 2:
            raise ValueError("Ciphered limbs must be at least [n_bits, L]")
        if zero_lanes < 0:
            raise ValueError("zero_lanes must be non-negative")
        self.limbs = limbs
        self.bound = int(bound)
        self.desc = desc
        self.zero_lanes = int(zero_lanes)
        self.noise = int(noise)

    # -- construction --------------------------------------------------------

    @classmethod
    def cipher(
        cls,
        data: Any,
        pk: PublicKey,
        desc: _codec.TypeDescriptor | None = None,
        *,
        key: jax.Array | None = None,
        source: _rng.RandomSource | None = None,
        batch: bool = False,
        sharding=None,
    ) -> "Ciphered":
        """Encrypt ``data`` (reference: src/cipher.rs:153-191).

        Exactly one randomness mode:

        * ``key``  - a ``jax.random`` key; subset bits are generated on
          device (production fast path, fully jitted).
        * ``source`` - a host :class:`~homomorph_tpu.rng.RandomSource`;
          bytes are consumed per bit in the reference's exact order
          (``ceil(tau/8)`` bytes each, src/cipher.rs:92-97) for bit-exact
          replay.

        With ``batch=True``, ``data`` is a sequence of values encrypted as
        one leading batch dimension.  With ``sharding=`` (a
        :class:`~homomorph_tpu.parallel.mesh.ShardingConfig`), the batch
        is encrypted through the sharded bulk pipeline: the value axis is
        data-parallel and the public key is tau-sharded with a parity-
        domain psum; requires ``batch=True``, the ``key`` randomness mode,
        and a batch divisible by the mesh's data axis.
        """
        if (key is None) == (source is None):
            raise ValueError("pass exactly one of key= or source=")
        values = list(data) if batch else [data]
        if desc is None:
            desc = _codec.descriptor_for(values[0])

        payload, n_bits = _encode_values(desc, values)
        all_bits = np.unpackbits(
            np.frombuffer(payload, dtype=np.uint8), bitorder="little"
        ).reshape(len(values), n_bits)

        tau = pk.tau
        shape = (len(values), n_bits)
        bound = pk.max_degree
        L = gf2.limbs_for(bound)
        total = len(values) * n_bits
        W = -(-tau // 32)

        if sharding is not None:
            if key is None or not batch:
                raise ValueError(
                    "sharding= requires the key= randomness mode and batch=True"
                )
            n_data = sharding.mesh.shape[sharding.data_axis]
            if len(values) % n_data:
                raise ValueError(
                    f"batch of {len(values)} values not divisible by the "
                    f"mesh data axis ({n_data})"
                )
            n_tau = sharding.mesh.shape[sharding.tau_axis]
            if tau % n_tau:
                raise ValueError(
                    f"tau={tau} not divisible by the mesh tau axis ({n_tau})"
                )
            from .parallel import bulk

            sel = _random_selection(key, shape, tau)
            limbs = bulk.sharded_encrypt_bits(
                sharding, sel, pk.bit_planes(), jnp.asarray(all_bits), L
            )
            return cls(limbs, bound, desc, noise=FRESH_NOISE)

        if key is not None and total % 128 == 0:
            # Fused Pallas path: packed selection words straight into the
            # single-pass encrypt kernel (falls back to XLA off-TPU).
            from .gf2.encrypt_kernel import encrypt_bits_fused

            selw = jax.random.bits(key, (total, W), dtype=jnp.uint32)
            flat = encrypt_bits_fused(
                selw,
                pk.bit_planes(),
                jnp.asarray(all_bits.reshape(total).astype(np.uint32)),
                L,
            )
            limbs = flat.reshape(shape + (L,))
        else:
            if key is not None:
                sel = _random_selection(key, shape, tau)
            else:
                sel_host = np.empty(shape + (tau,), dtype=np.uint8)
                for v in range(len(values)):
                    for i in range(n_bits):
                        sel_host[v, i] = _rng.random_selection_bits(source, tau)
                sel = jnp.asarray(sel_host)
            limbs = _encrypt_core(sel, pk.bit_planes(), jnp.asarray(all_bits), L)

        if not batch:
            limbs = limbs[0]
        return cls(limbs, bound, desc, noise=FRESH_NOISE)

    # DELIBERATE parity delta vs the reference's fallible/panicking split
    # (src/cipher.rs:153-208): Rust needs distinct `try_cipher -> Result`
    # and `cipher -> panic` entry points because panics are not a typed
    # error surface there.  In Python exceptions ARE the typed error
    # surface (SerializeError/CipherError subclasses), so both names bind
    # one implementation; `try_*` exists so reference code ports verbatim.
    try_cipher = cipher

    @classmethod
    def trivial(
        cls,
        data: Any,
        desc: _codec.TypeDescriptor | None = None,
        *,
        batch: bool = False,
    ) -> "Ciphered":
        """Unencrypted (trivial) ciphertext of a plaintext value.

        Lifts the reference's trivial bit ciphers ``zero``/``one``
        (src/cipher.rs:33-51) to whole values: bit ``i`` of the encoding
        becomes ``monomial(0)`` or the null polynomial.  Useful for mixing
        public constants into homomorphic circuits (e.g. ``x + 42``)
        without touching the public key.  Degree bound 0.
        """
        values = list(data) if batch else [data]
        if desc is None:
            desc = _codec.descriptor_for(values[0])
        payload, n_bits = _encode_values(desc, values)
        bits = np.unpackbits(
            np.frombuffer(payload, dtype=np.uint8), bitorder="little"
        ).reshape(len(values), n_bits)
        limbs = jnp.asarray(bits.astype(np.uint32))[..., None]  # [B, n, 1]
        if not batch:
            limbs = limbs[0]
        return cls(limbs, 0, desc, noise=0)

    @classmethod
    def new_from_raw(
        cls, bits: "Sequence[CipheredBit] | jax.Array", desc: _codec.TypeDescriptor,
        bound: int | None = None, noise: int | None = None,
    ) -> "Ciphered":
        """Assemble from raw ciphered bits (reference: src/cipher.rs:133-151).

        The caller vouches that the bits are valid ciphertexts; this is the
        extension surface for custom operations (examples/simple_struct.rs).
        Accepts a list of :class:`CipheredBit` lanes (padded to the max
        degree class and stacked - their tracked ``noise`` carries over as
        the lane-wise worst) or a pre-stacked limb tensor, for which BOTH
        ``bound=`` and ``noise=`` are required: a raw tensor carries no
        tracked metadata, and defaulting ``noise`` to fresh would let
        circuit outputs silently regain a fresh envelope - exactly the
        hole composition tracking closes.  Pass the lanes' composed noise
        value, or ``noise=bound`` as the always-sound worst case (the
        noise polynomial's degree never exceeds the ciphertext's; the
        tracked unit is normalized delta=1, where ratio = degree + 1 -
        models/noise.py::required_ratio).
        """
        if isinstance(bits, (list, tuple)):
            L = max(b.num_limbs for b in bits)
            stacked = jnp.stack([b.pad_to(L).limbs for b in bits], axis=-2)
            bnd = max(b.bound for b in bits) if bound is None else bound
            nz = max(b.noise for b in bits) if noise is None else noise
            return cls(stacked, bnd, desc, noise=nz)
        if bound is None:
            raise ValueError("bound= is required when passing a raw limb tensor")
        if noise is None:
            raise ValueError(
                "noise= is required when passing a raw limb tensor: a raw "
                "tensor has no tracked envelope, and assuming fresh would "
                "unsoundly reset it (pass the lanes' composed noise, or "
                "noise=bound for the conservative worst case)"
            )
        return cls(bits, bound, desc, noise=noise)

    # -- decryption ----------------------------------------------------------

    def decipher(self, sk: SecretKey) -> Any:
        """Decrypt and decode (reference: src/cipher.rs:193-250)."""
        n = len(self)
        if n % 8 != 0:
            raise InvalidCipheredLengthError(n)
        n_bytes = n // 8
        if n_bytes > MAX_DECODE_BYTES:
            raise DecodeTooLargeError(n_bytes, MAX_DECODE_BYTES)
        host = self.decipher_bits(sk)
        flat = host.reshape(-1, n)
        data = np.packbits(flat, axis=-1, bitorder="little")
        values = self.desc.decode_batch(data)
        if self.batch_shape == ():
            return values[0]
        out = np.empty(len(values), dtype=object)
        out[:] = values
        return out.reshape(self.batch_shape)

    try_decipher = decipher  # deliberate alias — see try_cipher note above

    def decipher_bits(self, sk: SecretKey) -> np.ndarray:
        """Decrypt to raw plaintext bits [*batch, n_bits] without decoding."""
        bits = _decrypt_core(self.limbs, sk.decrypt_mask(self.num_limbs))
        host = np.asarray(jax.device_get(bits), dtype=np.uint8)
        if self.zero_lanes:
            host = np.concatenate(
                [host, np.zeros(host.shape[:-1] + (self.zero_lanes,), np.uint8)],
                axis=-1,
            )
        return host

    # -- bit-lane surface (Deref<[CipheredBit]> analogue) --------------------

    @property
    def batch_shape(self) -> tuple[int, ...]:
        return self.limbs.shape[:-2]

    @property
    def num_limbs(self) -> int:
        return self.limbs.shape[-1]

    def __len__(self) -> int:
        return self.limbs.shape[-2] + self.zero_lanes

    def __getitem__(self, i):
        """Bit-lane access: ``c[i]`` -> :class:`CipheredBit`, ``c[a:b]`` ->
        list of lanes (the reference's ``Deref<[CipheredBit]>`` slice
        semantics, src/cipher.rs:253-259)."""
        if isinstance(i, slice):
            return [self[j] for j in range(*i.indices(len(self)))]
        n_phys = self.limbs.shape[-2]
        if i < 0:
            i += len(self)
        if i < 0 or i >= len(self):
            raise IndexError(i)
        if i >= n_phys:
            return CipheredBit.zero(self.batch_shape)
        return CipheredBit(self.limbs[..., i, :], self.bound, noise=self.noise)

    def densify(self) -> "Ciphered":
        """Materialize the implicit trailing zero lanes as physical lanes
        (no-op when ``zero_lanes == 0``).  Circuit entry points call this
        so lane-tensor math always sees the full logical lane count."""
        if not self.zero_lanes:
            return self
        z = jnp.zeros(
            self.limbs.shape[:-2] + (self.zero_lanes, self.limbs.shape[-1]),
            dtype=self.limbs.dtype,
        )
        return Ciphered(
            jnp.concatenate([self.limbs, z], axis=-2), self.bound, self.desc,
            noise=self.noise,
        )

    def bits(self) -> list[CipheredBit]:
        return [self[i] for i in range(len(self))]

    def split_at(self, mid: int) -> tuple[list[CipheredBit], list[CipheredBit]]:
        """Split the bit-lane slice (the examples' field-extraction idiom,
        examples/simple_struct.rs:32-43)."""
        bs = self.bits()
        return bs[:mid], bs[mid:]

    def reinterpret(self, desc: _codec.TypeDescriptor) -> "Ciphered":
        """View the same lanes as a different plaintext type.

        Variable-length descriptors (Vec/String/Option/enum) cannot be
        width-checked here; their decode validates at decipher time."""
        if desc.is_fixed_size and desc.num_bits != len(self):
            raise ValueError(
                f"{desc!r} needs {desc.num_bits} lanes, have {len(self)}"
            )
        return Ciphered(self.limbs, self.bound, desc, zero_lanes=self.zero_lanes,
                        noise=self.noise)

    # -- ciphertext serialization (gap in the reference; added here) ---------

    #: Wire-format magic ("HMCT" LE) + current version.  The key byte
    #: formats are fixed by reference parity (src/polynomial.rs:98-122);
    #: the ciphertext serializer is this framework's own addition and is
    #: versioned from day one so layout evolution is detectable
    #: (format-evolution notes in DESIGN.md).
    WIRE_MAGIC = 0x54434D48
    WIRE_VERSION = 2  # v2 appends the tracked noise bound to the header

    def to_bytes(self) -> bytes:
        """Serialize ciphertext: u32 header (magic, version, n_bits,
        zero_lanes, L, bound, noise, batch rank + dims) then LE limbs.  The
        reference has no ciphertext serializer (noted gap - SURVEY §5.4);
        the per-polynomial byte format matches src/polynomial.rs:98-105.
        Version 2 added the tracked noise bound (format-evolution notes in
        DESIGN.md §8); version-1 buffers still load (noise assumed fresh,
        matching what every v1 writer produced)."""
        host = np.asarray(jax.device_get(self.limbs), dtype=np.uint32)
        bshape = self.batch_shape
        header = np.array(
            [
                self.WIRE_MAGIC,
                self.WIRE_VERSION,
                len(self),
                self.zero_lanes,
                self.num_limbs,
                self.bound,
                self.noise,
                len(bshape),
                *bshape,
            ],
            dtype="<u4",
        )
        return header.tobytes() + host.astype("<u4").tobytes()

    _WIRE_HEAD_V1 = 28  # 7 fixed u32 fields before the batch dims
    _WIRE_HEAD = 32  # v2: + noise field

    @classmethod
    def from_bytes(cls, data: bytes, desc: _codec.TypeDescriptor) -> "Ciphered":
        """Deserialize; the buffer is untrusted input, so the header is
        fully validated (magic, version, sizes, rank, width-vs-desc)
        before any reshape."""
        if len(data) < cls._WIRE_HEAD_V1 or len(data) % 4:
            raise DeserializeError(
                f"ciphertext buffer too short or misaligned ({len(data)} bytes)"
            )
        magic, version = (
            int(x) for x in np.frombuffer(data[:8], dtype="<u4")
        )
        if magic != cls.WIRE_MAGIC:
            raise DeserializeError(
                f"not a homomorph_tpu ciphertext (magic 0x{magic:08x}, "
                f"expected 0x{cls.WIRE_MAGIC:08x})"
            )
        if version not in (1, 2):
            raise DeserializeError(
                f"unsupported ciphertext wire version {version} "
                f"(this build reads versions 1-{cls.WIRE_VERSION})"
            )
        H = cls._WIRE_HEAD if version == 2 else cls._WIRE_HEAD_V1
        if len(data) < H:
            raise DeserializeError("ciphertext buffer truncated in header")
        head = np.frombuffer(data[8:H], dtype="<u4")
        if version == 2:
            n_bits, zero_lanes, L, bound, noise, rank = (int(x) for x in head)
        else:  # v1 writers predate noise tracking; they only ever wrote
            # fresh ciphertexts (circuits were applied in-session)
            n_bits, zero_lanes, L, bound, rank = (int(x) for x in head)
            noise = FRESH_NOISE
        if n_bits == 0 or L == 0 or rank > 8 or zero_lanes >= n_bits:
            raise DeserializeError(
                f"corrupt ciphertext header: n_bits={n_bits}, "
                f"zero_lanes={zero_lanes}, L={L}, rank={rank}"
            )
        if len(data) < H + 4 * rank:
            raise DeserializeError("ciphertext buffer truncated in batch dims")
        bshape = tuple(
            int(x) for x in np.frombuffer(data[H : H + 4 * rank], dtype="<u4")
        )
        body = np.frombuffer(data[H + 4 * rank :], dtype="<u4").astype(np.uint32)
        n_phys = n_bits - zero_lanes
        expect = int(np.prod(bshape, dtype=np.int64)) * n_phys * L if rank else n_phys * L
        if body.size != expect:
            raise DeserializeError(
                f"ciphertext body has {body.size} limbs, header implies {expect}"
            )
        if desc.is_fixed_size and desc.num_bits != n_bits:
            raise DeserializeError(
                f"{desc!r} expects {desc.num_bits} bit lanes, buffer has {n_bits}"
            )
        limbs = jnp.asarray(body.reshape(*bshape, n_phys, L))
        return cls(limbs, bound, desc, zero_lanes=zero_lanes, noise=noise)

    def __repr__(self) -> str:
        return (
            f"Ciphered<{self.desc.name}>(batch={self.batch_shape}, "
            f"n_bits={len(self)}, L={self.num_limbs}, bound={self.bound}, "
            f"noise={self.noise})"
        )
