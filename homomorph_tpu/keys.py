"""Secret and public keys.

TPU-native re-design of the reference's key types (reference:
src/context.rs:121-298):

* :class:`SecretKey` - one polynomial of exact degree ``d``, plus lazily
  built *reduction caches* (the per-key linear-map tables that make TPU
  decryption O(L) per bit - see :mod:`homomorph_tpu.gf2.poly`).
* :class:`PublicKey` - ``tau`` polynomials ``T_i = S*Q_i + X*R_i`` stored as
  one device tensor ``[tau, L]``, plus a lazily built unpacked bit-plane
  matrix used by the MXU encryption matmul.

Byte formats are identical to the reference (LE limb concatenation,
src/polynomial.rs:98-122; public key = list of per-polynomial byte strings,
src/context.rs:239-245,291-298), so keys round-trip between the two
implementations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import rng as _rng
from .gf2 import kernels as gf2k
from .gf2 import poly as gf2
from .params import Parameters
from .utils.errors import SecretKeyUnsetError

__all__ = ["SecretKey", "PublicKey", "generate_secret_key", "generate_public_key"]


_ZERO_MUL = None


def _zeroize_device_array(arr) -> None:
    """Best-effort physical overwrite of a device buffer with zeros.

    The reference volatile-zeroes secret material on drop
    (src/polynomial.rs:367-401, src/context.rs:199-206).  JAX arrays are
    immutable, so the closest analogue is a donated elementwise multiply by
    a runtime zero: donation lets XLA write the zero result in place over
    the donated input buffer (aliasing is the normal outcome for a same-
    shape elementwise op), after which both handles are deleted.  The
    multiplier is a traced argument so the zeroing cannot be constant-folded
    away.  Exact aliasing is runtime-dependent (hence "best-effort"); the
    buffer is freed regardless.
    """
    if arr is None:
        return
    global _ZERO_MUL
    if _ZERO_MUL is None:
        _ZERO_MUL = jax.jit(lambda x, z: x * z, donate_argnums=0)
    import warnings

    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # donation-unsupported warnings
            out = _ZERO_MUL(arr, jnp.uint32(0))
            out.block_until_ready()
            out.delete()
    except Exception:
        pass
    try:
        arr.delete()
    except Exception:
        pass


class SecretKey:
    """The secret key ``S`` (reference: src/context.rs:121-206).

    Zeroization: the reference volatile-zeroes the polynomial on drop
    (src/context.rs:199-206, src/polynomial.rs:367-401).  JAX arrays are
    immutable, so :meth:`zeroize` instead zeroes the host-side staging
    buffer, drops the device buffers (freeing them for reuse), and poisons
    the object against further use.
    """

    def __init__(self, limbs: np.ndarray | jax.Array):
        host = np.asarray(limbs, dtype=np.uint32)
        if host.ndim != 1 or host.size == 0:
            raise ValueError("secret key must be a non-empty 1-D limb vector")
        self._host = host
        self._limbs = jnp.asarray(host)
        self._degree = int(_host_degree(host))
        # Reject degenerate keys up front: a null or constant polynomial
        # (degree 0) cannot reduce anything - the reference panics on
        # division by a null polynomial (src/polynomial.rs:318-322) and a
        # legitimate key has exact degree d >= 1 (Parameters enforces
        # d >= 1; keygen forces the leading bit, src/polynomial.rs:89-90).
        # Failing loudly here beats silently-garbage decryption.
        if self._degree < 1:
            raise ValueError(
                "degenerate secret key: polynomial has degree 0 (null or "
                "constant) - a valid key has exact degree d >= 1"
            )
        # caches keyed by ciphertext limb count
        self._mask_cache: dict[int, jax.Array] = {}
        self._rows_cache: dict[int, jax.Array] = {}

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_bytes(cls, data: bytes) -> "SecretKey":
        """Rebuild from bytes (reference: src/context.rs:153-155)."""
        return cls(gf2.limbs_from_bytes(data))

    @classmethod
    def random(cls, d: int, source: _rng.RandomSource) -> "SecretKey":
        """Uniform secret key of exact degree ``d`` (src/context.rs:157-162)."""
        return cls(_rng.random_poly_limbs(source, d))

    # -- accessors ----------------------------------------------------------

    @property
    def degree(self) -> int:
        self._check_alive()
        return self._degree

    @property
    def limbs(self) -> jax.Array:
        self._check_alive()
        return self._limbs

    def to_bytes(self) -> bytes:
        """Serialize (reference: src/context.rs:170-194)."""
        self._check_alive()
        return gf2.limbs_to_bytes(self._host)

    # -- reduction caches (TPU decrypt fast path) ---------------------------

    #: Degree classes >= this many limbs compute the decrypt mask on the
    #: HOST via the native engine: the device recurrence is a sequential
    #: 32*n_limbs-step scan (minutes of device time at u32-product sizes,
    #: ~25M steps - the round-4 end-to-end blocker), while the native loop
    #: takes seconds and only the n_limbs*4-byte mask moves to the device.
    NATIVE_MASK_MIN_LIMBS = 1 << 15

    def decrypt_mask(self, n_limbs: int) -> jax.Array:
        """Packed ``w`` with ``w_i = (X^i mod S)(0)`` for ciphertexts of
        ``n_limbs`` limbs; cached per degree class.  Large classes route
        through the native host engine (bit-identical recurrence; parity
        test in tests/test_native.py)."""
        self._check_alive()
        w = self._mask_cache.get(n_limbs)
        if w is None:
            if n_limbs >= self.NATIVE_MASK_MIN_LIMBS:
                from . import native as _native

                host = _native.decrypt_mask(self._host, self._degree, n_limbs)
                if host is not None:
                    w = jnp.asarray(host)
            if w is None:
                w = gf2.decrypt_mask(self._limbs, self._degree, n_limbs)
            self._mask_cache[n_limbs] = w
        return w

    def reduction_rows(self, n_limbs: int) -> jax.Array:
        """Full ``X^i mod S`` table for remainders of ``n_limbs``-limb
        ciphertexts; cached per degree class."""
        self._check_alive()
        rows = self._rows_cache.get(n_limbs)
        if rows is None:
            rows = gf2.reduction_rows(
                self._limbs, self._degree, gf2.bit_capacity(n_limbs)
            )
            self._rows_cache[n_limbs] = rows
        return rows

    # -- lifecycle ----------------------------------------------------------

    def zeroize(self) -> None:
        """Scrub ALL secret-derived material: the host staging buffer, the
        device copy of ``S``, and every sk-derived reduction cache (the
        decrypt masks and ``X^i mod S`` tables are linear images of ``S``
        and leak it), then poison the object.  Device buffers are
        overwritten via donated zero-writes before being freed
        (:func:`_zeroize_device_array`); reference semantics at
        src/polynomial.rs:367-401, src/context.rs:199-206."""
        if self._host is not None:
            self._host.fill(0)
        self._host = None
        _zeroize_device_array(self._limbs)
        self._limbs = None
        for cache in (self._mask_cache, self._rows_cache):
            for arr in cache.values():
                _zeroize_device_array(arr)
            cache.clear()

    def _check_alive(self) -> None:
        if self._host is None:
            raise SecretKeyUnsetError("secret key has been zeroized")

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, SecretKey):
            return NotImplemented
        if self._host is None or other._host is None:
            return False  # a zeroized key equals nothing (incl. itself)
        # Trimmed-to-degree comparison (reference: src/polynomial.rs:417-426).
        return self._degree == other._degree and _trim_eq(
            self._host, other._host, self._degree
        )

    def __repr__(self) -> str:
        return f"SecretKey(degree={self._degree})"


class PublicKey:
    """The public key ``(T_i)_{1..tau}`` (reference: src/context.rs:208-298)."""

    def __init__(self, limbs: np.ndarray | jax.Array, degrees: np.ndarray | None = None):
        host = np.asarray(limbs, dtype=np.uint32)
        if host.ndim != 2 or host.shape[0] == 0:
            raise ValueError("public key must be a [tau, L] limb matrix")
        self._host = host
        self._limbs = jnp.asarray(host)
        self._degrees = (
            np.asarray(degrees, dtype=np.int64)
            if degrees is not None
            else np.array([_host_degree(row) for row in host], dtype=np.int64)
        )
        self._bits_cache: jax.Array | None = None

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_bytes(cls, bytes_list: list[bytes]) -> "PublicKey":
        """Rebuild from a list of per-polynomial byte strings
        (reference: src/context.rs:239-245).  The buffers are untrusted:
        an empty list, an empty row, or an all-zero row is rejected - a
        legitimate ``T_i = S*Q_i + X*R_i`` has exact degree ``d + dp >= 2``
        (leading terms of S and Q_i are forced to 1), never zero."""
        if not bytes_list:
            raise ValueError("public key must contain at least one polynomial")
        for i, b in enumerate(bytes_list):
            if len(b) == 0:
                raise ValueError(f"public key row {i} is empty")
        rows = [gf2.limbs_from_bytes(b) for b in bytes_list]
        for i, r in enumerate(rows):
            if not r.any():
                raise ValueError(
                    f"public key row {i} is the null polynomial - a valid "
                    "T_i has exact degree d + dp"
                )
        L = max(r.size for r in rows)
        mat = np.zeros((len(rows), L), dtype=np.uint32)
        for i, r in enumerate(rows):
            mat[i, : r.size] = r
        return cls(mat)

    # -- accessors ----------------------------------------------------------

    @property
    def tau(self) -> int:
        return self._host.shape[0]

    @property
    def num_limbs(self) -> int:
        return self._host.shape[1]

    @property
    def limbs(self) -> jax.Array:
        return self._limbs

    @property
    def degrees(self) -> np.ndarray:
        return self._degrees

    @property
    def max_degree(self) -> int:
        """Static bound on fresh ciphertext degree (= max deg T_i)."""
        return int(self._degrees.max())

    def to_bytes(self) -> list[bytes]:
        """Serialize as per-polynomial byte strings trimmed to each
        polynomial's degree class (reference: src/context.rs:269-298)."""
        out = []
        for i in range(self.tau):
            L = gf2.limbs_for(int(self._degrees[i]))
            out.append(gf2.limbs_to_bytes(self._host[i, :L]))
        return out

    def bit_planes(self) -> jax.Array:
        """Unpacked bf16 bit matrix [tau, n_bits] for the encrypt matmul.

        0/1 values are exact in bf16; the MXU accumulates in f32, and the
        per-bit popcounts are <= tau <= 65535 < 2^24, so the parity matmul
        is exact.
        """
        if self._bits_cache is None:
            n_bits = gf2.bit_capacity(self.num_limbs)
            self._bits_cache = gf2.unpack_bits(self._limbs, n_bits).astype(jnp.bfloat16)
        return self._bits_cache

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, PublicKey):
            return NotImplemented
        if self.tau != other.tau or (self._degrees != other._degrees).any():
            return False
        return all(
            _trim_eq(self._host[i], other._host[i], int(self._degrees[i]))
            for i in range(self.tau)
        )

    def __repr__(self) -> str:
        return f"PublicKey(tau={self.tau}, num_limbs={self.num_limbs})"


# --------------------------------------------------------------------------
# Key generation
# --------------------------------------------------------------------------


def generate_secret_key(params: Parameters, source: _rng.RandomSource) -> SecretKey:
    return SecretKey.random(params.d, source)


def generate_public_key(
    params: Parameters, sk: SecretKey, source: _rng.RandomSource
) -> PublicKey:
    """Build ``T_i = S*Q_i + X*R_i`` for i in [0, tau).

    Randomness is drawn host-side in the reference's exact order (Q_i then
    R_i, per i - src/context.rs:249-258) so a recorded stream replays
    bit-identically.  The ``tau`` products ``S*Q_i`` share the fixed operand
    ``S``, so they are computed as ONE batched carry-less multiply on
    device - a [tau, Lq] x [Ls] sweep - rather than tau sequential
    schoolbook multiplies.
    """
    d, dp, delta, tau = params.d, params.dp, params.delta, params.tau
    Lq = gf2.limbs_for(dp)
    Lr = gf2.limbs_for(delta)
    q_host = np.zeros((tau, Lq), dtype=np.uint32)
    r_host = np.zeros((tau, Lr), dtype=np.uint32)
    for i in range(tau):
        q_host[i] = _rng.random_poly_limbs(source, dp)
        r_host[i] = _rng.random_poly_limbs(source, delta)

    pk_limbs = _pk_from_qr(
        sk.limbs, jnp.asarray(q_host), jnp.asarray(r_host), params.pk_degree
    )
    host = np.asarray(jax.device_get(pk_limbs), dtype=np.uint32)
    # Exact degree d+dp for every T_i: leading terms of S and Q_i are forced
    # to 1, and deg(X*R_i) = delta+1 <= d cannot reach it.
    degrees = np.full((tau,), params.pk_degree, dtype=np.int64)
    return PublicKey(host, degrees)


def _pk_from_qr(
    s: jax.Array, q: jax.Array, r: jax.Array, pk_degree: int
) -> jax.Array:
    L = gf2.limbs_for(pk_degree)
    sq = gf2k.clmul(q, s)  # [tau, Lq + Ls]
    rx = gf2.shift_left_static(r, 1, L)  # X * R_i
    return gf2.pad_limbs(sq, max(L, sq.shape[-1]))[..., :L] ^ rx


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------


def _host_degree(limbs: np.ndarray) -> int:
    nz = np.flatnonzero(limbs)
    if nz.size == 0:
        return 0
    j = int(nz[-1])
    return j * 32 + int(limbs[j]).bit_length() - 1


def _trim_eq(a: np.ndarray, b: np.ndarray, degree: int) -> bool:
    L = degree // 32 + 1
    return bool(np.array_equal(a[:L], b[:L]))
