"""The cipher context: parameters + keys + the safe checked API.

Mirrors the reference's ``Context`` (reference: src/context.rs:300-596):

* key generation (``generate_secret_key`` clears the public key,
  src/context.rs:421-424; ``generate_public_key`` fails without a secret
  key, src/context.rs:444-454),
* explicit key set/get (``set_secret_key`` clears the public key,
  src/context.rs:568-571),
* ``encrypt``/``decrypt`` convenience (src/context.rs:463-488),
* the checked operation API ``apply1/apply2/apply_n`` gated by
  ``validate_operation`` (``d >= MIN_D_OVER_DELTA * delta`` computed in
  wide integers, src/context.rs:310-323, 496-546).

Randomness / security model (mirrors the reference, which draws every
random byte from the OS CSPRNG - src/polynomial.rs:87, src/cipher.rs:95):

* **Key generation** defaults to :class:`~homomorph_tpu.rng.OsRandomSource`
  (``os.urandom``) - full OS entropy, exactly like the reference.
* **Encryption** (the jitted device path) derives a FRESH 64-bit
  ``jax.random`` key from ``os.urandom`` for every ``encrypt`` call
  (:func:`~homomorph_tpu.rng.os_entropy_key`).  64 bits is the entire
  threefry-2x32 key space, so no path narrows the key space below what the
  PRNG supports; each ciphertext batch uses an independently-keyed stream.
* **Reproducibility seams** (opt-in, for tests/replay only): pass
  ``source=`` to pin key generation AND route encryption through the
  host byte stream in the reference's exact draw order, or
  ``encrypt_seed=`` to make the device encryption stream a deterministic
  split-chain from one seed.
"""

from __future__ import annotations

from typing import Any, Sequence, Type

import jax
import numpy as np

from . import codec as _codec
from . import keys as _keys
from . import rng as _rng
from .cipher import Ciphered
from .operations import OperationRequirement
from .params import Parameters
from .utils.errors import (
    InvalidParametersError,
    PublicKeyUnsetError,
    SecretKeyUnsetError,
)

__all__ = ["Context"]


class Context:
    """Parameters + keys + the safe checked API (src/context.rs:300-596).

    Key-generation order is enforced (src/context.rs:444-454), and
    generating or setting a secret key clears the public key
    (src/context.rs:421-424, 568-571):

    >>> import homomorph_tpu as hm
    >>> ctx = hm.Context(hm.Parameters(64, 16, 1, 16), source=hm.ThreefrySource(1))
    >>> ctx.generate_public_key()
    Traceback (most recent call last):
        ...
    homomorph_tpu.utils.errors.SecretKeyUnsetError: Secret key not generated yet
    >>> ctx.generate_secret_key()
    >>> ctx.generate_public_key()
    >>> ctx.generate_secret_key()          # invalidates the public key
    >>> ctx.get_public_key() is None
    True

    The checked API validates ``d >= required * delta`` before applying
    (src/context.rs:310-323):

    >>> from homomorph_tpu.models import HomomorphicMultiplication
    >>> small = hm.Context(hm.Parameters(32, 8, 2, 8))   # d/delta = 16 < 64
    >>> small.validate_operation(HomomorphicMultiplication)
    Traceback (most recent call last):
        ...
    homomorph_tpu.utils.errors.InvalidParametersError: operation requires \
d/delta >= 64, got d=32, delta=2
    """

    def __init__(
        self,
        parameters: Parameters,
        *,
        source: _rng.RandomSource | None = None,
        encrypt_seed: int | None = None,
        sharding=None,
    ):
        """``sharding=`` (a :class:`~homomorph_tpu.parallel.mesh.
        ShardingConfig`) turns this into a DISTRIBUTED context: batched
        ``encrypt`` routes through the sharded bulk pipeline (value axis
        data-parallel, tau-sharded public key with parity-domain psum) and
        the resulting ciphertexts stay sharded over the mesh; ``decrypt``
        follows the input sharding automatically (SPMD).  The reference
        has no distributed mode (SURVEY §5.8); this is the TPU-native
        scale-out surface."""
        self._parameters = parameters
        self._secret_key: _keys.SecretKey | None = None
        self._public_key: _keys.PublicKey | None = None
        # Default: OS CSPRNG for keygen (reference parity) and a fresh
        # full-entropy device key per encrypt call - see the module docstring.
        self._source = source if source is not None else _rng.OsRandomSource()
        self._enc_key = (
            jax.random.key(encrypt_seed) if encrypt_seed is not None else None
        )
        self._use_source_for_encrypt = source is not None
        if source is not None and encrypt_seed is not None:
            raise ValueError(
                "source= and encrypt_seed= are mutually exclusive: with a "
                "source, encryption replays the host byte stream and the "
                "seeded device key chain would be silently unused"
            )
        if sharding is not None and source is not None:
            raise ValueError(
                "sharding= is incompatible with source=: the host byte-"
                "stream replay path encrypts bit-by-bit and cannot route "
                "through the sharded bulk pipeline; use encrypt_seed= for "
                "deterministic distributed encryption"
            )
        self._sharding = sharding

    # -- accessors (src/context.rs:353-402) ----------------------------------

    @property
    def parameters(self) -> Parameters:
        return self._parameters

    def get_secret_key(self) -> _keys.SecretKey | None:
        return self._secret_key

    def get_public_key(self) -> _keys.PublicKey | None:
        return self._public_key

    # -- key generation (src/context.rs:404-454) -----------------------------

    def generate_secret_key(self) -> None:
        """Generate a fresh secret key; clears any public key
        (src/context.rs:421-424)."""
        self._secret_key = _keys.generate_secret_key(self._parameters, self._source)
        self._public_key = None

    def generate_public_key(self) -> None:
        """Generate the public key from the secret key; raises
        :class:`SecretKeyUnsetError` if none (src/context.rs:444-454)."""
        if self._secret_key is None:
            raise SecretKeyUnsetError("Secret key not generated yet")
        self._public_key = _keys.generate_public_key(
            self._parameters, self._secret_key, self._source
        )

    def set_secret_key(self, sk: _keys.SecretKey) -> None:
        """Explicitly set the secret key; clears the public key
        (src/context.rs:568-571)."""
        self._secret_key = sk
        self._public_key = None

    def set_public_key(self, pk: _keys.PublicKey) -> None:
        self._public_key = pk

    # -- encrypt / decrypt (src/context.rs:456-488) --------------------------

    def encrypt(
        self,
        data: Any,
        desc: _codec.TypeDescriptor | None = None,
        *,
        batch: bool = False,
    ) -> Ciphered:
        if self._public_key is None:
            raise PublicKeyUnsetError("Public key not generated yet")
        if self._use_source_for_encrypt:
            return Ciphered.cipher(
                data, self._public_key, desc, source=self._source, batch=batch
            )
        if self._enc_key is not None:
            self._enc_key, sub = jax.random.split(self._enc_key)
        else:
            sub = _rng.os_entropy_key()  # fresh OS entropy per stream
        sharding = self._sharding if batch else None
        return Ciphered.cipher(
            data, self._public_key, desc, key=sub, batch=batch, sharding=sharding
        )

    def decrypt(self, ciphered: Ciphered) -> Any:
        if self._secret_key is None:
            raise SecretKeyUnsetError("Secret key not generated yet")
        return ciphered.decipher(self._secret_key)

    def zeroize(self) -> None:
        """Scrub all key material held by this context.

        The reference zeroizes the secret key on Drop
        (src/context.rs:199-206); Python has no deterministic drop, so
        this is the explicit end-of-life call: the secret key (and every
        sk-derived reduction cache) is overwritten via
        :meth:`~homomorph_tpu.keys.SecretKey.zeroize`, and both key
        references are cleared.  The context remains usable after fresh
        ``generate_secret_key``/``generate_public_key`` calls.
        """
        if self._secret_key is not None:
            self._secret_key.zeroize()
        self._secret_key = None
        self._public_key = None

    # -- checked operation API (src/context.rs:308-323, 490-546) -------------

    def validate_operation(
        self, op: Type[OperationRequirement], *operands: Ciphered
    ) -> None:
        """Check ``d >= required * delta`` in wide integers
        (src/context.rs:310-323).  With operands given, the requirement is
        the operation's operand-specific bound
        (:meth:`~homomorph_tpu.operations.OperationRequirement.requirement_for`,
        e.g. the bit width for equality); without, the blanket class
        constant - the reference's behaviour."""
        required = op.requirement_for(*operands) if operands else op.MIN_D_OVER_DELTA
        d, delta = self._parameters.d, self._parameters.delta
        if d < required * delta:
            raise InvalidParametersError(required, d, delta)

    def apply1(self, op, a: Ciphered) -> Ciphered:
        self.validate_operation(op, a)
        return op.unsafe_apply(a)

    def apply2(self, op, a: Ciphered, b: Ciphered) -> Ciphered:
        self.validate_operation(op, a, b)
        return op.unsafe_apply(a, b)

    def apply_n(self, op, args: Sequence[Ciphered]) -> Ciphered:
        self.validate_operation(op, *args)
        return op.unsafe_apply(args)
