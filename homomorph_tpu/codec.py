"""Plaintext serialization, wire-compatible with the reference.

The reference serializes plaintexts with bincode 2 configured as
little-endian + fixed-int + no-limit (reference: src/cipher.rs:6-13) before
bit-slicing LSB-first (src/cipher.rs:180-185).  This module re-implements
that exact wire format for the types the framework ships:

* fixed-width ints (u8..u128, i8..i128, usize/isize as u64/i64 - bincode
  fixint encodes usize as u64), bool (1 byte), f32/f64 (LE IEEE-754),
* fixed-size arrays (element-wise, no length prefix),
* structs (declaration-order field concatenation - the invariant both
  reference examples lean on: examples/unbalanced_struct.rs:11-33).

Every type is described by a :class:`TypeDescriptor` with ``encode`` /
``decode`` / ``num_bytes``; ciphertext bit-length is always
``8 * num_bytes`` (matching ``Ciphered::cipher``, src/cipher.rs:175-191).
"""

from __future__ import annotations

import dataclasses
import struct as _struct
from typing import Any, Callable, Sequence

import numpy as np

from .utils.errors import DeserializeError, SerializeError

__all__ = [
    "TypeDescriptor",
    "IntDescriptor",
    "BoolDescriptor",
    "FloatDescriptor",
    "StructDescriptor",
    "ArrayDescriptor",
    "BytesDescriptor",
    "U8", "U16", "U32", "U64", "U128", "Usize",
    "I8", "I16", "I32", "I64", "I128", "Isize",
    "Bool", "F32", "F64",
    "struct_of", "descriptor_for",
]


class TypeDescriptor:
    """Describes how a plaintext type maps to bincode-fixint-LE bytes."""

    name: str
    num_bytes: int

    @property
    def num_bits(self) -> int:
        return self.num_bytes * 8

    def encode(self, value: Any) -> bytes:
        raise NotImplementedError

    def decode(self, data: bytes) -> Any:
        raise NotImplementedError

    def __repr__(self) -> str:
        return self.name


class IntDescriptor(TypeDescriptor):
    def __init__(self, bits: int, signed: bool, name: str | None = None):
        if bits % 8:
            raise ValueError("bit width must be a multiple of 8")
        self.bits = bits
        self.signed = signed
        self.num_bytes = bits // 8
        self.name = name or f"{'i' if signed else 'u'}{bits}"

    def encode(self, value: Any) -> bytes:
        try:
            v = int(value)
            return v.to_bytes(self.num_bytes, "little", signed=self.signed)
        except (OverflowError, TypeError, ValueError) as e:
            raise SerializeError(f"cannot encode {value!r} as {self.name}: {e}") from e

    def decode(self, data: bytes) -> int:
        if len(data) != self.num_bytes:
            raise DeserializeError(
                f"{self.name} expects {self.num_bytes} bytes, got {len(data)}"
            )
        return int.from_bytes(data, "little", signed=self.signed)


class BoolDescriptor(TypeDescriptor):
    name = "bool"
    num_bytes = 1

    def encode(self, value: Any) -> bytes:
        return b"\x01" if value else b"\x00"

    def decode(self, data: bytes) -> bool:
        if data not in (b"\x00", b"\x01"):
            raise DeserializeError(f"invalid bool byte {data!r}")
        return data == b"\x01"


class FloatDescriptor(TypeDescriptor):
    def __init__(self, bits: int):
        self.bits = bits
        self.num_bytes = bits // 8
        self.name = f"f{bits}"
        self._fmt = "<f" if bits == 32 else "<d"

    def encode(self, value: Any) -> bytes:
        try:
            return _struct.pack(self._fmt, float(value))
        except (TypeError, ValueError) as e:
            raise SerializeError(f"cannot encode {value!r} as {self.name}") from e

    def decode(self, data: bytes) -> float:
        if len(data) != self.num_bytes:
            raise DeserializeError(f"{self.name} expects {self.num_bytes} bytes")
        return _struct.unpack(self._fmt, data)[0]


class BytesDescriptor(TypeDescriptor):
    """A fixed-length raw byte string (``[u8; N]``)."""

    def __init__(self, n: int):
        self.num_bytes = n
        self.name = f"bytes{n}"

    def encode(self, value: Any) -> bytes:
        b = bytes(value)
        if len(b) != self.num_bytes:
            raise SerializeError(f"expected {self.num_bytes} bytes, got {len(b)}")
        return b

    def decode(self, data: bytes) -> bytes:
        return bytes(data)


class ArrayDescriptor(TypeDescriptor):
    """Fixed-size array ``[T; N]`` - element-wise, no length prefix."""

    def __init__(self, element: TypeDescriptor, n: int):
        self.element = element
        self.n = n
        self.num_bytes = element.num_bytes * n
        self.name = f"[{element.name}; {n}]"

    def encode(self, value: Sequence[Any]) -> bytes:
        if len(value) != self.n:
            raise SerializeError(f"expected {self.n} elements, got {len(value)}")
        return b"".join(self.element.encode(v) for v in value)

    def decode(self, data: bytes) -> list:
        k = self.element.num_bytes
        return [self.element.decode(data[i * k : (i + 1) * k]) for i in range(self.n)]


class StructDescriptor(TypeDescriptor):
    """Declaration-order field concatenation (bincode derive semantics).

    The ciphered layout of a struct is its fields' bit-lanes in declaration
    order regardless of any in-memory layout optimization - the invariant
    demonstrated by the reference's examples/unbalanced_struct.rs:11-33.
    """

    def __init__(
        self,
        fields: Sequence[tuple[str, TypeDescriptor]],
        name: str = "struct",
        constructor: Callable[..., Any] | None = None,
    ):
        self.fields = list(fields)
        self.name = name
        self.num_bytes = sum(d.num_bytes for _, d in self.fields)
        self._constructor = constructor

    def field_bit_offsets(self) -> dict[str, tuple[int, int]]:
        """Map field name -> (bit_offset, bit_length) in the ciphered layout.

        This is the slice/recombine extension surface the reference exposes
        through ``Deref<[CipheredBit]>`` + ``split_at``
        (examples/simple_struct.rs:30-58).
        """
        out = {}
        off = 0
        for fname, d in self.fields:
            out[fname] = (off, d.num_bits)
            off += d.num_bits
        return out

    def encode(self, value: Any) -> bytes:
        parts = []
        for fname, d in self.fields:
            if isinstance(value, dict):
                v = value[fname]
            else:
                v = getattr(value, fname)
            parts.append(d.encode(v))
        return b"".join(parts)

    def decode(self, data: bytes) -> Any:
        out = {}
        off = 0
        for fname, d in self.fields:
            out[fname] = d.decode(data[off : off + d.num_bytes])
            off += d.num_bytes
        if self._constructor is not None:
            return self._constructor(**out)
        return out


# -- canonical instances ------------------------------------------------------

U8 = IntDescriptor(8, False)
U16 = IntDescriptor(16, False)
U32 = IntDescriptor(32, False)
U64 = IntDescriptor(64, False)
U128 = IntDescriptor(128, False)
Usize = IntDescriptor(64, False, name="usize")  # bincode fixint: usize as u64
I8 = IntDescriptor(8, True)
I16 = IntDescriptor(16, True)
I32 = IntDescriptor(32, True)
I64 = IntDescriptor(64, True)
I128 = IntDescriptor(128, True)
Isize = IntDescriptor(64, True, name="isize")
Bool = BoolDescriptor()
F32 = FloatDescriptor(32)
F64 = FloatDescriptor(64)

_NUMPY_MAP = {
    np.dtype(np.uint8): U8, np.dtype(np.uint16): U16,
    np.dtype(np.uint32): U32, np.dtype(np.uint64): U64,
    np.dtype(np.int8): I8, np.dtype(np.int16): I16,
    np.dtype(np.int32): I32, np.dtype(np.int64): I64,
    np.dtype(np.bool_): Bool,
    np.dtype(np.float32): F32, np.dtype(np.float64): F64,
}


def struct_of(cls: type, **field_descs: TypeDescriptor) -> StructDescriptor:
    """Build a :class:`StructDescriptor` from a dataclass.

    Field order follows the dataclass declaration order.  Descriptors are
    taken from ``field_descs`` overrides first, then from annotations that
    are already ``TypeDescriptor`` instances, then numpy dtypes.
    """
    if not dataclasses.is_dataclass(cls):
        raise TypeError(f"{cls!r} is not a dataclass")
    fields = []
    for f in dataclasses.fields(cls):
        if f.name in field_descs:
            d = field_descs[f.name]
        elif isinstance(f.type, TypeDescriptor):
            d = f.type
        else:
            try:
                d = _NUMPY_MAP[np.dtype(f.type)]
            except Exception as e:
                raise TypeError(
                    f"field {f.name!r} of {cls.__name__} needs an explicit "
                    f"TypeDescriptor (got annotation {f.type!r})"
                ) from e
        fields.append((f.name, d))
    return StructDescriptor(fields, name=cls.__name__, constructor=cls)


def descriptor_for(value: Any) -> TypeDescriptor:
    """Infer a descriptor from a numpy scalar/bool/float; Python ints need an
    explicit descriptor (their width is ambiguous)."""
    if isinstance(value, TypeDescriptor):
        return value
    if isinstance(value, (bool, np.bool_)):
        return Bool
    if isinstance(value, np.generic):
        return _NUMPY_MAP[value.dtype]
    raise TypeError(
        f"cannot infer a wire type for {type(value).__name__}; pass an explicit "
        "TypeDescriptor (e.g. U32) - Python ints have no fixed width"
    )
