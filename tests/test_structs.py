"""Struct / custom-operation tests (reference: examples/*.rs)."""

import dataclasses

import numpy as np
import pytest

import homomorph_tpu as hm
from homomorph_tpu.models import HomomorphicAddition, circuits


@dataclasses.dataclass
class Vec3:
    x: np.uint16
    y: np.uint16
    z: np.uint16


Vec3Desc = hm.struct_of(Vec3)


class Vec3Add(hm.HomomorphicOperation2):
    """Field-wise addition via split/recombine (examples/simple_struct.rs:30-58)."""

    MIN_D_OVER_DELTA = 21

    @staticmethod
    def unsafe_apply(a, b):
        out = []
        for off in (0, 16, 32):
            ax = hm.Ciphered.new_from_raw([a[i] for i in range(off, off + 16)], hm.U16)
            bx = hm.Ciphered.new_from_raw([b[i] for i in range(off, off + 16)], hm.U16)
            out.extend(circuits.add(ax, bx).bits())
        return hm.Ciphered.new_from_raw(out, a.desc)


@dataclasses.dataclass
class Unbalanced:
    x: np.uint8
    y: np.uint64
    z: np.uint8


UnbalancedDesc = hm.struct_of(Unbalanced)


class UnbalancedAdd(hm.HomomorphicOperation2):
    """Mixed-width field-wise addition (examples/unbalanced_struct.rs:26-63)."""

    MIN_D_OVER_DELTA = 21

    @staticmethod
    def unsafe_apply(a, b):
        widths = [8, 64, 8]
        out, off = [], 0
        descs = [hm.U8, hm.U64, hm.U8]
        for w, d in zip(widths, descs):
            ax = hm.Ciphered.new_from_raw([a[i] for i in range(off, off + w)], d)
            bx = hm.Ciphered.new_from_raw([b[i] for i in range(off, off + w)], d)
            out.extend(circuits.add(ax, bx).bits())
            off += w
        return hm.Ciphered.new_from_raw(out, a.desc)


def test_simple_struct():
    # examples/simple_struct.rs main: PARAMS (64, 32, 1, 32)
    ctx = hm.Context(hm.Parameters(64, 32, 1, 32), source=hm.ThreefrySource(8))
    ctx.generate_secret_key()
    ctx.generate_public_key()
    a = ctx.encrypt(Vec3(np.uint16(1), np.uint16(2), np.uint16(3)), Vec3Desc)
    b = ctx.encrypt(Vec3(np.uint16(4), np.uint16(5), np.uint16(6)), Vec3Desc)
    c = ctx.apply2(Vec3Add, a, b)
    d = ctx.decrypt(c)
    assert (d.x, d.y, d.z) == (5, 7, 9)


def test_unbalanced_struct():
    # examples/unbalanced_struct.rs main: PARAMS (128, 32, 1, 32)
    ctx = hm.Context(hm.Parameters(128, 32, 1, 32), source=hm.ThreefrySource(9))
    ctx.generate_secret_key()
    ctx.generate_public_key()
    a = ctx.encrypt(Unbalanced(np.uint8(1), np.uint64(2), np.uint8(3)), UnbalancedDesc)
    b = ctx.encrypt(Unbalanced(np.uint8(4), np.uint64(5), np.uint8(6)), UnbalancedDesc)
    assert len(a) == 80  # declaration-order flat bit lanes: 8 + 64 + 8
    c = ctx.apply2(UnbalancedAdd, a, b)
    d = ctx.decrypt(c)
    assert (d.x, d.y, d.z) == (5, 7, 9)


def test_field_bit_offsets():
    offs = UnbalancedDesc.field_bit_offsets()
    assert offs == {"x": (0, 8), "y": (8, 64), "z": (72, 8)}


def test_whole_struct_add_via_number_op():
    """Field widths equal -> the plain integer adder applied per field via
    apply_n-style composition also works on the flat layout boundaries."""
    ctx = hm.Context(hm.Parameters(64, 32, 1, 32), source=hm.ThreefrySource(10))
    ctx.generate_secret_key()
    ctx.generate_public_key()
    a = ctx.encrypt(Vec3(np.uint16(100), np.uint16(200), np.uint16(300)), Vec3Desc)
    b = ctx.encrypt(Vec3(np.uint16(1), np.uint16(2), np.uint16(3)), Vec3Desc)
    c = ctx.apply2(Vec3Add, a, b)
    d = ctx.decrypt(c)
    assert (d.x, d.y, d.z) == (101, 202, 303)


def test_nary_operation():
    """HomomorphicOperationN surface (src/operations.rs:204-213)."""

    class Sum3(hm.HomomorphicOperationN):
        MIN_D_OVER_DELTA = 42

        @staticmethod
        def unsafe_apply(args):
            acc = args[0]
            for nxt in args[1:]:
                acc = circuits.add(acc, nxt)
            return acc

    # successive adds compound the noise degree; mirror the reference's
    # successive-addition params (d=256, uint.rs:233-245)
    ctx = hm.Context(hm.Parameters(256, 16, 1, 16), source=hm.ThreefrySource(11))
    ctx.generate_secret_key()
    ctx.generate_public_key()
    cs = [ctx.encrypt(v, hm.U8) for v in (10, 20, 30)]
    out = ctx.apply_n(Sum3, cs)
    assert ctx.decrypt(out) == 60


def test_bit_lane_slicing():
    """c[a:b] mirrors the reference's Deref<[CipheredBit]> slice semantics."""
    import homomorph_tpu as hm
    from homomorph_tpu.cipher import Ciphered

    c = Ciphered.trivial(0b10110101, hm.U8)
    lanes = c[2:6]
    assert len(lanes) == 4
    rebuilt = Ciphered.new_from_raw(c[:], hm.U8)  # full slice
    import numpy as np

    np.testing.assert_array_equal(np.asarray(rebuilt.limbs), np.asarray(c.limbs))
