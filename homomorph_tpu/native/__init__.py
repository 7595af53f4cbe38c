"""ctypes bindings for the native host-side GF(2) engine.

Auto-builds ``libgf2native.so`` on first import if a compiler is available;
every entry point has a pure-numpy fallback, so the package works without
the native library (it is an accelerator + oracle, not a dependency).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libgf2native.so")

_lib = None


def _load() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_DIR, "gf2_native.cpp")
    stale = not os.path.exists(_SO) or (
        os.path.exists(src) and os.path.getmtime(_SO) < os.path.getmtime(src)
    )
    if stale:
        try:
            subprocess.run(
                ["make", "-C", _DIR, "-s", "-B"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            if not os.path.exists(_SO):
                return None  # no compiler and no prebuilt library
            # a prebuilt-but-stale library still serves the entry points
            # it has; callers hasattr-gate the newer ones
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64 = ctypes.c_int64

    lib.gf2_degree.argtypes = [u64p, i64]
    lib.gf2_degree.restype = i64
    lib.gf2_xor.argtypes = [u64p, i64, u64p, i64, u64p]
    lib.gf2_clmul.argtypes = [u64p, i64, u64p, i64, u64p]
    lib.gf2_rem.argtypes = [u64p, i64, u64p, i64, i64]
    lib.gf2_decrypt_batch.argtypes = [u64p, i64, i64, u64p, u8p]
    lib.gf2_encrypt_batch.argtypes = [u64p, i64, i64, u8p, u8p, i64, u64p]
    lib.gf2_reduction_rows.argtypes = [u64p, i64, i64, i64, u64p]
    if hasattr(lib, "gf2_decrypt_mask"):
        lib.gf2_decrypt_mask.argtypes = [u64p, i64, i64, i64, u64p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


# -- word-level helpers (uint32 limbs <-> uint64 words) ----------------------


def _to_words(limbs: np.ndarray) -> np.ndarray:
    limbs = np.ascontiguousarray(limbs, dtype=np.uint32)
    if limbs.shape[-1] % 2:
        pad = [(0, 0)] * (limbs.ndim - 1) + [(0, 1)]
        limbs = np.pad(limbs, pad)
    return limbs.view(np.uint64)


def _to_limbs(words: np.ndarray, n_limbs: int) -> np.ndarray:
    return words.view(np.uint32)[..., :n_limbs].copy()


def clmul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Carry-less multiply of two 1-D uint32 limb vectors (native or numpy)."""
    La, Lb = a.shape[-1], b.shape[-1]
    lib = _load()
    if lib is None:
        ai = int.from_bytes(np.ascontiguousarray(a, np.uint32).tobytes(), "little")
        bi = int.from_bytes(np.ascontiguousarray(b, np.uint32).tobytes(), "little")
        r = 0
        while ai:
            low = ai & -ai
            r ^= bi << (low.bit_length() - 1)
            ai ^= low
        nb = (La + Lb) * 4
        return np.frombuffer(r.to_bytes(nb, "little"), dtype=np.uint32).copy()
    aw, bw = _to_words(a), _to_words(b)
    out = np.zeros(aw.size + bw.size, dtype=np.uint64)
    lib.gf2_clmul(aw, aw.size, bw, bw.size, out)
    return _to_limbs(out, La + Lb)


def rem(c: np.ndarray, s: np.ndarray, s_degree: int) -> np.ndarray:
    """Remainder of c mod s (1-D uint32 limb vectors)."""
    Lc = c.shape[-1]
    lib = _load()
    cw = _to_words(c).copy()
    sw = _to_words(s)
    if lib is None:
        ci = int.from_bytes(np.ascontiguousarray(c, np.uint32).tobytes(), "little")
        si = int.from_bytes(np.ascontiguousarray(s, np.uint32).tobytes(), "little")
        while ci and ci.bit_length() - 1 >= s_degree:
            ci ^= si << (ci.bit_length() - 1 - s_degree)
        return np.frombuffer(ci.to_bytes(Lc * 4, "little"), dtype=np.uint32).copy()
    lib.gf2_rem(cw, cw.size, sw, sw.size, s_degree)
    return _to_limbs(cw, Lc)


def decrypt_mask(s: np.ndarray, s_degree: int, n_limbs: int) -> np.ndarray | None:
    """Host-side decrypt mask: ``w_i = (X^i mod S)(0)`` bit-packed into
    ``n_limbs`` uint32 limbs.

    The device recurrence (gf2/poly.py::decrypt_mask) is a 32*n_limbs-step
    sequential scan - minutes of device time (and a tunnel-worker killer)
    at u32-product sizes (~25M rows); this native loop does the same monic
    recurrence in a few seconds of host time with a single-row workspace,
    and only the ~n_limbs*4-byte mask ever moves to the device.  Returns
    ``None`` when the native library is unavailable (callers fall back to
    the device scan) - a stale ``libgf2native.so`` predating this entry
    point also falls back.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "gf2_decrypt_mask"):
        return None
    n_rows = n_limbs * 32
    sw = np.ascontiguousarray(_to_words(np.asarray(s, dtype=np.uint32)))
    out = np.zeros((n_rows + 63) // 64, dtype=np.uint64)
    lib.gf2_decrypt_mask(sw, sw.size, s_degree, n_rows, out)
    return _to_limbs(out, n_limbs)


def decrypt_batch(c: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Linear-map decrypt of [B, L] uint32 ciphertext limbs with mask w [L]."""
    B, L = c.shape
    lib = _load()
    cw = _to_words(c)
    ww = _to_words(w)
    if lib is None:
        acc = np.bitwise_xor.reduce(cw & ww, axis=-1)
        return (np.array([bin(int(x)).count("1") for x in acc]) & 1).astype(np.uint8)
    out = np.empty(B, dtype=np.uint8)
    lib.gf2_decrypt_batch(np.ascontiguousarray(cw), B, cw.shape[-1], ww, out)
    return out


def encrypt_batch(
    pk: np.ndarray, sel: np.ndarray, x: np.ndarray
) -> np.ndarray:
    """Subset-XOR encrypt: pk [tau, L] limbs, sel [B, tau] 0/1, x [B] bits."""
    tau, L = pk.shape
    B = sel.shape[0]
    lib = _load()
    pkw = _to_words(pk)
    if lib is None:
        out = np.zeros((B, pkw.shape[-1]), dtype=np.uint64)
        for b in range(B):
            for i in range(tau):
                if sel[b, i]:
                    out[b] ^= pkw[i]
            out[b, 0] ^= np.uint64(x[b] & 1)
        return _to_limbs(out, L)
    out = np.zeros((B, pkw.shape[-1]), dtype=np.uint64)
    lib.gf2_encrypt_batch(
        np.ascontiguousarray(pkw), tau, pkw.shape[-1],
        np.ascontiguousarray(sel, np.uint8), np.ascontiguousarray(x, np.uint8),
        B, out,
    )
    return _to_limbs(out, L)
