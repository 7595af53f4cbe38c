"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import homomorph_tpu as hm
from homomorph_tpu.gf2 import poly as gf2
from homomorph_tpu.parallel import bulk, make_mesh


needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def keyed():
    ctx = hm.Context(hm.Parameters(32, 8, 1, 8), source=hm.ThreefrySource(31))
    ctx.generate_secret_key()
    ctx.generate_public_key()
    return ctx


def _roundtrip(cfg, ctx, B=16, n=8):
    params = ctx.parameters
    pk, sk = ctx.get_public_key(), ctx.get_secret_key()
    L = gf2.limbs_for(params.pk_degree)
    rng = np.random.default_rng(0)
    plain = rng.integers(0, 2, size=(B, n)).astype(np.uint32)
    sel = rng.integers(0, 2, size=(B, n, params.tau)).astype(np.uint8)
    limbs = bulk.sharded_encrypt_bits(
        cfg, jnp.asarray(sel), pk.bit_planes(), jnp.asarray(plain), L
    )
    w = sk.decrypt_mask(L)
    out = bulk.sharded_decrypt_bits(cfg, limbs, w)
    assert (np.asarray(out) == plain).all()
    return limbs


@needs_8
def test_data_parallel_roundtrip(keyed):
    cfg = make_mesh(8, 1)
    _roundtrip(cfg, keyed)


@needs_8
def test_tau_sharded_roundtrip(keyed):
    """tau-sharded pk: partial popcounts combined via psum - must be exact."""
    cfg = make_mesh(4, 2)
    _roundtrip(cfg, keyed)


@needs_8
def test_tau_only_sharding(keyed):
    cfg = make_mesh(1, 8)
    _roundtrip(cfg, keyed)


@needs_8
def test_sharded_matches_single_device(keyed):
    """Sharded encrypt must be bit-identical to the single-chip path."""
    ctx = keyed
    params = ctx.parameters
    pk = ctx.get_public_key()
    L = gf2.limbs_for(params.pk_degree)
    rng = np.random.default_rng(5)
    B, n = 16, 8
    plain = rng.integers(0, 2, size=(B, n)).astype(np.uint32)
    sel = rng.integers(0, 2, size=(B, n, params.tau)).astype(np.uint8)

    from homomorph_tpu.cipher import _encrypt_core

    single = _encrypt_core(jnp.asarray(sel), pk.bit_planes(), jnp.asarray(plain), L)
    for shape in [(8, 1), (4, 2), (2, 4)]:
        cfg = make_mesh(*shape)
        sharded = bulk.sharded_encrypt_bits(
            cfg, jnp.asarray(sel), pk.bit_planes(), jnp.asarray(plain), L
        )
        assert (np.asarray(single) == np.asarray(sharded)).all(), shape


@needs_8
def test_sharded_gate_xor(keyed):
    cfg = make_mesh(8, 1)
    limbs = _roundtrip(cfg, keyed)
    x = bulk.sharded_gate_xor(cfg, limbs, limbs)
    assert (np.asarray(x) == 0).all()  # c ^ c = trivial encryption of 0


@needs_8
def test_graft_dryrun():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
