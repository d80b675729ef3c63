"""Pallas kernels vs the XLA device kernels and host oracle (interpret
mode on the CPU backend; the same kernels compile for TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from repaq_tpu.codec import kernels_np as K
from repaq_tpu.ops import device_streams as ds
from repaq_tpu.ops import pallas_tpu as pk


def _rand_seq(n, seed=0, n_frac=0.02):
    rng = np.random.default_rng(seed)
    seq = rng.choice(np.frombuffer(b"GATC", dtype=np.uint8), size=n)
    seq[rng.random(n) < n_frac] = ord("N")
    return seq


def test_pack_matches_xla_and_host():
    for n in (4, 512, 513, 4096, 100_000, 65536 * 4):
        seq = _rand_seq(n, seed=n)
        got = np.asarray(pk.pack_bases_pallas(seq))
        want = np.asarray(ds.pack_2bit_device(
            np.concatenate([seq, np.full((-n) % 4, ord("G"), np.uint8)])
        ))
        assert np.array_equal(got, want), n
        assert np.array_equal(got, K.pack_2bit(seq)), n


def test_unpack_roundtrip():
    for n in (4, 2048, 100_000):
        seq = _rand_seq(n, seed=n, n_frac=0.0)
        packed = pk.pack_bases_pallas(seq)
        got = np.asarray(pk.unpack_bases_pallas(packed))[:n]
        assert np.array_equal(got, seq), n


def test_unpack_matches_xla():
    rng = np.random.default_rng(7)
    packed = rng.integers(0, 256, size=10_001, dtype=np.uint8)
    got = np.asarray(pk.unpack_bases_pallas(packed))
    want = np.asarray(ds.unpack_2bit_device(packed))
    assert np.array_equal(got, want)


def test_frontend_fused():
    n = 300_000
    rng = np.random.default_rng(3)
    seq = _rand_seq(n, seed=3)
    qual = rng.choice(np.frombuffer(b"FFFF::,,#!", dtype=np.uint8), size=n)
    bins = np.frombuffer(b"#,:", dtype=np.uint8)  # palette minus major 'F'
    major = ord("F")

    packed, nmask, bid = pk.encode_frontend_pallas(seq, qual, bins, major)
    packed, nmask, bid = map(np.asarray, (packed, nmask, bid))

    assert np.array_equal(packed, K.pack_2bit(seq))
    assert np.array_equal(nmask, seq == ord("N"))

    # bin ids must match the LUT construction in qualcol_encode_device
    nbins = len(bins)
    in_table = np.zeros(256, dtype=bool)
    in_table[bins] = True
    in_table[major] = True
    lut = np.where(in_table, nbins + 1, nbins).astype(np.int32)
    lut[bins] = np.arange(nbins)
    lut[major] = nbins + 1
    assert np.array_equal(bid, lut[qual])


def test_frontend_nonmultiple_length():
    n = 777
    rng = np.random.default_rng(11)
    seq = _rand_seq(n, seed=5)
    qual = rng.choice(np.frombuffer(b"AB", dtype=np.uint8), size=n)
    bins = np.frombuffer(b"B", dtype=np.uint8)
    packed, nmask, bid = pk.encode_frontend_pallas(seq, qual, bins, ord("A"))
    assert np.asarray(packed).shape[0] == (n + 3) // 4
    assert np.array_equal(np.asarray(nmask), seq == ord("N"))
    want = np.where(qual == ord("B"), 0, 2)  # major -> nbins+1
    assert np.array_equal(np.asarray(bid), want)


def test_device_blocks_pallas_path():
    """device_encode_block/device_decode_block with use_pallas forced on
    (interpret mode on CPU) must match the XLA path bit-for-bit."""
    import jax.numpy as jnp

    from repaq_tpu.parallel.mesh import device_decode_block, device_encode_block

    rng = np.random.default_rng(0)
    B, L = 64, 64
    seq = rng.choice(np.frombuffer(b"GATCN", dtype=np.uint8), size=(B, L))
    qual = rng.choice(np.frombuffer(b"FF:,#", dtype=np.uint8), size=(B, L))
    xs = rng.integers(1000, 4000, size=B).astype(np.int32)
    ys = rng.integers(1000, 4000, size=B).astype(np.int32)
    bins = np.frombuffer(b"#,:", dtype=np.uint8)
    in_table = np.zeros(256, dtype=bool)
    in_table[bins] = True
    in_table[ord("F")] = True

    outs = {}
    for pallas in (False, True):
        o = device_encode_block(
            seq, qual, xs, ys, bins, jnp.uint8(ord("F")), in_table,
            use_pallas=pallas,
        )
        outs[pallas] = {k: np.asarray(v) for k, v in o.items()}
    for k in outs[False]:
        assert np.array_equal(outs[False][k], outs[True][k]), k

    o = outs[True]
    for pallas in (False, True):
        s2, q2 = device_decode_block(
            o["packed"], o["qual"], int(o["qual_len"]), o["npos"],
            int(o["npos_len"]), bins, jnp.uint8(ord("F")), B, L,
            use_pallas=pallas,
        )
        assert np.array_equal(np.asarray(s2), seq), pallas
        assert np.array_equal(np.asarray(q2), qual), pallas


def test_token_fsm_pallas_interpret():
    """Direct check of the Pallas lane-block FSM against the scan FSM
    (the auto dispatcher only uses pallas on a real TPU backend, so this
    exercises the kernel itself in interpret mode)."""
    import numpy as np

    from repaq_tpu.ops.device_streams import _apply_map4, token_start_mask
    from repaq_tpu.ops.pallas_tpu import _FSM_K, _LANES, token_fsm_pallas

    rng = np.random.default_rng(2)
    n = _FSM_K * _LANES  # one group
    lens = rng.choice([1, 1, 2, 4], size=n).astype(np.int32)
    force = rng.random(n) < 0.002
    code = (lens | (force.astype(np.int32) << 3)).astype(np.uint8)
    maps, mask4 = token_fsm_pallas(jnp.asarray(code))

    def compose(a, b):
        return jnp.stack(
            [_apply_map4(b, a[..., j]) for j in range(4)], axis=-1
        )

    prefix = jax.lax.associative_scan(compose, maps)
    entry = jnp.concatenate([jnp.zeros(1, jnp.int32), prefix[:-1, 0]])
    got = np.asarray(
        ((mask4 >> entry[None, :].astype(jnp.uint8)) & 1) == 1
    ).T.reshape(-1)[:n]
    want = np.asarray(
        token_start_mask(jnp.asarray(lens), jnp.asarray(force))
    )
    assert np.array_equal(got, want)
