"""Sharded encode step on the 8-device virtual CPU mesh: the per-device
streams must be byte-exact with the host kernels per block."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from repaq_tpu.codec import kernels_np as K  # noqa: E402
from repaq_tpu.parallel.mesh import (  # noqa: E402
    make_mesh,
    make_sharded_encode_step,
    replicate,
    shard_blocks,
)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_encode_matches_host():
    n_dev = 8
    reads, read_len = 32, 64
    rng = np.random.default_rng(1)
    seqs = rng.choice(
        np.frombuffer(b"GATCN", dtype=np.uint8), size=(n_dev * reads, read_len)
    )
    quals = rng.choice(
        np.frombuffer(b"FF:,:F#", dtype=np.uint8), size=(n_dev * reads, read_len)
    )
    xs = rng.integers(0, 40000, size=n_dev * reads).astype(np.int32)
    ys = rng.integers(0, 40000, size=n_dev * reads).astype(np.int32)
    bins = np.frombuffer(b"#,:", dtype=np.uint8)
    major = np.array([ord("F")], dtype=np.uint8)
    in_table = np.zeros(256, dtype=bool)
    in_table[bins] = True
    in_table[ord("F")] = True

    mesh = make_mesh(jax.devices()[:n_dev])
    step = make_sharded_encode_step(mesh)
    out, all_lens, qual_off = step(
        shard_blocks(mesh, seqs),
        shard_blocks(mesh, quals),
        shard_blocks(mesh, xs),
        shard_blocks(mesh, ys),
        replicate(mesh, bins),
        replicate(mesh, major),
        replicate(mesh, in_table),
    )
    packed = np.asarray(out["packed"])
    qual_streams = np.asarray(out["qual"])
    qual_lens = np.asarray(out["qual_len"])
    x_streams = np.asarray(out["x"])
    x_lens = np.asarray(out["x_len"])

    per_dev_packed = packed.reshape(n_dev, -1)
    per_dev_qual = qual_streams.reshape(n_dev, -1)
    per_dev_x = x_streams.reshape(n_dev, -1)
    for d in range(n_dev):
        s = seqs[d * reads : (d + 1) * reads].reshape(-1)
        q = quals[d * reads : (d + 1) * reads].reshape(-1)
        want_packed = K.pack_2bit(s)
        assert per_dev_packed[d][: want_packed.shape[0]].tobytes() == (
            want_packed.tobytes()
        )
        want_qual = K.encode_qual_by_col(q, bins, int(major[0]))
        got = per_dev_qual[d][: int(qual_lens[d])]
        assert got.tobytes() == want_qual.tobytes(), d
        want_x = K.encode_coords(xs[d * reads : (d + 1) * reads])
        assert per_dev_x[d][: int(x_lens[d])].tobytes() == want_x.tobytes(), d

    offs = np.asarray(qual_off)[0]
    assert np.array_equal(offs, np.cumsum(qual_lens) - qual_lens)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_graft_entry_dryrun():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    g.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs devices")
def test_device_roundtrip_block():
    """Full on-device encode -> decode roundtrip of one block."""
    import jax.numpy as jnp

    from repaq_tpu.parallel.mesh import device_decode_block, device_encode_block

    reads, read_len = 64, 52
    rng = np.random.default_rng(3)
    seqs = rng.choice(
        np.frombuffer(b"GATC", dtype=np.uint8), size=(reads, read_len)
    )
    # N bases with non-unique quals -> encode_n_pos style block
    nmask = rng.random((reads, read_len)) < 0.05
    seqs[nmask] = ord("N")
    quals = rng.choice(np.frombuffer(b"FF:,#", dtype=np.uint8), size=(reads, read_len))
    xs = rng.integers(0, 40000, size=reads).astype(np.int32)
    ys = rng.integers(0, 40000, size=reads).astype(np.int32)
    bins = np.frombuffer(b"#,:", dtype=np.uint8)
    in_table = np.zeros(256, dtype=bool)
    in_table[bins] = True
    in_table[ord("F")] = True

    enc = device_encode_block(
        jnp.asarray(seqs), jnp.asarray(quals), jnp.asarray(xs), jnp.asarray(ys),
        jnp.asarray(bins), jnp.uint8(ord("F")), jnp.asarray(in_table),
    )
    dseq, dqual = device_decode_block(
        enc["packed"], enc["qual"], enc["qual_len"], enc["npos"],
        enc["npos_len"], jnp.asarray(bins), jnp.uint8(ord("F")),
        reads, read_len,
    )
    assert np.asarray(dseq).tobytes() == seqs.tobytes()
    assert np.asarray(dqual).tobytes() == quals.tobytes()
