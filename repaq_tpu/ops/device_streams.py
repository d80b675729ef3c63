"""JAX device kernels for the .rfq token coders (encode side).

Everything here is jit-compatible, static-shape, and byte-exact with the
host kernels in repaq_tpu.codec.kernels_np (cross-checked in
tests/test_device.py). The sequential reference coders are reformulated as
data-parallel passes:

- run segmentation via cummax / suffix-cummin scans,
- per-element token byte counts + prefix sums for output offsets,
- byte emission as a GATHER over the output index space (for output slot k,
  binary-search the emitting element and byte lane). TPU scatters serialize
  per element; gathers vectorize on the VPU, so compaction is expressed as
  out[k] = planes[element(k), lane(k)] instead of out.at[off].set(...).

Output buffers are padded to static shapes; true lengths are returned as
scalars and compact prefixes are fetched with the int32-bitcast helper in
repaq_tpu.ops.transfer so device->host traffic stays proportional to the
compressed size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _exclusive_cumsum(x):
    c = jnp.cumsum(x)
    return c, (c[-1] if x.shape[0] else jnp.int32(0))  # inclusive, total


def _cummax(x):
    return jax.lax.cummax(x)


def _suffix_min(x):
    return jnp.flip(jax.lax.cummin(jnp.flip(x)))


def _emit_sort(planes: jnp.ndarray, counts: jnp.ndarray, out_size: int,
               offsets: jnp.ndarray | None = None):
    """Sort-based stream compaction — the TPU-native shape for
    variable-width token emission. Scatters and binary-search gathers
    serialize on the VPU (~0.1 Gelem/s measured) while bitonic sort runs at
    ~0.4 Gelem/s, so each candidate byte is packed as (dest_offset << 8 |
    byte) with invalid lanes pushed to +inf, one jnp.sort lays the stream
    out, and the low bytes of the prefix are the stream.

    planes: (n, W) uint8 candidate bytes; counts: (n,) int32 emitted bytes
    per element (0..W); offsets: optional precomputed per-element dest
    offsets (exclusive prefix sum of counts when None). dest offsets must
    stay < 2^23 (out_size caps well below).
    Returns (out: (out_size,) uint8 zero-padded, total_len).
    """
    n, w = planes.shape
    if offsets is None:
        cum, total = _exclusive_cumsum(counts)
        offsets = cum - counts
    else:
        total = (
            offsets[-1] + counts[-1] if n else jnp.int32(0)
        )
    lanes = jnp.arange(w, dtype=jnp.int32)[None, :]
    valid = lanes < counts[:, None]
    keys = jnp.where(
        valid,
        ((offsets[:, None] + lanes) << 8) | planes.astype(jnp.int32),
        jnp.int32(2**31 - 1),
    ).reshape(-1)
    srt = jnp.sort(keys)
    take = min(out_size, srt.shape[0])
    out = jnp.zeros(out_size, dtype=jnp.uint8)
    out = out.at[:take].set((srt[:take] & 0xFF).astype(jnp.uint8))
    k = jnp.arange(out_size, dtype=jnp.int32)
    return jnp.where(k < total, out, 0).astype(jnp.uint8), total


_emit_gather = _emit_sort  # compaction strategy alias


def _positions_planes(mask: jnp.ndarray):
    """Token classification for the gap/run position coder (reference
    rfqcodec.cpp:625-710). Returns (planes (n,4) u8, counts (n,) i32)."""
    n = mask.shape[0]
    i = jnp.arange(n, dtype=jnp.int32)
    m = mask

    pm_incl = _cummax(jnp.where(m, i, -1))
    pm_excl = jnp.concatenate([jnp.array([-1], dtype=jnp.int32), pm_incl[:-1]])
    delta = i - pm_excl

    adj = m & (delta == 1) & (i > 1)
    adj_prev = jnp.concatenate([jnp.array([False]), adj[:-1]])
    run_start = adj & ~adj_prev
    rs_idx = _cummax(jnp.where(run_start, i, -1))
    off_in_run = jnp.where(adj, i - rs_idx, 0)
    nonadj_pos = jnp.where(~adj, i, n)
    end_idx = _suffix_min(nonadj_pos)
    run_len = jnp.where(adj, end_idx - rs_idx, 0)

    emits_run = adj & (off_in_run % 32 == 0)
    covered = jnp.minimum(32, run_len - off_in_run)

    gap = m & ~adj
    g1 = gap & (delta <= 128)
    g2 = gap & (delta > 128) & (delta <= (1 << 14))
    g4 = gap & (delta > (1 << 14))

    counts = (
        g1.astype(jnp.int32)
        + 2 * g2.astype(jnp.int32)
        + 4 * g4.astype(jnp.int32)
        + emits_run.astype(jnp.int32)
    )
    v = (delta - 1).astype(jnp.uint32)
    b0 = jnp.where(
        g1,
        v,
        jnp.where(
            g2,
            (v >> 8) | 0x80,
            jnp.where(
                g4,
                (v >> 24) | 0xE0,
                jnp.where(emits_run, (covered - 1).astype(jnp.uint32) | 0xC0, 0),
            ),
        ),
    )
    b1 = jnp.where(g2, v & 0xFF, jnp.where(g4, (v >> 16) & 0xFF, 0))
    b2 = jnp.where(g4, (v >> 8) & 0xFF, 0)
    b3 = jnp.where(g4, v & 0xFF, 0)
    planes = jnp.stack([b0, b1, b2, b3], axis=1).astype(jnp.uint8)
    return planes, counts


def encode_positions_from_mask(mask: jnp.ndarray, out_size: int):
    """Gap/run stream for the True positions of mask; (out, length)."""
    planes, counts = _positions_planes(mask)
    return _emit_gather(planes, counts, out_size)


def qualcol_encode_device(qual: jnp.ndarray, bins: jnp.ndarray, major: jnp.ndarray,
                          in_table: jnp.ndarray):
    """Full by-column quality encode (reference rfqcodec.cpp:712-765):
    u32le per-bin lengths, concatenated per-bin streams, 5-byte escape
    records — compacted on device in one gather pass.

    qual: (n,) uint8; bins: (B,) uint8 (static B); in_table: (256,) bool.
    Returns (out: (4B + n + 8,) uint8, total_len).
    """
    n = qual.shape[0]
    nbins = bins.shape[0]
    i = jnp.arange(n, dtype=jnp.int32)

    # LUT: qual byte -> bin ordinal; escapes get pseudo-bin B (they follow
    # the streams in wire order), the major qual gets B+1 (dropped)
    bin_idx = jnp.where(
        in_table, jnp.int32(nbins + 1), jnp.int32(nbins)
    )
    bin_idx = bin_idx.at[bins].set(jnp.arange(nbins, dtype=jnp.int32))
    bid = bin_idx[qual]  # (n,): 0..B-1 stream, B escape, B+1 major (drop)

    # ONE counting sort groups positions by bin (stable: key = bid*n + i);
    # major-qual positions sort to the tail and are masked off.
    keys0 = bid * n + i
    grouped = jnp.sort(keys0)
    g_bid = grouped // n
    g_pos = grouped - g_bid * n
    is_stream = g_bid < nbins
    is_esc = g_bid == nbins

    # segmented token classification on the grouped positions
    prev_pos = jnp.concatenate([jnp.array([-1], dtype=jnp.int32), g_pos[:-1]])
    seg_start = jnp.concatenate(
        [jnp.array([True]), g_bid[1:] != g_bid[:-1]]
    )
    delta = jnp.where(seg_start, g_pos + 1, g_pos - prev_pos)
    adj = is_stream & (delta == 1) & (g_pos > 1)
    adj_prev = jnp.concatenate([jnp.array([False]), adj[:-1]])
    run_start = adj & ~adj_prev
    rs_idx = _cummax(jnp.where(run_start, i, -1))
    off_in_run = jnp.where(adj, i - rs_idx, 0)
    nonadj_pos = jnp.where(~adj, i, n)
    end_idx = _suffix_min(nonadj_pos)
    run_len = jnp.where(adj, end_idx - rs_idx, 0)
    emits_run = adj & (off_in_run % 32 == 0)
    covered = jnp.minimum(32, run_len - off_in_run)

    gap = is_stream & ~adj
    g1 = gap & (delta <= 128)
    g2 = gap & (delta > 128) & (delta <= (1 << 14))
    g4 = gap & (delta > (1 << 14))

    counts = (
        g1.astype(jnp.int32)
        + 2 * g2.astype(jnp.int32)
        + 4 * g4.astype(jnp.int32)
        + emits_run.astype(jnp.int32)
        + 5 * is_esc.astype(jnp.int32)
    )
    v = (delta - 1).astype(jnp.uint32)
    pq = g_pos.astype(jnp.uint32)
    esc_qual = qual[jnp.clip(g_pos, 0, n - 1)].astype(jnp.uint32)
    b0 = jnp.where(
        g1,
        v,
        jnp.where(
            g2,
            (v >> 8) | 0x80,
            jnp.where(
                g4,
                (v >> 24) | 0xE0,
                jnp.where(
                    emits_run,
                    (covered - 1).astype(jnp.uint32) | 0xC0,
                    jnp.where(is_esc, esc_qual, 0),
                ),
            ),
        ),
    )
    b1 = jnp.where(
        g2, v & 0xFF,
        jnp.where(g4, (v >> 16) & 0xFF, jnp.where(is_esc, pq & 0xFF, 0)),
    )
    b2 = jnp.where(
        g4, (v >> 8) & 0xFF, jnp.where(is_esc, (pq >> 8) & 0xFF, 0)
    )
    b3 = jnp.where(g4, v & 0xFF, jnp.where(is_esc, (pq >> 16) & 0xFF, 0))
    b4 = jnp.where(is_esc, (pq >> 24) & 0xFF, 0)
    planes = jnp.stack([b0, b1, b2, b3, b4], axis=1).astype(jnp.uint8)

    # destinations: bins (then escapes) are grouped contiguously in wire
    # order, so the global exclusive prefix sum of counts IS the stream
    # offset after the 4B length table
    cum = jnp.cumsum(counts)
    dest = 4 * nbins + (cum - counts)
    total = 4 * nbins + (cum[-1] if n else 0)

    # per-bin lengths for the u32le table
    lens = jax.ops.segment_sum(
        jnp.where(is_stream, counts, 0), jnp.clip(g_bid, 0, nbins),
        num_segments=nbins + 1,
    )[:nbins]
    lens_u32 = lens.astype(jnp.uint32)
    hdr = jnp.stack(
        [lens_u32 & 0xFF, (lens_u32 >> 8) & 0xFF,
         (lens_u32 >> 16) & 0xFF, (lens_u32 >> 24) & 0xFF],
        axis=1,
    ).astype(jnp.int32).reshape(-1)
    hdr_keys = (jnp.arange(4 * nbins, dtype=jnp.int32) << 8) | hdr

    lanes = jnp.arange(5, dtype=jnp.int32)[None, :]
    valid = lanes < counts[:, None]
    tok_keys = jnp.where(
        valid,
        ((dest[:, None] + lanes) << 8) | planes.astype(jnp.int32),
        jnp.int32(2**31 - 1),
    ).reshape(-1)

    out_size = 4 * nbins + n + 8
    srt = jnp.sort(jnp.concatenate([hdr_keys, tok_keys]))
    take = min(out_size, srt.shape[0])
    out = jnp.zeros(out_size, dtype=jnp.uint8)
    out = out.at[:take].set((srt[:take] & 0xFF).astype(jnp.uint8))
    k = jnp.arange(out_size, dtype=jnp.int32)
    return jnp.where(k < total, out, 0).astype(jnp.uint8), total


def coords_encode_device(values: jnp.ndarray, out_size: int):
    """Coordinate coder (reference rfqcodec.cpp:1262-1330) on device.
    values: (n,) int32; out_size >= 3n + 8. Returns (out, length)."""
    n = values.shape[0]
    v = values.astype(jnp.int32)
    i = jnp.arange(n, dtype=jnp.int32)
    prev = jnp.concatenate([jnp.array([1000], dtype=jnp.int32), v[:-1]])
    diff = v - prev
    is_rep = diff == 0
    is_delta = (diff > 0) & (diff <= 64)
    is_abs2 = ~is_rep & ~is_delta & (v <= 32767)
    is_abs3 = ~is_rep & ~is_delta & (v > 32767)

    rep_prev = jnp.concatenate([jnp.array([False]), is_rep[:-1]])
    rep_start = is_rep & ~rep_prev
    rs_idx = _cummax(jnp.where(rep_start, i, -1))
    off_in_rep = jnp.where(is_rep, i - rs_idx, 0)
    nonrep_pos = jnp.where(~is_rep, i, n)
    end_idx = _suffix_min(nonrep_pos)
    rep_len = jnp.where(is_rep, end_idx - rs_idx, 0)

    kk = off_in_rep + 1
    full32 = is_rep & (kk % 32 == 0)
    is_last = is_rep & (kk == rep_len) & (rep_len % 32 != 0)

    counts = (
        is_delta.astype(jnp.int32)
        + 2 * is_abs2.astype(jnp.int32)
        + 3 * is_abs3.astype(jnp.int32)
        + full32.astype(jnp.int32)
        + is_last.astype(jnp.int32)
    )
    rem = rep_len % 32
    vu = v.astype(jnp.uint32)
    first_b = jnp.where(
        full32,
        jnp.uint32(0xC0 | 31),
        jnp.where(
            is_last,
            (rem - 1).astype(jnp.uint32) | 0xC0,
            jnp.where(
                is_delta,
                (diff - 1).astype(jnp.uint32) | 0x80,
                jnp.where(is_abs2, vu >> 8, jnp.where(is_abs3, (vu >> 16) | 0xE0, 0)),
            ),
        ),
    )
    second_b = jnp.where(is_abs2, vu & 0xFF, jnp.where(is_abs3, (vu >> 8) & 0xFF, 0))
    third_b = jnp.where(is_abs3, vu & 0xFF, 0)
    planes = jnp.stack([first_b, second_b, third_b], axis=1).astype(jnp.uint8)
    return _emit_gather(planes, counts, out_size)


def pack_2bit_device(seq: jnp.ndarray) -> jnp.ndarray:
    """(n,) uint8 bases -> (n/4,) packed (n must be a multiple of 4; pad
    with 'G' upstream). G=0 A=1 T=2 C=3, low bits first."""
    table = np.zeros(256, dtype=np.uint8)
    table[ord("A")] = 1
    table[ord("T")] = 2
    table[ord("C")] = 3
    vals = jnp.asarray(table)[seq]
    v = vals.reshape(-1, 4)
    return (v[:, 0] | (v[:, 1] << 2) | (v[:, 2] << 4) | (v[:, 3] << 6)).astype(
        jnp.uint8
    )


def unpack_2bit_device(buf: jnp.ndarray) -> jnp.ndarray:
    """(m,) packed -> (4m,) base chars."""
    base = jnp.asarray(np.frombuffer(b"GATC", dtype=np.uint8))
    b = buf[:, None]
    shifts = jnp.array([0, 2, 4, 6], dtype=jnp.uint8)
    codes = (b >> shifts) & 3
    return base[codes.reshape(-1)]


def revcomp_device(seqs: jnp.ndarray) -> jnp.ndarray:
    """(R, L) uint8 -> reverse complement along axis 1 (non-ACGT -> N)."""
    comp = np.full(256, ord("N"), dtype=np.uint8)
    for a, b in zip(b"AaTtCcGg", b"TTAAGGCC"):
        comp[a] = b
    return jnp.asarray(comp)[jnp.flip(seqs, axis=1)]


def qual_histogram_device(qual: jnp.ndarray) -> jnp.ndarray:
    """(n,) uint8 -> (128,) int32 counts (header quality table input)."""
    return jnp.bincount(qual.astype(jnp.int32), length=128)
