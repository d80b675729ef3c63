"""JAX device kernels for the .rfq token coders (encode side).

Everything here is jit-compatible, static-shape, and byte-exact with the
host kernels in repaq_tpu.codec.kernels_np (cross-checked in
tests/test_device.py). The sequential reference coders are reformulated as
data-parallel passes — cummax/cummin scans for run segmentation, prefix
sums for output offsets, and masked scatters for byte emission — which is
the shape that maps onto the TPU VPU; all scans are along the last axis.

Design notes for TPU:
- masks/byte-planes are uint8/int32, VPU-friendly; no MXU work exists in a
  codec, so throughput is HBM-bandwidth-bound.
- output buffers are padded to static shapes; true lengths are returned as
  scalars and the compact prefix is fetched with bucketed slices
  (repaq_tpu.ops.transfer) to keep device->host traffic proportional to the
  compressed size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _exclusive_cumsum(x):
    c = jnp.cumsum(x)
    return c - x, c[-1] if x.shape[0] else jnp.int32(0)


def _cummax(x):
    return jax.lax.cummax(x)


def _suffix_min(x):
    return jnp.flip(jax.lax.cummin(jnp.flip(x)))


def encode_positions_from_mask(mask: jnp.ndarray, out_size: int):
    """Gap/run stream (reference rfqcodec.cpp:625-710) for the positions
    where mask is True.

    mask: (n,) bool. Returns (out: (out_size,) uint8 zero-padded, length).
    out_size must be >= n/2 + 8 (worst case ~n/2 bytes: alternating
    single-byte gap tokens).
    """
    n = mask.shape[0]
    i = jnp.arange(n, dtype=jnp.int32)
    m = mask

    # previous match strictly before i
    pm_incl = _cummax(jnp.where(m, i, -1))
    pm_excl = jnp.concatenate([jnp.array([-1], dtype=jnp.int32), pm_incl[:-1]])
    delta = i - pm_excl

    adj = m & (delta == 1) & (i > 1)
    adj_prev = jnp.concatenate([jnp.array([False]), adj[:-1]])
    run_start = adj & ~adj_prev
    rs_idx = _cummax(jnp.where(run_start, i, -1))
    off_in_run = jnp.where(adj, i - rs_idx, 0)
    # end of each adj-run: first non-adj index at or after i
    nonadj_pos = jnp.where(~adj, i, n)
    end_idx = _suffix_min(nonadj_pos)
    # for adj positions, the run's end is the first non-adj AFTER the run
    # start; suffix-min at an adj position already gives it (its own
    # nonadj_pos is n)
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
    off, total = _exclusive_cumsum(counts)

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
    ).astype(jnp.uint8)
    b1 = jnp.where(g2, v & 0xFF, jnp.where(g4, (v >> 16) & 0xFF, 0)).astype(jnp.uint8)
    b2 = jnp.where(g4, (v >> 8) & 0xFF, 0).astype(jnp.uint8)
    b3 = jnp.where(g4, v & 0xFF, 0).astype(jnp.uint8)

    dump = out_size  # one-past-end dump slot
    out = jnp.zeros(out_size + 1, dtype=jnp.uint8)
    out = out.at[jnp.where(counts >= 1, off, dump)].set(b0, mode="drop")
    out = out.at[jnp.where(counts >= 2, off + 1, dump)].set(b1, mode="drop")
    out = out.at[jnp.where(counts >= 4, off + 2, dump)].set(b2, mode="drop")
    out = out.at[jnp.where(counts >= 4, off + 3, dump)].set(b3, mode="drop")
    return out[:out_size], total


def qualcol_encode_device(qual: jnp.ndarray, bins: jnp.ndarray, major: jnp.ndarray,
                          in_table: jnp.ndarray):
    """Full by-column quality encode (reference rfqcodec.cpp:712-765).

    qual: (n,) uint8; bins: (B,) uint8 (the normal-qual palette, static B);
    major: scalar uint8; in_table: (256,) bool (bins + major membership).

    Returns (out: (4B + n + 8,) uint8, total_len): u32le per-bin lengths,
    concatenated per-bin streams, then 5-byte escape records, already
    compacted on device.
    """
    n = qual.shape[0]
    nbins = bins.shape[0]
    stream_pad = n // 2 + 8

    def one_bin(q):
        return encode_positions_from_mask(qual == q, stream_pad)

    streams, lens = jax.vmap(one_bin)(bins)  # (B, pad), (B,)

    # escape records: positions not covered by any bin and not major
    esc_mask = ~in_table[qual]
    esc_cnt = jnp.sum(esc_mask.astype(jnp.int32))
    eoff, _ = _exclusive_cumsum(esc_mask.astype(jnp.int32))

    lens_total = jnp.sum(lens)
    out_size = 4 * nbins + n + 8
    out = jnp.zeros(out_size + 1, dtype=jnp.uint8)

    # u32le length table
    lens_u32 = lens.astype(jnp.uint32)
    hdr = jnp.stack(
        [
            lens_u32 & 0xFF,
            (lens_u32 >> 8) & 0xFF,
            (lens_u32 >> 16) & 0xFF,
            (lens_u32 >> 24) & 0xFF,
        ],
        axis=1,
    ).astype(jnp.uint8).reshape(-1)
    out = out.at[: 4 * nbins].set(hdr)

    # concatenated streams via one gather: output slot k in [0, lens_total)
    # belongs to bin b = searchsorted(cum_lens, k, right), local offset
    # k - cum_lens_excl[b]
    cum = jnp.cumsum(lens)
    cum_excl = cum - lens
    k = jnp.arange(n + 8, dtype=jnp.int32)
    b_of = jnp.searchsorted(cum, k, side="right").astype(jnp.int32)
    b_clamped = jnp.minimum(b_of, nbins - 1)
    local = k - cum_excl[b_clamped]
    vals = streams[b_clamped, jnp.clip(local, 0, stream_pad - 1)]
    valid = k < lens_total
    out = out.at[jnp.where(valid, 4 * nbins + k, out_size)].set(
        jnp.where(valid, vals, 0), mode="drop"
    )

    # escapes after the streams
    esc_base = 4 * nbins + lens_total
    pos = jnp.arange(n, dtype=jnp.uint32)
    targets = jnp.where(esc_mask, esc_base + 5 * eoff, out_size)
    out = out.at[targets].set(qual, mode="drop")
    out = out.at[jnp.where(esc_mask, targets + 1, out_size)].set(
        (pos & 0xFF).astype(jnp.uint8), mode="drop"
    )
    out = out.at[jnp.where(esc_mask, targets + 2, out_size)].set(
        ((pos >> 8) & 0xFF).astype(jnp.uint8), mode="drop"
    )
    out = out.at[jnp.where(esc_mask, targets + 3, out_size)].set(
        ((pos >> 16) & 0xFF).astype(jnp.uint8), mode="drop"
    )
    out = out.at[jnp.where(esc_mask, targets + 4, out_size)].set(
        ((pos >> 24) & 0xFF).astype(jnp.uint8), mode="drop"
    )
    total = 4 * nbins + lens_total + 5 * esc_cnt
    return out[:out_size], total


def coords_encode_device(values: jnp.ndarray, out_size: int):
    """Coordinate coder (reference rfqcodec.cpp:1262-1330) on device.

    values: (n,) int32. Returns (out (out_size,) u8, length). out_size must
    be >= 3n + 8.
    """
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

    k = off_in_rep + 1
    full32 = is_rep & (k % 32 == 0)
    is_last = is_rep & (k == rep_len) & (rep_len % 32 != 0)

    counts = (
        is_delta.astype(jnp.int32)
        + 2 * is_abs2.astype(jnp.int32)
        + 3 * is_abs3.astype(jnp.int32)
        + full32.astype(jnp.int32)
        + is_last.astype(jnp.int32)
    )
    off, total = _exclusive_cumsum(counts)

    rem = rep_len % 32
    vu = v.astype(jnp.uint32)
    # first byte at off: full32 run byte OR the token byte
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
    ).astype(jnp.uint8)
    second_b = jnp.where(
        is_abs2, vu & 0xFF, jnp.where(is_abs3, (vu >> 8) & 0xFF, 0)
    ).astype(jnp.uint8)
    third_b = jnp.where(is_abs3, vu & 0xFF, 0).astype(jnp.uint8)

    dump = out_size
    out = jnp.zeros(out_size + 1, dtype=jnp.uint8)
    out = out.at[jnp.where(counts >= 1, off, dump)].set(first_b, mode="drop")
    out = out.at[jnp.where(counts >= 2, off + 1, dump)].set(second_b, mode="drop")
    out = out.at[jnp.where(counts >= 3, off + 2, dump)].set(third_b, mode="drop")
    return out[:out_size], total


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
