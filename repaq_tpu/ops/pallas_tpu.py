"""Pallas TPU kernels for the .rfq encode/decode front end.

These are the byte-parallel hot ops of the codec (reference
rfqcodec.cpp:588-609 pack, :832-853 unpack, :712-765 bin classification)
expressed as single-pass VMEM kernels. The formulations are chosen for the
TPU's tiling rules (last dim = 128 lanes):

- the flat u8 byte stream is bitcast OUTSIDE the kernel to u32 lanes
  (4 bytes per lane), so every in-kernel op is a lane-aligned elementwise
  pass — no gathers, no reshapes across lanes;
- base->2bit code and qual->bin id are computed with comparison chains
  against the (tiny, static) palette instead of 256-entry LUT gathers,
  which serialize on the VPU;
- the fused front-end kernel (pack + N detection + bin classification)
  reads seq+qual once from HBM and writes all three products, replacing
  several XLA passes with one (HBM bandwidth is the bottleneck for these
  stages).

Every kernel has a jnp fallback with identical semantics; CPU runs use
interpret mode (tests) and the dispatchers in this module pick per backend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pallas TPU backend is optional at import time
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_G, _A, _T, _C, _N = 71, 65, 84, 67, 78
_LANES = 128
_TILE_ROWS = 256  # (256, 128) u32 block = 128 KiB in VMEM


@functools.lru_cache(maxsize=1)
def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.lru_cache(maxsize=1)
def _byte_shifts() -> tuple[int, int, int, int]:
    """Bit offsets of bytes 0..3 of a 4-byte group after a u8->u32 bitcast
    on this backend (probed once; little-endian on CPU and TPU)."""
    with jax.ensure_compile_time_eval():
        probe = jnp.array([1, 2, 3, 4], dtype=jnp.uint8).reshape(1, 4)
        v = int(jax.lax.bitcast_convert_type(probe, jnp.uint32)[0])
    if v == 0x04030201:
        return (0, 8, 16, 24)
    if v == 0x01020304:
        return (24, 16, 8, 0)
    raise RuntimeError("unrecognized u8->u32 bitcast order: %08x" % v)


def _to_u32_rows(flat_u8: jnp.ndarray, pad_byte: int) -> tuple[jnp.ndarray, int]:
    """(n,) u8 -> (rows, 128) u32 padded with pad_byte; returns rows."""
    n = flat_u8.shape[0]
    group = 4 * _LANES
    pad = (-n) % group
    if pad:
        flat_u8 = jnp.concatenate(
            [flat_u8, jnp.full(pad, pad_byte, dtype=jnp.uint8)]
        )
    u32 = jax.lax.bitcast_convert_type(flat_u8.reshape(-1, 4), jnp.uint32)
    return u32.reshape(-1, _LANES), (n + pad) // group


def _base_code(b: jnp.ndarray) -> jnp.ndarray:
    """u32 byte value -> 2-bit code (G/N=0 A=1 T=2 C=3), comparison chain
    (reference rfqcodec.cpp:588-609)."""
    return (
        jnp.where(b == _A, 1, 0)
        + jnp.where(b == _T, 2, 0)
        + jnp.where(b == _C, 3, 0)
    ).astype(jnp.uint32)


def _base_char(c: jnp.ndarray) -> jnp.ndarray:
    """2-bit code -> base char (GATC)."""
    return jnp.where(
        c == 0, _G, jnp.where(c == 1, _A, jnp.where(c == 2, _T, _C))
    ).astype(jnp.uint32)


def _pack_kernel(seq_ref, out_ref):
    x = seq_ref[:]
    s0, s1, s2, s3 = _byte_shifts()
    b0 = (x >> s0) & 0xFF
    b1 = (x >> s1) & 0xFF
    b2 = (x >> s2) & 0xFF
    b3 = (x >> s3) & 0xFF
    packed = (
        _base_code(b0)
        | (_base_code(b1) << 2)
        | (_base_code(b2) << 4)
        | (_base_code(b3) << 6)
    )
    out_ref[:] = packed.astype(jnp.uint8)


def pack_bases_pallas(seq: jnp.ndarray) -> jnp.ndarray:
    """(n,) u8 bases -> (ceil(n/4),) packed bytes, G-padded. Byte-exact
    with ops.device_streams.pack_2bit_device."""
    n = seq.shape[0]
    rows_in, rows = _to_u32_rows(seq, _G)
    grid = pl.cdiv(rows, _TILE_ROWS)
    out = pl.pallas_call(
        _pack_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((_TILE_ROWS, _LANES), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((_TILE_ROWS, _LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.uint8),
        interpret=_interpret(),
    )(rows_in)
    return out.reshape(-1)[: (n + 3) // 4]


def _unpack_kernel(packed_ref, out_ref):
    p = packed_ref[:].astype(jnp.uint32)
    s0, s1, s2, s3 = _byte_shifts()
    out_ref[:] = (
        (_base_char(p & 3) << s0)
        | (_base_char((p >> 2) & 3) << s1)
        | (_base_char((p >> 4) & 3) << s2)
        | (_base_char((p >> 6) & 3) << s3)
    )


def unpack_words_pallas(packed: jnp.ndarray) -> jnp.ndarray:
    """(m,) packed bytes -> (m,) u32 words, each holding 4 base chars in
    little-endian position order (word j = bases 4j..4j+3). The round-5
    decode path stays in word space end to end — the u32->u8 bitcast
    this avoids is a measurable cross-lane relayout (~2-3 ms at 12
    Mbase)."""
    m = packed.shape[0]
    pad = (-m) % _LANES
    if pad:
        packed = jnp.concatenate([packed, jnp.zeros(pad, dtype=jnp.uint8)])
    rows = packed.shape[0] // _LANES
    rows_in = packed.reshape(rows, _LANES)
    grid = pl.cdiv(rows, _TILE_ROWS)
    out = pl.pallas_call(
        _unpack_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((_TILE_ROWS, _LANES), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((_TILE_ROWS, _LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.uint32),
        interpret=_interpret(),
    )(rows_in)
    return out.reshape(-1)[:m]


def unpack_bases_pallas(packed: jnp.ndarray) -> jnp.ndarray:
    """(m,) packed bytes -> (4m,) base chars (GATC; N restored upstream)."""
    m = packed.shape[0]
    words = unpack_words_pallas(packed)
    chars = jax.lax.bitcast_convert_type(
        words[:, None], jnp.uint8
    ).reshape(-1)
    return chars[: 4 * m]


_FSM_K = 128  # serial bytes per lane-block in the FSM kernel


def _fsm_kernel(code_ref, map_ref, mask4_ref):
    """Token-grammar FSM over lane-blocks: each of the 128-aligned lanes
    walks its own contiguous K-byte stretch serially while the VPU runs
    all lanes in parallel. Tracks the walk from ALL FOUR possible entry
    states at once, so one pass yields both the block's composed map and,
    per byte, a 4-bit "token starts here" mask indexed by entry state —
    the cross-block entry state is resolved afterwards by a tiny XLA scan
    and a bit-select, not a second data pass.

    code byte layout: bits 0-2 token length (1/2/4) minus nothing (raw
    value), bit 3 = forced restart (per-bin stream boundary)."""
    nlanes = code_ref.shape[1]

    def init(v):
        return jnp.full((1, nlanes), v, dtype=jnp.int32)

    s0, s1, s2, s3 = init(0), init(1), init(2), init(3)
    # static unroll with 2-D (1, lanes) rows throughout: dynamic sublane
    # indices on i8 blocks fail Mosaic's alignment proof, and 1-D vectors
    # crash its layout pass; 128 static steps compile fine
    for i in range(_FSM_K):
        c = code_ref[i : i + 1, :].astype(jnp.int32)
        f = (c >> 3) & 1
        nl = (c & 7) - 1  # state after a token start here

        def step(s):
            start = (f == 1) | (s == 0)
            return jnp.where(start, nl, s - 1), start

        s0, st0 = step(s0)
        s1, st1 = step(s1)
        s2, st2 = step(s2)
        s3, st3 = step(s3)
        mask4_ref[i : i + 1, :] = (
            st0.astype(jnp.int32)
            | (st1.astype(jnp.int32) << 1)
            | (st2.astype(jnp.int32) << 2)
            | (st3.astype(jnp.int32) << 3)
        ).astype(jnp.uint8)  # shifts in i32: u8 shli has no Mosaic lowering
    map_ref[0:1, :] = s0
    map_ref[1:2, :] = s1
    map_ref[2:3, :] = s2
    map_ref[3:4, :] = s3


def token_fsm_pallas(code: jnp.ndarray):
    """(m,) u8 code stream (len 1/2/4 in bits 0-2, force-restart bit 3) ->
    (block_maps (nblk, 4) i32, mask4 (m,) u8). m must be a multiple of
    _FSM_K * 128. The caller composes entry states across blocks (tiny)
    and selects bit entry_state from mask4."""
    m = code.shape[0]
    assert m % (_FSM_K * _LANES) == 0, m
    nblk = m // _FSM_K
    # lane-major layout: row i holds byte i of every block
    code_t = code.reshape(nblk, _FSM_K).T  # (K, nblk)
    lane_tile = min(nblk, 4096)
    grid = pl.cdiv(nblk, lane_tile)
    maps, mask4 = pl.pallas_call(
        _fsm_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((_FSM_K, lane_tile), lambda i: (0, i))],
        out_specs=[
            pl.BlockSpec((4, lane_tile), lambda i: (0, i)),
            pl.BlockSpec((_FSM_K, lane_tile), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, nblk), jnp.int32),
            jax.ShapeDtypeStruct((_FSM_K, nblk), jnp.uint8),
        ],
        interpret=_interpret(),
    )(code_t)
    return maps.T, mask4


def _frontend_kernel(nbins, seq_ref, qual_ref, bins_ref, major_ref,
                     packed_ref, meta_ref):
    s0, s1, s2, s3 = _byte_shifts()
    shifts = (s0, s1, s2, s3)
    sq = seq_ref[:]
    qq = qual_ref[:]
    major = major_ref[0]

    # one combined meta byte per char: bid in bits 0-6 (nbins <= 63 so
    # ids 0..B+1 fit 7 bits), N-mask in bit 7 — halves the kernel's HBM
    # writes vs separate nmask/bid outputs; consumers unpack with fused
    # elementwise ops
    packed = jnp.zeros_like(sq)
    meta = jnp.zeros_like(sq)
    for k, sh in enumerate(shifts):
        b = (sq >> sh) & 0xFF
        packed = packed | (_base_code(b) << (2 * k))
        meta = meta | (jnp.where(b == _N, jnp.uint32(0x80), 0) << sh)
    packed_ref[:] = packed.astype(jnp.uint8)

    # qual byte -> bin ordinal: 0..B-1 table bins, B escape, B+1 major
    # (same ids as device_streams.qualcol_encode_device)
    for k, sh in enumerate(shifts):
        q = (qq >> sh) & 0xFF
        ib = jnp.full_like(q, nbins)  # escape by default
        for j in range(nbins):
            ib = jnp.where(q == bins_ref[j], jnp.uint32(j), ib)
        ib = jnp.where(q == major, jnp.uint32(nbins + 1), ib)
        meta = meta | (ib << sh)
    meta_ref[:] = meta


def encode_frontend_pallas(seq: jnp.ndarray, qual: jnp.ndarray,
                           bins: jnp.ndarray, major) -> tuple[
                               jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused encode front end: ONE pass over seq+qual producing
    (packed_bases (ceil(n/4),) u8, n_mask (n,) bool, qual bin ids (n,) i32).

    Feeds the grouping sort in qualcol_encode_device and the N-position
    coder; replaces several elementwise XLA passes over the two largest
    arrays of the encode step. bins must be the header palette minus the
    major qual (static length); major its own scalar. ids: 0..B-1 = palette
    stream, B = escape, B+1 = major (dropped).
    """
    n = seq.shape[0]
    nbins = int(bins.shape[0])
    seq_rows, rows = _to_u32_rows(seq, _G)
    qual_rows, qrows = _to_u32_rows(qual, 0)
    assert rows == qrows
    bins_pad = jnp.asarray(bins, dtype=jnp.uint32)
    major_arr = jnp.asarray(major, dtype=jnp.uint32).reshape(1)
    assert nbins <= 63, nbins  # bid ids 0..B+1 must fit the 7 meta bits
    grid = pl.cdiv(rows, _TILE_ROWS)
    kernel = functools.partial(_frontend_kernel, nbins)
    packed, meta = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_TILE_ROWS, _LANES), lambda i: (i, 0)),
            pl.BlockSpec((_TILE_ROWS, _LANES), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM)
            if _HAS_PLTPU and not _interpret()
            else pl.BlockSpec((nbins,), lambda i: (0,)),
            pl.BlockSpec(memory_space=pltpu.SMEM)
            if _HAS_PLTPU and not _interpret()
            else pl.BlockSpec((1,), lambda i: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((_TILE_ROWS, _LANES), lambda i: (i, 0)),
            pl.BlockSpec((_TILE_ROWS, _LANES), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, _LANES), jnp.uint8),
            jax.ShapeDtypeStruct((rows, _LANES), jnp.uint32),
        ],
        interpret=_interpret(),
    )(seq_rows, qual_rows, bins_pad, major_arr)
    packed_flat = packed.reshape(-1)[: (n + 3) // 4]
    meta_b = jax.lax.bitcast_convert_type(
        meta.reshape(-1)[:, None], jnp.uint8
    ).reshape(-1)[:n]
    # unpack ops fuse into the consumers (sort-key builds / reductions)
    return (
        packed_flat,
        meta_b >= 0x80,
        (meta_b & 0x7F).astype(jnp.int32),
    )


def encode_frontend_meta32(seq32: jnp.ndarray, qual32: jnp.ndarray,
                           bins: jnp.ndarray, major) -> tuple[
                               jnp.ndarray, jnp.ndarray]:
    """encode_frontend_pallas without any byte<->word relayout (round 4:
    the u8->u32 row shuffle alone measured ~8.5 ms at 12 Mbase — more
    than the kernel itself). Inputs are (n/4,) u32 LITTLE-ENDIAN words of
    the seq/qual bytes (a free numpy .view on the host, so the device
    never sees u8), padded to a multiple of 4*128 with 'G'/major bytes.
    Returns (packed (n/4,) u8, meta32 (n/4,) u32) — meta32 packs one meta
    byte per base in wire order (bid in bits 0-6 of each byte, N flag in
    bit 7); consumers build sort keys / masks per byte LANE of the word,
    which is order-free ahead of a global sort."""
    nbins = int(bins.shape[0])
    assert nbins <= 63, nbins
    # consumers map meta byte k of each word to position 4j+k via an 8k
    # shift — valid only under the little-endian byte order the host's
    # numpy '<u4' view uses (true on CPU and TPU; probed once)
    assert _byte_shifts() == (0, 8, 16, 24)
    nw = seq32.shape[0]
    assert nw % _LANES == 0 and nw == qual32.shape[0]
    rows = nw // _LANES
    seq_rows = seq32.reshape(rows, _LANES)
    qual_rows = qual32.reshape(rows, _LANES)
    bins_pad = jnp.asarray(bins, dtype=jnp.uint32)
    major_arr = jnp.asarray(major, dtype=jnp.uint32).reshape(1)
    grid = pl.cdiv(rows, _TILE_ROWS)
    kernel = functools.partial(_frontend_kernel, nbins)
    packed, meta = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_TILE_ROWS, _LANES), lambda i: (i, 0)),
            pl.BlockSpec((_TILE_ROWS, _LANES), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM)
            if _HAS_PLTPU and not _interpret()
            else pl.BlockSpec((nbins,), lambda i: (0,)),
            pl.BlockSpec(memory_space=pltpu.SMEM)
            if _HAS_PLTPU and not _interpret()
            else pl.BlockSpec((1,), lambda i: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((_TILE_ROWS, _LANES), lambda i: (i, 0)),
            pl.BlockSpec((_TILE_ROWS, _LANES), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, _LANES), jnp.uint8),
            jax.ShapeDtypeStruct((rows, _LANES), jnp.uint32),
        ],
        interpret=_interpret(),
    )(seq_rows, qual_rows, bins_pad, major_arr)
    return packed.reshape(-1), meta.reshape(-1)
