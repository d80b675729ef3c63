"""`.rfqz` container: the framework-native second entropy stage.

The reference reaches its best ratio by piping `.rfq` through the external
`xz` binary (reference main.cpp:134-177) — an inherently sequential LZMA
stage and a runtime dependency. `.rfqz` replaces that with the in-framework
interleaved-rANS coder (codec/rans_np.py host oracle, ops/rans_device.py
TPU kernels): the `.rfq` byte stream is cut into fixed-size blocks, each
block is entropy-coded as one section with a per-section model choice, and
both encode and decode are lane-parallel (TPU/SIMD-friendly) instead of
bit-serial.

Layout:
  magic "RFQZ" | u8 container version (1)
  sections until EOF, each one rans_np section record, but with a leading
  u8 mode: 0 = rANS order-0, 1 = rANS order-1, 255 = stored raw
  (mode 255: u8 255, u32 n, raw bytes)

Mode choice per section: exact entropy accounting from the byte/context
histograms (cheap) + serialized table cost, vs raw. The underlying stream
is the ordinary `.rfq` container, so `.rfqz` works for SE/PE/all paths.

RfqzWriter/RfqzReader are file-like (write/read/close) so the pipeline
drivers use them as out_stream/in_stream directly — the same shape as the
reference's xz pipe, minus the subprocess.
"""

from __future__ import annotations

import numpy as np

from ..codec import rans_np
from .header import RfqFormatError

MAGIC = b"RFQZ"
VERSION = 1
# 16MB sections: ~4 ratio points better than 4MB (table amortization +
# stabler order-1 statistics) while keeping per-section parallelism
DEFAULT_BLOCK = 16 << 20
MODE_ORDER0 = 0
MODE_ORDER1 = 1
MODE_STORED = 255


class RfqzFormatError(RfqFormatError):
    """Subclasses RfqFormatError so the CLI's error path covers it."""


def _entropy_bits_order0(counts: np.ndarray) -> float:
    total = counts.sum()
    if total == 0:
        return 0.0
    p = counts[counts > 0] / total
    return float(-(p * np.log2(p)).sum() * total)


def _table_cost_bytes(counts: np.ndarray) -> int:
    return 1 + 3 * int((counts > 0).sum())


def choose_mode(data: np.ndarray):
    """Cheap exact-entropy model selection for one section. Returns
    (mode, byte_histogram, raw_pair_histogram_or_None) so the encoder can
    reuse the scans."""
    n = data.shape[0]
    counts = np.bincount(data, minlength=256)
    est0 = _entropy_bits_order0(counts) / 8 + _table_cost_bytes(counts)
    if n < 4096:
        mode = MODE_ORDER0 if est0 < n * 0.98 else MODE_STORED
        return mode, counts, None
    # u16 pair keys, then one widening astype: int64 elementwise shifts and
    # u16 bincounts are both ~20x slower on this host
    pair = np.bincount(
        ((data[:-1].astype(np.uint16) << 8) | data[1:]).astype(np.int64),
        minlength=65536,
    )
    ctx = pair.reshape(256, 256)
    est1 = sum(
        _entropy_bits_order0(ctx[c]) for c in range(256) if ctx[c].any()
    ) / 8 + sum(
        _table_cost_bytes(ctx[c]) + 1 for c in range(256)
    )
    best = min(est0, est1)
    if best >= n * 0.98:
        return MODE_STORED, counts, pair
    return (MODE_ORDER0 if est0 <= est1 else MODE_ORDER1), counts, pair


def encode_block(data: bytes | np.ndarray, lanes: int = rans_np.DEFAULT_LANES,
                 encode_section=None) -> bytes:
    """One self-contained section record with mode selection.
    encode_section: override for the device kernel path (same signature as
    rans_np.encode_section)."""
    arr = (
        np.frombuffer(data, dtype=np.uint8)
        if isinstance(data, (bytes, bytearray, memoryview))
        else np.asarray(data, dtype=np.uint8)
    )
    mode, counts0, pair = choose_mode(arr)
    if mode == MODE_STORED:
        return bytes([MODE_STORED]) + len(arr).to_bytes(4, "little") + arr.tobytes()
    if encode_section is None:
        enc = rans_np.encode_section(
            arr, order=mode, lanes=lanes, counts0=counts0, pair_counts=pair
        )
    else:
        enc = encode_section(arr, order=mode, lanes=lanes)
    if len(enc) >= arr.shape[0] + 5:  # entropy estimate was optimistic
        return bytes([MODE_STORED]) + len(arr).to_bytes(4, "little") + arr.tobytes()
    return enc  # section record already leads with the order byte == mode


def decode_block(buf: memoryview, off: int, decode_section=None) -> tuple[bytes, int]:
    mode = buf[off]
    if mode == MODE_STORED:
        if len(buf) - off < 5:
            raise rans_np.RansTruncated("stored rfqz section truncated (header)")
        n = int.from_bytes(buf[off + 1 : off + 5], "little")
        if off + 5 + n > len(buf):
            raise rans_np.RansTruncated("stored rfqz section truncated")
        return bytes(buf[off + 5 : off + 5 + n]), off + 5 + n
    if mode not in (MODE_ORDER0, MODE_ORDER1):
        raise RfqzFormatError("bad rfqz section mode %d" % mode)
    return (decode_section or rans_np.decode_section)(buf, off)


class RfqzWriter:
    """File-like sink: buffers .rfq bytes, emits coded sections."""

    def __init__(self, path_or_stream, block_size: int = DEFAULT_BLOCK,
                 lanes: int = rans_np.DEFAULT_LANES, encode_section=None):
        if hasattr(path_or_stream, "write"):
            self._out = path_or_stream
            self._own = False
        else:
            self._out = open(path_or_stream, "wb")
            self._own = True
        self._block = block_size
        self._lanes = lanes
        self._buf = bytearray()
        self._enc = encode_section
        self._out.write(MAGIC + bytes([VERSION]))
        self.raw_bytes = 0
        self.coded_bytes = 5

    _SPLIT_MIN = 96 * 1024  # stream segments below this stay in the mix

    def write(self, data: bytes) -> int:
        self._buf += data
        self.raw_bytes += len(data)
        while len(self._buf) >= self._block:
            self._flush_one(self._block)
        return len(data)

    def write_segments(self, segments) -> None:
        """Write labeled wire-order segments (RfqChunk.to_segments),
        cutting sections at stream boundaries: sequence, quality, and
        coordinate streams have very different statistics, and giving each
        its own section model is worth several ratio points over mixing
        them. Byte stream (and therefore the decoded .rfq) is unchanged —
        only the section boundaries move."""
        for label, data in segments:
            if (
                label in ("seq", "qual", "coords", "tail")
                and len(data) >= self._SPLIT_MIN
            ):
                if self._buf:
                    self._flush_one(len(self._buf))
                self.raw_bytes += len(data)
                rec = encode_block(
                    data, lanes=self._lanes, encode_section=self._enc
                )
                self.coded_bytes += len(rec)
                self._out.write(rec)
            else:
                self.write(data)

    def _flush_one(self, size: int) -> None:
        chunk = bytes(self._buf[:size])
        del self._buf[:size]
        rec = encode_block(chunk, lanes=self._lanes, encode_section=self._enc)
        self.coded_bytes += len(rec)
        self._out.write(rec)

    def close(self) -> None:
        if self._buf:
            self._flush_one(len(self._buf))
        if self._own:
            self._out.close()
        else:
            self._out.flush()


class RfqzReader:
    """File-like source: decodes sections lazily; read(n) like a pipe.

    Streams: compressed bytes are fetched in 4MB slices and consumed
    sections are trimmed, so memory stays O(section) — matching the pipe
    semantics of the xz stage this replaces — instead of holding the whole
    archive plus its decoded image resident.
    """

    _FETCH = 4 << 20

    def __init__(self, path_or_stream, decode_section=None):
        if hasattr(path_or_stream, "read"):
            self._f = path_or_stream
            self._own = False
        else:
            self._f = open(path_or_stream, "rb")
            self._own = True
        self._dec = decode_section
        self._comp = bytearray()
        self._eof = False
        self._consumed = 0  # bytes trimmed off _comp (for error offsets)
        while len(self._comp) < 5 and self._fill():
            pass
        if len(self._comp) < 5 or self._comp[:4] != MAGIC:
            raise RfqzFormatError(
                "not an RFQZ file (bad magic); expected a .rfqz produced by "
                "this tool"
            )
        if self._comp[4] != VERSION:
            raise RfqzFormatError(
                "unsupported RFQZ container version %d" % self._comp[4]
            )
        del self._comp[:5]
        self._consumed = 5
        self._buf = bytearray()
        self._pos = 0

    def _fill(self) -> bool:
        if self._eof:
            return False
        data = self._f.read(self._FETCH)
        if not data:
            self._eof = True
            return False
        self._comp += data
        return True

    def _pull(self) -> bool:
        while True:
            if not self._comp and self._eof:
                return False
            # NOTE the dance around buffer exports: decode errors must not
            # keep views of self._comp alive (via the exception traceback)
            # or the bytearray cannot be grown by _fill; record the error,
            # let the except block close (python clears the traceback),
            # then release the memoryview and act.
            mv = memoryview(self._comp)
            err = None
            try:
                data, end = decode_block(mv, 0, self._dec)
            except (IndexError, ValueError, RfqzFormatError) as e:
                # RansTruncated / IndexError mean the section extends past
                # the buffered bytes — retry after fetching more. Anything
                # else (bad mode byte, corrupt tables, lane-table
                # violations) is genuine corruption: raise immediately
                # instead of buffering the rest of the archive.
                retryable = isinstance(e, (IndexError, rans_np.RansTruncated))
                err = (retryable, str(e))
            finally:
                mv.release()
            if err is not None:
                retryable, msg = err
                if retryable and self._fill():
                    continue
                if retryable and not self._comp:
                    return False  # clean end exactly at a section boundary
                raise RfqzFormatError(
                    "corrupt or truncated RFQZ section at offset %d: %s"
                    % (self._consumed, msg)
                )
            del self._comp[:end]
            self._consumed += end
            if self._pos:
                del self._buf[: self._pos]
                self._pos = 0
            self._buf += data
            return True

    def read(self, n: int = -1) -> bytes:
        if n < 0:
            while self._pull():
                pass
            out = bytes(self._buf[self._pos :])
            self._buf = bytearray()
            self._pos = 0
            return out
        while len(self._buf) - self._pos < n and self._pull():
            pass
        out = bytes(self._buf[self._pos : self._pos + n])
        self._pos += len(out)
        return out

    # RfqHeader.read / RfqChunk.read use stream.read(k) only
    def close(self) -> None:
        if self._own:
            self._f.close()
