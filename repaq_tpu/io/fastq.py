"""FASTQ input/output.

``FastqReader`` reproduces the reference's buffered 4-line reader semantics
(reference fastqreader.cpp): 1 MB refills, transparent gzip for ``.gz``
names, '\\r'/'\\r\\n' handling including its buffer-boundary quirks, and the
``has_no_line_break_at_end`` flag whose *timing* (it flips to true when the
final short block is fetched) decides which chunks carry the
no-trailing-newline flag.

The scalar ``read()`` path is the exact oracle; ``read_many()`` is the
production path, which extracts all complete records from the buffered
window with numpy and falls back to the scalar path for windows containing
'\\r' or empty lines (where the reference's quirky line splitting can
diverge from plain newline splitting).
"""

from __future__ import annotations

import gzip
import sys
import zlib
from typing import Optional

import numpy as np

from ..codec.oracle import FastqRead

FQ_BUF_SIZE = 1 << 20

_NL = ord("\n")
_CR = ord("\r")


class FastqReader:
    def __init__(self, filename: str):
        self.filename = filename
        self.zipped = filename.endswith(".gz")
        if self.zipped:
            self._file = gzip.open(filename, "rb")
        elif filename == "/dev/stdin" or filename == "-":
            self._file = sys.stdin.buffer
        else:
            self._file = open(filename, "rb")
        self._buf = b""
        self._buf_used = 0
        self._eof = False
        self._has_no_line_break_at_end = False
        self._prev_last_byte = _NL
        self._read_to_buf()

    def close(self) -> None:
        if self._file is not sys.stdin.buffer:
            self._file.close()

    def has_no_line_break_at_end(self) -> bool:
        return self._has_no_line_break_at_end

    def _read_to_buf(self) -> None:
        if self._buf:
            self._prev_last_byte = self._buf[-1]
        data = self._file.read(FQ_BUF_SIZE)
        # gzip/stdin streams may return short non-final reads; top up so a
        # short block really means EOF, matching fread/gzread on files.
        while data is not None and 0 < len(data) < FQ_BUF_SIZE:
            more = self._file.read(FQ_BUF_SIZE - len(data))
            if not more:
                break
            data += more
        self._buf = data or b""
        self._buf_used = 0
        if len(self._buf) < FQ_BUF_SIZE:
            self._eof = True
            # reference fastqreader.cpp:42-44; for a 0-byte refill the
            # reference reads one byte before the buffer (indeterminate); we
            # deterministically use the previous block's last byte.
            last = self._buf[-1] if self._buf else self._prev_last_byte
            if last != _NL:
                self._has_no_line_break_at_end = True

    def _get_line(self) -> bytes:
        buf = self._buf
        n = len(buf)
        start = self._buf_used
        end = start
        while end < n and buf[end] != _CR and buf[end] != _NL:
            end += 1

        if end < n or n < FQ_BUF_SIZE:
            line = buf[start:end]
            end += 1
            # \r\n handling with the reference's boundary condition
            # (fastqreader.cpp:115): the second byte is only consumed when it
            # is not the final byte of the block.
            if end < n - 1 and buf[end] == _NL:
                end += 1
            self._buf_used = end
            return line

        # line spans blocks
        parts = [buf[start:]]
        while True:
            self._read_to_buf()
            buf = self._buf
            n = len(buf)
            end = 0
            while end < n and buf[end] != _CR and buf[end] != _NL:
                end += 1
            if end < n or n < FQ_BUF_SIZE:
                parts.append(buf[:end])
                end += 1
                if end < n - 1 and buf[end] == _NL:
                    end += 1
                self._buf_used = end
                return b"".join(parts)
            parts.append(buf)

    def read(self) -> Optional[FastqRead]:
        """Scalar record reader (reference fastqreader.cpp:166-196)."""
        if self._buf_used >= len(self._buf) and self._eof:
            return None
        name = self._get_line()
        seq = self._get_line()
        strand = self._get_line()
        if not name or not seq or not strand:
            return None
        qual = self._get_line()
        if not qual:
            return None
        return FastqRead(name, seq, strand, qual)

    # ---- production block path ----
    def _window_is_plain(self) -> bool:
        """True when the remaining window has no '\\r' and no empty lines, so
        plain '\\n' splitting matches the reference line semantics."""
        window = self._buf[self._buf_used :]
        return b"\r" not in window and b"\n\n" not in window

    def read_many(self, max_records: int) -> list[FastqRead]:
        """Read up to max_records complete records, vectorized when safe."""
        out: list[FastqRead] = []
        while len(out) < max_records:
            window = self._buf[self._buf_used :]
            if b"\r" in window or b"\n\n" in window:
                r = self.read()
                if r is None:
                    return out
                out.append(r)
                continue
            arr = np.frombuffer(window, dtype=np.uint8)
            nl = np.flatnonzero(arr == _NL)
            complete = nl.size // 4
            if complete == 0 and self._eof:
                # possibly a final record without trailing newline
                r = self.read()
                if r is None:
                    return out
                out.append(r)
                continue
            if complete == 0:
                if len(self._buf) < FQ_BUF_SIZE:
                    return out
                self._refill_keep_tail()
                continue
            take = min(complete, max_records - len(out))
            starts = np.empty(take * 4, dtype=np.int64)
            starts[0] = 0
            starts[1:] = nl[: take * 4 - 1] + 1
            ends = nl[: take * 4]
            for k in range(take):
                i = 4 * k
                out.append(
                    FastqRead(
                        window[starts[i] : ends[i]],
                        window[starts[i + 1] : ends[i + 1]],
                        window[starts[i + 2] : ends[i + 2]],
                        window[starts[i + 3] : ends[i + 3]],
                    )
                )
            self._buf_used += int(ends[take * 4 - 1]) + 1
        return out

    def _refill_keep_tail(self) -> None:
        """Fetch another block, keeping the unconsumed tail (used only by the
        vectorized path; the scalar path refills inside _get_line)."""
        tail = self._buf[self._buf_used :]
        if self._buf:
            self._prev_last_byte = self._buf[-1]
        data = self._file.read(FQ_BUF_SIZE)
        while data is not None and 0 < len(data) < FQ_BUF_SIZE:
            more = self._file.read(FQ_BUF_SIZE - len(data))
            if not more:
                break
            data += more
        data = data or b""
        if len(data) < FQ_BUF_SIZE:
            self._eof = True
            last = data[-1] if data else (tail[-1] if tail else self._prev_last_byte)
            if last != _NL:
                self._has_no_line_break_at_end = True
        self._buf = tail + data
        self._buf_used = 0


class FastqReaderPair:
    """Reads R1/R2 from two files or one interleaved stream (reference
    fastqreader.cpp:262-299)."""

    def __init__(self, left: str, right: str = "", interleaved: bool = False):
        self.interleaved = interleaved
        self.left = FastqReader(left)
        self.right = None if interleaved else FastqReader(right)

    def read(self) -> Optional[tuple[FastqRead, FastqRead]]:
        l = self.left.read()
        r = self.left.read() if self.interleaved else self.right.read()
        if l is None or r is None:
            return None
        return (l, r)

    def close(self) -> None:
        self.left.close()
        if self.right is not None:
            self.right.close()


class Writer:
    """Plain or gzip output (reference writer.cpp; gz level 3, 1MB buffer)."""

    def __init__(self, filename: str, compression: int = 3):
        self.filename = filename
        self.zipped = filename.endswith(".gz")
        if self.zipped:
            self._file = open(filename, "wb")
            self._gz = zlib.compressobj(compression, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
        elif filename == "/dev/stdout" or filename == "-":
            self._file = sys.stdout.buffer
            self._gz = None
        else:
            self._file = open(filename, "wb")
            self._gz = None

    def write(self, data: bytes) -> None:
        if self._gz is not None:
            self._file.write(self._gz.compress(data))
        else:
            self._file.write(data)

    def close(self) -> None:
        if self._gz is not None:
            self._file.write(self._gz.flush(zlib.Z_FINISH))
        if self._file is not sys.stdout.buffer:
            self._file.close()
        else:
            self._file.flush()
