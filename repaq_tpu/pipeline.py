"""Compress / decompress / compare drivers.

Mirrors the reference pipeline (reference repaq.cpp): chunk accumulation
until the base budget is reached, header inferred from the first chunk only,
per-chunk trailing-newline flags with one-chunk lookahead on decode, verify
modes, and the compare JSON verdict.

One deliberate divergence: the reference's PE decompress drops the lookahead
chunk when a no-line-break flag appears on a non-final chunk (reference
repaq.cpp:379-411 leaks it), losing reads; we carry the lookahead chunk into
the next iteration like the single-end path does (repaq.cpp:301-331).
"""

from __future__ import annotations

import json
import sys
from dataclasses import dataclass, field
from typing import Callable, Iterable, Optional

from .codec import oracle
from .codec.oracle import FastqRead
from .constants import (
    BIT_HAS_NO_LINE_BREAK_AT_END,
    BIT_HAS_NO_LINE_BREAK_AT_END_R2,
    BIT_PAIRED_END,
)
from .format.chunk import RfqChunk
from .format.header import RfqFormatError, RfqHeader
from .io.fastq import FastqReader, FastqReaderPair, Writer


@dataclass
class EngineConfig:
    """Codec engine selection: the scalar oracle or the vectorized path."""

    make_header_se: Callable = oracle.make_header_se
    make_header_pe: Callable = oracle.make_header_pe
    encode_chunk: Callable = oracle.encode_chunk
    encode_chunk_pe: Callable = oracle.encode_chunk_pe
    decode_chunk: Callable = oracle.decode_chunk


def get_engine(name: str = "auto") -> EngineConfig:
    if name in ("auto", "vectorized"):
        from .codec import vectorized
        from .codec.blocks import ReadBlock

        def _mk_se(reads):
            return vectorized.make_header_se(ReadBlock.from_reads(reads))

        def _mk_pe(pairs):
            reads = []
            for r1, r2 in pairs:
                reads.append(r1)
                reads.append(r2)
            return vectorized.make_header_pe(ReadBlock.from_reads(reads))

        return EngineConfig(
            make_header_se=_mk_se,
            make_header_pe=_mk_pe,
            encode_chunk=vectorized.encode_chunk_reads,
            encode_chunk_pe=vectorized.encode_chunk_pe_reads,
            decode_chunk=vectorized.decode_chunk_reads,
        )
    return EngineConfig()


def _verify_chunk(
    header: RfqHeader,
    chunk_bytes: bytes,
    originals: list[FastqRead],
    engine: EngineConfig,
    header_bytes: bytes,
) -> bool:
    """Re-parse and fully decode an encoded chunk, comparing field-by-field
    against the source reads (reference repaq.cpp:430-528)."""
    import io as _io

    header4check = RfqHeader.read(_io.BytesIO(header_bytes))
    header4check.support_interleaved = header.support_interleaved
    chunk = RfqChunk.read(_io.BytesIO(chunk_bytes), header4check)
    decoded = engine.decode_chunk(header4check, chunk)
    if len(decoded) != len(originals):
        raise RfqFormatError(
            "encoding error in chunk, the output will be wrong, quit now!"
        )
    for got, want in zip(decoded, originals):
        for attr in ("name", "seq", "strand", "qual"):
            g = getattr(got, attr)
            w = getattr(want, attr)
            if g != w:
                print(
                    "integrity check failure \nexpected: \n%s\ngot:\n%s"
                    % (w.decode("latin1"), g.decode("latin1")),
                    file=sys.stderr,
                )
                return False
    return True


def compress_se(
    in1: str,
    out1: str,
    chunk_size: int = 1_000_000,
    verify: bool = False,
    fast_verify: bool = False,
    engine: Optional[EngineConfig] = None,
    out_stream=None,
) -> None:
    engine = engine or get_engine()
    reader = FastqReader(in1)
    out = out_stream or (sys.stdout.buffer if out1 in ("/dev/stdout", "-") else open(out1, "wb"))
    header: Optional[RfqHeader] = None
    header_bytes = b""
    passnum = 0

    def flush(reads: list[FastqRead]) -> None:
        nonlocal header, header_bytes, passnum
        if header is None:
            header = engine.make_header_se(reads)
            if header is None:
                raise RfqFormatError(
                    "failed to encode, please confirm the input FASTQ file is "
                    "valid and not empty"
                )
            header_bytes = header.to_bytes()
            out.write(header_bytes)
            import io as _io

            if not header.identical_with(RfqHeader.read(_io.BytesIO(header_bytes))):
                raise RfqFormatError(
                    "encoding error in header, the output will be wrong, quit now!"
                )
        chunk = engine.encode_chunk(header, reads, False)
        if chunk is not None:
            if reader.has_no_line_break_at_end():
                chunk.flags |= BIT_HAS_NO_LINE_BREAK_AT_END
            data = chunk.to_bytes()
            out.write(data)
            if verify or (fast_verify and passnum % 10 == 0):
                _verify_chunk(header, data, reads, engine, header_bytes)
            passnum += 1

    reads: list[FastqRead] = []
    total_bases = 0
    while True:
        batch = reader.read_many(4096)
        if not batch:
            break
        for r in batch:
            reads.append(r)
            total_bases += len(r.seq)
            if total_bases >= chunk_size:
                flush(reads)
                reads = []
                total_bases = 0
    if reads:
        flush(reads)
    reader.close()
    if out_stream is None and out is not sys.stdout.buffer:
        out.close()
    elif out is sys.stdout.buffer:
        out.flush()


def compress_pe(
    in1: str,
    in2: str,
    out1: str,
    chunk_size: int = 1_000_000,
    interleaved: bool = False,
    verify: bool = False,
    fast_verify: bool = False,
    engine: Optional[EngineConfig] = None,
    out_stream=None,
) -> None:
    engine = engine or get_engine()
    reader = FastqReaderPair(in1, in2, interleaved)
    out = out_stream or (sys.stdout.buffer if out1 in ("/dev/stdout", "-") else open(out1, "wb"))
    header: Optional[RfqHeader] = None
    header_bytes = b""
    passnum = 0

    def flush(pairs: list[tuple[FastqRead, FastqRead]]) -> None:
        nonlocal header, header_bytes, passnum
        if header is None:
            header = engine.make_header_pe(pairs)
            if header is None:
                raise RfqFormatError(
                    "failed to encode, please confirm the input FASTQ file is "
                    "valid and not empty"
                )
            header_bytes = header.to_bytes()
            out.write(header_bytes)
        chunk = engine.encode_chunk_pe(header, pairs)
        if chunk is not None:
            no_break_r1 = reader.left.has_no_line_break_at_end()
            if not interleaved:
                no_break_r2 = reader.right.has_no_line_break_at_end()
            else:
                no_break_r2 = no_break_r1
            if no_break_r1:
                chunk.flags |= BIT_HAS_NO_LINE_BREAK_AT_END
            if no_break_r2:
                chunk.flags |= BIT_HAS_NO_LINE_BREAK_AT_END_R2
            data = chunk.to_bytes()
            out.write(data)
            if verify or (fast_verify and passnum % 10 == 0):
                originals: list[FastqRead] = []
                for r1, r2 in pairs:
                    originals.append(r1)
                    originals.append(r2)
                _verify_chunk(header, data, originals, engine, header_bytes)
            passnum += 1

    pairs: list[tuple[FastqRead, FastqRead]] = []
    total_bases = 0
    while True:
        pair = reader.read()
        if pair is None:
            break
        pairs.append(pair)
        total_bases += len(pair[0].seq) + len(pair[1].seq)
        if total_bases >= chunk_size:
            flush(pairs)
            pairs = []
            total_bases = 0
    if pairs:
        flush(pairs)
    reader.close()
    if out_stream is None and out is not sys.stdout.buffer:
        out.close()
    elif out is sys.stdout.buffer:
        out.flush()


def _iter_chunks(stream, header: RfqHeader) -> Iterable[RfqChunk]:
    while True:
        chunk = RfqChunk.read(stream, header)
        if chunk.reads == 0:
            return
        yield chunk


def decompress(
    in1: str,
    out1: str,
    engine: Optional[EngineConfig] = None,
    in_stream=None,
) -> None:
    """Single-output decompress; PE containers produce interleaved FASTQ
    (reference repaq.cpp:262-333)."""
    engine = engine or get_engine()
    stream = in_stream or (sys.stdin.buffer if in1 in ("/dev/stdin", "-") else open(in1, "rb"))
    writer = Writer(out1)
    header = RfqHeader.read(stream)

    carried: Optional[RfqChunk] = None
    while True:
        chunk = carried if carried is not None else RfqChunk.read(stream, header)
        carried = None
        if chunk.reads == 0:
            break
        reads = engine.decode_chunk(header, chunk)
        if not reads:
            break
        outstr = b"".join(r.to_fastq() for r in reads)
        no_break = bool(chunk.flags & BIT_HAS_NO_LINE_BREAK_AT_END)
        if no_break:
            lookahead = RfqChunk.read(stream, header)
            if lookahead.reads == 0:
                writer.write(outstr[:-1])
                break
            carried = lookahead
            writer.write(outstr)
            continue
        writer.write(outstr)
    writer.close()
    if in_stream is None and stream is not sys.stdin.buffer:
        stream.close()


def decompress_pe(
    in1: str,
    out1: str,
    out2: str,
    engine: Optional[EngineConfig] = None,
    in_stream=None,
) -> None:
    engine = engine or get_engine()
    stream = in_stream or (sys.stdin.buffer if in1 in ("/dev/stdin", "-") else open(in1, "rb"))
    writer1 = Writer(out1)
    writer2 = Writer(out2)
    header = RfqHeader.read(stream)
    if not header.paired_end():
        raise RfqFormatError(
            "The input RFQ file was encoded by single-end FASTQ, you should "
            "not specify <out2>"
        )

    carried: Optional[RfqChunk] = None
    while True:
        chunk = carried if carried is not None else RfqChunk.read(stream, header)
        carried = None
        if chunk.reads == 0:
            break
        reads = engine.decode_chunk(header, chunk)
        if not reads:
            break
        outstr1 = b"".join(r.to_fastq() for i, r in enumerate(reads) if i % 2 == 0)
        outstr2 = b"".join(r.to_fastq() for i, r in enumerate(reads) if i % 2 == 1)
        no_break1 = bool(chunk.flags & BIT_HAS_NO_LINE_BREAK_AT_END)
        no_break2 = bool(chunk.flags & BIT_HAS_NO_LINE_BREAK_AT_END_R2)
        is_last = False
        if no_break1 or no_break2:
            lookahead = RfqChunk.read(stream, header)
            if lookahead.reads == 0:
                is_last = True
            else:
                carried = lookahead
        writer1.write(outstr1[:-1] if (no_break1 and is_last) else outstr1)
        writer2.write(outstr2[:-1] if (no_break2 and is_last) else outstr2)
    writer1.close()
    writer2.close()
    if in_stream is None and stream is not sys.stdin.buffer:
        stream.close()


def _report_compare(
    passed: bool,
    msg: str,
    fq_reads: int,
    fq_bases: int,
    rfq_reads: int,
    rfq_bases: int,
    json_file: str = "",
    quiet: bool = False,
) -> dict:
    # exact reference layout (repaq.cpp:235-259)
    text = "{\n"
    text += '\t"result":"%s",\n' % ("passed" if passed else "failed")
    text += '\t"msg":"%s",\n' % msg
    text += '\t"fastq_reads":%d,\n' % fq_reads
    text += '\t"rfq_reads":%d,\n' % rfq_reads
    text += '\t"fastq_bases":%d,\n' % fq_bases
    text += '\t"rfq_bases":%d\n' % rfq_bases
    text += "}\n"
    if json_file:
        with open(json_file, "w") as f:
            f.write(text)
    if not quiet:
        sys.stdout.write(text)
    return json.loads(text)


def compare(
    in1: str,
    rfq: str,
    json_file: str = "",
    engine: Optional[EngineConfig] = None,
    in_stream=None,
    quiet: bool = False,
) -> dict:
    """Read-by-read consistency check (reference repaq.cpp:36-128)."""
    engine = engine or get_engine()
    stream = in_stream or (sys.stdin.buffer if rfq in ("/dev/stdin", "-") else open(rfq, "rb"))
    reader = FastqReader(in1)
    header = RfqHeader.read(stream)

    fq_reads = fq_bases = rfq_reads = rfq_bases = 0
    for chunk in _iter_chunks(stream, header):
        decoded = engine.decode_chunk(header, chunk)
        if not decoded:
            break
        for got in decoded:
            rfq_bases += len(got.seq)
            rfq_reads += 1
            want = reader.read()
            if want is None:
                msg = (
                    "The RFQ file has more reads than the FASTQ file. The RFQ "
                    "file has >= %d reads, while the FASTQ file only has %d reads"
                    % (rfq_reads, fq_reads)
                )
                return _report_compare(
                    False, msg, fq_reads, fq_bases, rfq_reads, rfq_bases,
                    json_file, quiet,
                )
            fq_reads += 1
            fq_bases += len(want.seq)
            for label, g, w in (
                ("name", got.name, want.name),
                ("sequence", got.seq, want.seq),
                ("strand", got.strand, want.strand),
                ("quality", got.qual, want.qual),
            ):
                if g != w:
                    msg = (
                        "The RFQ file and FASTQ file have different %s in the "
                        "%d read. %s | %s"
                        % (label, rfq_reads, g.decode("latin1"), w.decode("latin1"))
                    )
                    return _report_compare(
                        False, msg, fq_reads, fq_bases, rfq_reads, rfq_bases,
                        json_file, quiet,
                    )
    if reader.read() is not None:
        fq_reads += 1
        msg = (
            "The FASTQ file has more reads than the RFQ file. The FASTQ file "
            "has >= %d reads, while the RFQ file only has %d reads"
            % (fq_reads, rfq_reads)
        )
        return _report_compare(
            False, msg, fq_reads, fq_bases, rfq_reads, rfq_bases, json_file, quiet
        )
    return _report_compare(
        True, "", fq_reads, fq_bases, rfq_reads, rfq_bases, json_file, quiet
    )


def compare_pe(
    in1: str,
    in2: str,
    rfq: str,
    json_file: str = "",
    engine: Optional[EngineConfig] = None,
    in_stream=None,
    quiet: bool = False,
) -> dict:
    engine = engine or get_engine()
    stream = in_stream or (sys.stdin.buffer if rfq in ("/dev/stdin", "-") else open(rfq, "rb"))
    reader = FastqReaderPair(in1, in2)
    header = RfqHeader.read(stream)

    fq_reads = fq_bases = rfq_reads = rfq_bases = 0
    pair = None
    for chunk in _iter_chunks(stream, header):
        decoded = engine.decode_chunk(header, chunk)
        if not decoded:
            break
        for got in decoded:
            rfq_bases += len(got.seq)
            rfq_reads += 1
            if pair is None:
                pair = reader.read()
            if pair is None:
                msg = (
                    "The RFQ file has more reads than the FASTQ file. The RFQ "
                    "file has >= %d pairs, while the FASTQ file only has %d pairs"
                    % (rfq_reads // 2, fq_reads // 2)
                )
                return _report_compare(
                    False, msg, fq_reads, fq_bases, rfq_reads, rfq_bases,
                    json_file, quiet,
                )
            want = pair[0] if rfq_reads % 2 == 1 else pair[1]
            fq_reads += 1
            fq_bases += len(want.seq)
            for label, g, w in (
                ("name", got.name, want.name),
                ("sequence", got.seq, want.seq),
                ("strand", got.strand, want.strand),
                ("quality", got.qual, want.qual),
            ):
                if g != w:
                    msg = (
                        "The RFQ file and FASTQ file have different %s in the "
                        "%d pair. %s | %s"
                        % (
                            label,
                            rfq_reads // 2,
                            g.decode("latin1"),
                            w.decode("latin1"),
                        )
                    )
                    return _report_compare(
                        False, msg, fq_reads, fq_bases, rfq_reads, rfq_bases,
                        json_file, quiet,
                    )
            if rfq_reads % 2 == 0:
                pair = None
    if reader.read() is not None:
        fq_reads += 1
        msg = (
            "The FASTQ file has more reads than the RFQ file. The FASTQ file "
            "has >= %d pairs, while the RFQ file only has %d pairs"
            % (fq_reads // 2, rfq_reads // 2)
        )
        return _report_compare(
            False, msg, fq_reads, fq_bases, rfq_reads, rfq_bases, json_file, quiet
        )
    return _report_compare(
        True, "", fq_reads, fq_bases, rfq_reads, rfq_bases, json_file, quiet
    )
