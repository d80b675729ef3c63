"""Production multi-chip compress: chunks fanned across a jax.sharding
Mesh from the CLI (SURVEY §2.2 row 1 — the piece round 2 left test-only).

The .rfq format's chunks are independent once the header is fixed, so the
multi-chip axis is pure data parallelism: D consecutive uniform-length
chunks are padded to one shared (D*B_cap, L) batch and encoded by ONE
shard_map dispatch over the mesh's data axis (each device runs the full
chunk-codec kernel stack of parallel/mesh.device_encode_block on its own
chunk); the host assembles the returned streams into wire chunks in
order. Chunks the batch shape cannot take (ragged, tiny, shape change
mid-run, trailing partial batch) flush through the single-device engine —
bytes are identical either way, so the output equals the serial pipeline
byte-for-byte for ANY device count (tests/test_parallel.py proves it on
the 8-virtual-device CPU mesh; the same code runs unchanged on a real
multi-chip host).

PE interleaved inputs keep the single-device engine: the overlap-elision
step is per-pair and lives in codec/device_engine; batching it across a
mesh is the same mechanism once a sharded PE step exists.
"""

from __future__ import annotations

import io as _io
import os

import numpy as np

from ..codec import vectorized
from ..codec.blocks import ReadBlock
from ..constants import BIT_HAS_NO_LINE_BREAK_AT_END
from ..format.header import RfqFormatError, RfqHeader
from ..io.fastq import FastqReader
from ..pipeline import EngineConfig, _open_out, get_engine

_G = ord("G")


def _bucket(x: int, lo: int = 256) -> int:
    c = lo
    while c < x:
        if c + (c >> 1) >= x:
            return c + (c >> 1)
        c *= 2
    return c


class _MeshBatchEncoder:
    """Owns the mesh, the per-shape jitted shard_map steps, and the
    padded-batch marshalling."""

    def __init__(self, devices):
        import jax

        self._jax = jax
        from .mesh import make_mesh

        self.devices = list(devices)
        self.D = len(self.devices)
        self.mesh = make_mesh(self.devices)
        self._steps: dict = {}

    def _step_for(self, key):
        fn = self._steps.get(key)
        if fn is None:
            fn = self._build(key)
            self._steps[key] = fn
        return fn

    def _build(self, key):
        (b_cap, L, nm, esc, npc, qos, nos) = key
        jax = self._jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        from .mesh import device_encode_block

        try:
            from jax import shard_map
        except ImportError:  # pragma: no cover - older jax
            from jax.experimental.shard_map import shard_map

        def step(seqs, quals, xs, ys, nv, bins, major, in_table):
            out = device_encode_block(
                seqs, quals, xs, ys, bins, major[0], in_table,
                esc_cap=esc, nonmajor_cap=nm, npos_cap=npc,
                qual_out_size=qos, npos_out_size=nos,
                check_counts=False, n_valid_reads=nv[0],
            )
            return {
                k: (v.reshape(1) if v.ndim == 0 else v)
                for k, v in out.items()
            }

        axis = "data"
        out_spec = {
            k: P(axis)
            for k in ("n_esc", "n_nonmajor", "n_npos", "packed", "qual",
                      "qual_len", "npos", "npos_len", "x", "x_len", "y",
                      "y_len")
        }
        sharded = shard_map(
            step, mesh=self.mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis),
                      P(), P(), P()),
            out_specs=out_spec,
        )
        return jax.jit(sharded)

    def encode_batch(self, header: RfqHeader, blocks: list, L: int):
        """Encode up to D uniform-(L) blocks -> list of RfqChunk, in
        order. Short batches (the common trailing case) ride along as
        zero-read padding devices whose outputs are dropped."""
        D = self.D
        assert 1 <= len(blocks) <= D
        analyses = [
            vectorized.analyze_chunk(header, b, False) for b in blocks
        ]
        b_cap = _bucket(max(b.n for b in blocks))
        has_xy = header.has_x()
        major = int(header.major_qual())
        in_tab = np.zeros(256, dtype=bool)
        in_tab[np.frombuffer(header.qual_buf, dtype=np.uint8)] = True

        nm = esc = npc = 0
        for b in blocks:
            qual = b.qual_flat
            nm = max(nm, int((qual != major).sum()))
            esc = max(esc, int((~in_tab[qual]).sum()))
            npc = max(npc, int((b.seq_flat == ord("N")).sum()))
        n_cap = b_cap * L
        nm_c = _bucket(nm, lo=1024)
        esc_c = 0 if esc == 0 else _bucket(esc, lo=8)
        np_c = _bucket(npc, lo=8)
        nbins = int(header.normal_qual_bins())
        qos = min(_bucket(4 * nbins + 4 * nm + 5 * esc + 8, lo=1024),
                  4 * nbins + n_cap + 8)
        nos = _bucket(min(4 * npc, npc + n_cap // 64) + 16, lo=64)
        if 4 * nbins + n_cap + 8 >= (1 << 23):
            return None  # past the emission-sort packing limit

        seqs = np.full((D * b_cap, L), _G, dtype=np.uint8)
        quals = np.full((D * b_cap, L), major, dtype=np.uint8)
        xs = np.zeros(D * b_cap, dtype=np.int32)
        ys = np.zeros(D * b_cap, dtype=np.int32)
        nv = np.zeros(D, dtype=np.int32)
        for d, (b, a) in enumerate(zip(blocks, analyses)):
            seqs[d * b_cap : d * b_cap + b.n] = b.seq_flat.reshape(b.n, L)
            quals[d * b_cap : d * b_cap + b.n] = b.qual_flat.reshape(b.n, L)
            if has_xy:
                xs[d * b_cap : d * b_cap + b.n] = a.xs
                ys[d * b_cap : d * b_cap + b.n] = a.ys
            nv[d] = b.n

        from .mesh import replicate, shard_blocks

        bins_dev = np.asarray(header.normal_qual_buf(), dtype=np.uint8)
        key = (b_cap, L, nm_c, esc_c, np_c, qos, nos)
        fn = self._step_for(key)
        out = fn(
            shard_blocks(self.mesh, seqs),
            shard_blocks(self.mesh, quals),
            shard_blocks(self.mesh, xs),
            shard_blocks(self.mesh, ys),
            shard_blocks(self.mesh, nv),
            replicate(self.mesh, bins_dev),
            replicate(self.mesh, np.array([major], dtype=np.uint8)),
            replicate(self.mesh, in_tab),
        )
        packed = np.asarray(out["packed"]).reshape(D, -1)
        qual_s = np.asarray(out["qual"]).reshape(D, -1)
        qual_l = np.asarray(out["qual_len"]).reshape(-1)
        npos_s = np.asarray(out["npos"]).reshape(D, -1)
        npos_l = np.asarray(out["npos_len"]).reshape(-1)
        x_s = np.asarray(out["x"]).reshape(D, -1)
        x_l = np.asarray(out["x_len"]).reshape(-1)
        y_s = np.asarray(out["y"]).reshape(D, -1)
        y_l = np.asarray(out["y_len"]).reshape(-1)

        chunks = []
        for d, (b, a) in enumerate(zip(blocks, analyses)):
            n = b.n * L
            chunks.append(vectorized.assemble_chunk(
                header, b, a, np.zeros(0, dtype=np.int64),
                packed[d, : (n + 3) // 4].tobytes(),
                qual_s[d, : qual_l[d]].tobytes(),
                npos_s[d, : npos_l[d]].tobytes()
                if header.encode_n_pos() else b"",
                x_bytes=x_s[d, : x_l[d]].tobytes() if has_xy else None,
                y_bytes=y_s[d, : y_l[d]].tobytes() if has_xy else None,
            ))
        return chunks


def compress_se_mesh(
    in1: str,
    out1: str,
    chunk_size: int = 1_000_000,
    engine: EngineConfig | None = None,
    out_stream=None,
    devices=None,
) -> dict:
    """SE compress with chunks fanned over a device mesh; output bytes
    are identical to the serial pipeline. Returns stats (mesh batches /
    fallback chunks). Non-conforming chunks (ragged, shape change, tiny,
    trailing partial batch, non-by-col quality modes) flush through the
    single-device engine in order."""
    import jax

    devices = list(devices) if devices else list(jax.devices())
    engine = engine or get_engine("device")
    if len(devices) < 2:
        from .. import pipeline

        pipeline.compress_se(in1, out1, chunk_size=chunk_size,
                             engine=engine, out_stream=out_stream)
        return {"mesh_batches": 0, "fallback_chunks": -1}

    enc = _MeshBatchEncoder(devices)
    min_bases = int(os.environ.get("REPAQ_DEVICE_MIN_BASES", 128 << 10))
    max_bases = int(os.environ.get("REPAQ_DEVICE_MAX_BASES", 4 << 20))

    reader = FastqReader(in1)
    out, own = _open_out(out1, out_stream)
    segmented = hasattr(out, "write_segments")
    stats = {"mesh_batches": 0, "fallback_chunks": 0}
    header: RfqHeader | None = None
    header_bytes = b""
    batch: list = []  # (block, flag) of uniform length batch_L
    batch_L = 0

    def ensure_header(block: ReadBlock) -> None:
        nonlocal header, header_bytes
        if header is not None:
            return
        header = engine.make_header_se(block)
        if header is None:
            raise RfqFormatError(
                "failed to encode, please confirm the input FASTQ file is "
                "valid and not empty"
            )
        header_bytes = header.to_bytes()
        out.write(header_bytes)
        check = RfqHeader.read(_io.BytesIO(header_bytes))
        if not header.identical_with(check):
            raise RfqFormatError(
                "encoding error in header, the output will be wrong, "
                "quit now!"
            )

    def emit(chunk, flag: bool) -> None:
        if chunk is None:
            return
        if flag:
            chunk.flags |= BIT_HAS_NO_LINE_BREAK_AT_END
        if segmented:
            out.write_segments(chunk.to_segments())
        else:
            out.write(chunk.to_bytes())

    def flush_batch() -> None:
        nonlocal batch
        if not batch:
            return
        blocks = [b for b, _f in batch]
        chunks = enc.encode_batch(header, blocks, batch_L)
        if chunks is None:  # over the emission-sort limit: per-chunk path
            for b, f in batch:
                stats["fallback_chunks"] += 1
                emit(engine.encode_chunk(header, b, False), f)
        else:
            stats["mesh_batches"] += 1
            for (b, f), c in zip(batch, chunks):
                emit(c, f)
        batch = []

    while True:
        block, flag = reader.read_block(budget_bases=chunk_size)
        if block is None or block.n == 0:
            break
        ensure_header(block)
        lens = block.seq_lens()
        L = int(lens[0]) if block.n else 0
        uniform = L > 0 and bool((lens == L).all())
        total = int(lens.sum())
        eligible = (
            uniform
            and header.encode_qual_by_col()
            and min_bases <= total <= max_bases
            and header.has_x() == header.has_y()
        )
        if not eligible or (batch and L != batch_L):
            flush_batch()
        if not eligible:
            stats["fallback_chunks"] += 1
            emit(engine.encode_chunk(header, block, False), flag)
            continue
        batch_L = L
        batch.append((block, flag))
        if len(batch) == enc.D:
            flush_batch()
    flush_batch()
    reader.close()
    # empty input: the serial pipeline writes an empty container too
    if own:
        out.close()
    return stats
