"""End-to-end benchmark: NovaSeq-like PE FASTQ encode+decode throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MB/s", "vs_baseline": N}

Baseline: the reference encodes nova R1+R2 (3408 MB) in <1 min on one CPU
core => 57 MB/s input throughput (BASELINE.md / reference README.md:27).
We report the same quantity — FASTQ input MB per second of wall time for a
full compress (PE joint) — after asserting the roundtrip is bit-exact.

Diagnostics (per-stage timings, compression ratio, decode rate, device
kernel rates when a TPU is reachable) go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from repaq_tpu import pipeline  # noqa: E402

BASELINE_MBPS = 57.0  # reference: 3408 MB in <60 s, single core
READ_LEN = 150
PAIRS = 400_000  # ~230 MB of FASTQ text


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def make_dataset(tmp: str) -> tuple[str, str, int]:
    """Synthetic NovaSeq-like paired-end FASTQ (4 quality bins, ~0.2% N
    with constant '#' qual, 35% overlapping fragments in the orientation
    the codec's PE overlap elision detects)."""
    rng = np.random.default_rng(2024)
    n = PAIRS
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    quals = np.frombuffer(b"FFF:FFF,F:", dtype=np.uint8)
    comp = np.zeros(256, dtype=np.uint8)
    for a, b in zip(b"ACGT", b"TGCA"):
        comp[a] = b

    s1 = rng.choice(bases, size=(n, READ_LEN))
    s2 = rng.choice(bases, size=(n, READ_LEN))
    # overlapping fragments: RC(R2) starts with R1's last o bases — the
    # orientation the codec's overlap elision detects (reference
    # rfqcodec.cpp:1391-1438). R2 = revcomp(R1[-o:] ++ random tail).
    # (batched per overlap length so generation stays vectorized)
    ov_mask = rng.random(n) < 0.35
    ov_len = rng.integers(30, READ_LEN, size=n)
    for o in range(30, READ_LEN):
        rows = np.flatnonzero(ov_mask & (ov_len == o))
        if rows.size == 0:
            continue
        r2rc = np.concatenate(
            [s1[rows, READ_LEN - o :], s2[rows, : READ_LEN - o]], axis=1
        )
        s2[rows] = comp[r2rc][:, ::-1]
    q1 = rng.choice(quals, size=(n, READ_LEN))
    q2 = rng.choice(quals, size=(n, READ_LEN))
    # ~0.2% N (NovaSeq-like; an N inside an overlap window breaks the
    # exact-match elision, as in the reference)
    nmask1 = rng.random((n, READ_LEN)) < 0.002
    nmask2 = rng.random((n, READ_LEN)) < 0.002
    s1[nmask1] = ord("N")
    q1[nmask1] = ord("#")
    s2[nmask2] = ord("N")
    q2[nmask2] = ord("#")
    xs = rng.integers(1000, 40000, size=n)
    ys = rng.integers(1000, 40000, size=n)

    def write(fname, seqs, qs, mate):
        from repaq_tpu.codec.blocks import ReadBlock, lens_to_offsets
        from repaq_tpu.codec.names import build_names

        pre = b"@A00251:28:H3YV7DSXX:4:1101"
        n1_flat = np.frombuffer(pre, dtype=np.uint8)
        n2 = b" %d:N:0:TAAGTGGC" % mate
        n2_flat = np.frombuffer(n2, dtype=np.uint8)
        name_flat, name_off = build_names(
            n,
            n1_flat,
            np.zeros(n, dtype=np.int64),
            np.full(n, len(pre), dtype=np.int64),
            None,
            None,
            xs.astype(np.int64),
            ys.astype(np.int64),
            n2_flat,
            np.zeros(n, dtype=np.int64),
            np.full(n, len(n2), dtype=np.int64),
        )
        lens = np.full(n, READ_LEN, dtype=np.int64)
        off = lens_to_offsets(lens)
        strand = np.full(n, ord("+"), dtype=np.uint8)
        block = ReadBlock(
            n, name_flat, name_off, seqs.reshape(-1), off,
            strand, lens_to_offsets(np.ones(n, dtype=np.int64)),
            qs.reshape(-1), off.copy(),
        )
        with open(fname, "wb") as f:
            f.write(block.to_fastq_bytes())

    f1 = os.path.join(tmp, "bench_R1.fq")
    f2 = os.path.join(tmp, "bench_R2.fq")
    write(f1, s1, q1, 1)
    write(f2, s2, q2, 2)
    total = os.path.getsize(f1) + os.path.getsize(f2)
    return f1, f2, total


def bench_device_kernels() -> float | None:
    """Per-chip on-device encode-kernel throughput (MB of seq+qual bytes per
    second), with a byte-exactness check of the produced streams against the
    host kernels. Returns None when no accelerator is reachable."""
    try:
        import jax
        import jax.numpy as jnp

        if jax.devices()[0].platform == "cpu":
            return None
    except Exception:
        return None

    from repaq_tpu.codec import kernels_np as K
    from repaq_tpu.parallel.mesh import device_encode_block

    B, L = 32768, 152
    rng = np.random.default_rng(0)
    bins = np.frombuffer(b"#,:", dtype=np.uint8)
    in_table = np.zeros(256, dtype=bool)
    in_table[bins] = True
    in_table[ord("F")] = True
    xs = rng.integers(1000, 40000, size=B).astype(np.int32)
    ys = rng.integers(1000, 40000, size=B).astype(np.int32)

    def mk(seed):
        r = np.random.default_rng(seed)
        return (
            r.choice(np.frombuffer(b"GATCN", dtype=np.uint8), size=(B, L)),
            r.choice(np.frombuffer(b"FFF:FFF,F:#", dtype=np.uint8), size=(B, L)),
        )

    # tight static caps, as the pipeline computes host-side per chunk:
    # exact counts bucketed to the next power of two
    def bucket(x, n):
        c = 1024
        while c < x:
            c *= 2
        return min(c, n)

    n_elems = B * L
    host_blocks = [mk(i) for i in range(4)]
    nm_cap = bucket(
        max(int((q != ord("F")).sum()) for _s, q in host_blocks), n_elems
    )
    np_cap = bucket(
        max(int((s == ord("N")).sum()) for s, _q in host_blocks), n_elems
    )
    f = jax.jit(
        lambda s, q, x, y, b, t: device_encode_block(
            s, q, x, y, b, jnp.uint8(ord("F")), t,
            esc_cap=8, nonmajor_cap=nm_cap, npos_cap=np_cap,
        )
    )
    xd, yd, bd, td = map(jax.device_put, (xs, ys, bins, in_table))
    blocks = [tuple(map(jax.device_put, hb)) for hb in host_blocks]
    t0 = time.time()
    out = f(blocks[0][0], blocks[0][1], xd, yd, bd, td)
    jax.block_until_ready(out)
    log("device: compile+first step %.1fs" % (time.time() - t0))

    # byte-exactness: device stream length == host kernels for block 0
    # (full-stream comparison runs in tests/test_device.py; here the length
    # gate keeps the fetch tiny — the tunnel's u8 D2H path is pathological)
    s0, q0 = host_blocks[0]
    want_qual = K.encode_qual_by_col(q0.reshape(-1), bins, ord("F"))
    got_len = int(out["qual_len"])
    assert got_len == want_qual.shape[0], "device qual stream length mismatch"
    log("device: stream lengths match host kernels")

    # scalar result fetches force real execution (async dispatch otherwise
    # returns immediately under the remote backend). Dispatch the whole
    # batch first, then sync: the per-call host->device round trip (~30ms
    # on this tunnel) overlaps with compute, measuring sustained
    # throughput the way a real pipeline runs.
    n_steps = 8
    t0 = time.time()
    outs = []
    for i in range(n_steps):
        s, q = blocks[i % 4]
        outs.append(f(s, q, xd, yd, bd, td))
    for o in outs:
        _ = int(o["qual_len"])
    dt = time.time() - t0
    out = outs[-1]
    mbps = B * L * 2 / 1e6 * n_steps / dt
    log(
        "device: %.4fs/step (%.1f MB seq+qual resident) -> %.0f MB/s per chip"
        % (dt / n_steps, B * L * 2 / 1e6, mbps)
    )

    # decode kernels: full on-chip unpack + quality + N reconstruction.
    # A real pipeline knows every stream's length from the chunk header,
    # so the padded buffers are sliced to bucketed sizes before dispatch —
    # the token-FSM and scans run over the compressed size, not n.
    from repaq_tpu.parallel.mesh import device_decode_block

    qcap = bucket(max(int(o["qual_len"]) for o in outs) + 8,
                  out["qual"].shape[0])
    ncap = bucket(max(int(o["npos_len"]) for o in outs) + 8,
                  out["npos"].shape[0])
    g = jax.jit(
        lambda p, qb, ql, nb, nl: device_decode_block(
            p, qb, ql, nb, nl, bd, jnp.uint8(ord("F")), B, L
        )
    )
    sq, qq = g(out["packed"], out["qual"][:qcap], out["qual_len"],
               out["npos"][:ncap], out["npos_len"])
    _ = int(jnp.sum(sq[0].astype(jnp.int32)))
    t0 = time.time()
    decs = []
    for o in outs:
        sq, qq = g(o["packed"], o["qual"][:qcap], o["qual_len"],
                   o["npos"][:ncap], o["npos_len"])
        decs.append(sq)
    for sq in decs:
        _ = int(jnp.sum(sq[0].astype(jnp.int32)))
    dec_dt = time.time() - t0
    # exactness gate for the sliced-buffer decode (last block = mk(3))
    s3, q3 = host_blocks[(n_steps - 1) % 4]
    assert np.array_equal(np.asarray(sq), s3), "device decode seq mismatch"
    assert np.array_equal(np.asarray(qq), q3), "device decode qual mismatch"
    log(
        "device decode: %.4fs/step -> %.0f MB/s per chip"
        % (dec_dt / n_steps, B * L * 2 / 1e6 * n_steps / dec_dt)
    )
    return mbps


def main() -> None:
    # RAM-backed files when available: the measurement is the codec, not
    # this VM's disk, and run-to-run disk variance was +-30%
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix="repaq_bench_", dir=base)
    t0 = time.time()
    f1, f2, total_bytes = make_dataset(tmp)
    log("dataset: %.1f MB generated in %.1fs" % (total_bytes / 1e6, time.time() - t0))

    rfq = os.path.join(tmp, "bench.rfq")
    enc_s = float("inf")
    for _rep in range(3):  # best-of-N: the host vCPU sees ~10% steal spikes
        t0 = time.time()
        pipeline.compress_pe(f1, f2, rfq)
        enc_s = min(enc_s, time.time() - t0)
    rfq_bytes = os.path.getsize(rfq)
    log(
        "encode: %.2fs -> %.1f MB/s in, .rfq %.1f MB (CR %.2f%%)"
        % (enc_s, total_bytes / 1e6 / enc_s, rfq_bytes / 1e6,
           100.0 * rfq_bytes / total_bytes)
    )

    d1 = os.path.join(tmp, "dec_R1.fq")
    d2 = os.path.join(tmp, "dec_R2.fq")
    dec_s = float("inf")
    for _rep in range(3):
        t0 = time.time()
        pipeline.decompress_pe(rfq, d1, d2)
        dec_s = min(dec_s, time.time() - t0)
    log("decode: %.2fs -> %.1f MB/s out" % (dec_s, total_bytes / 1e6 / dec_s))

    # bit-exact roundtrip gate
    import filecmp

    assert filecmp.cmp(f1, d1, shallow=False), "roundtrip mismatch R1"
    assert filecmp.cmp(f2, d2, shallow=False), "roundtrip mismatch R2"
    log("roundtrip: bit-exact")

    # second entropy stage (.rfqz, in-framework interleaved rANS replacing
    # the reference's external xz): the CLI path — stream-aligned sections
    # over 16Mbase chunks
    try:
        from repaq_tpu.format.rfqz import RfqzReader, RfqzWriter

        zpath = os.path.join(tmp, "bench.rfqz")
        t0 = time.time()
        w = RfqzWriter(zpath)
        pipeline.compress_pe(f1, f2, "", out_stream=w,
                             chunk_size=16_000_000)
        w.close()
        z_s = time.time() - t0
        z_bytes = os.path.getsize(zpath)
        # the ratio denominator must be the SAME chunking the stage
        # actually compressed (16Mb chunks), not the 1Mb-chunk bench.rfq
        rfq16 = os.path.join(tmp, "bench16.rfq")
        pipeline.compress_pe(f1, f2, rfq16, chunk_size=16_000_000)
        rfq16_bytes = os.path.getsize(rfq16)
        os.unlink(rfq16)
        z1 = os.path.join(tmp, "z_R1.fq")
        z2 = os.path.join(tmp, "z_R2.fq")
        t0 = time.time()
        pipeline.decompress_pe("", z1, z2, in_stream=RfqzReader(zpath))
        z_dec_s = time.time() - t0
        assert filecmp.cmp(f1, z1, shallow=False) and filecmp.cmp(
            f2, z2, shallow=False
        ), "rfqz roundtrip mismatch"
        log(
            "rfqz (FASTQ -> .rfqz, 16Mb chunks): %.1f MB (%.1f%% of its "
            ".rfq input, %.2f%% of FASTQ) enc %.0f MB/s dec %.0f MB/s of "
            "FASTQ, lossless"
            % (z_bytes / 1e6, 100.0 * z_bytes / rfq16_bytes,
               100.0 * z_bytes / total_bytes, total_bytes / 1e6 / z_s,
               total_bytes / 1e6 / z_dec_s)
        )
        for p in (zpath, z1, z2):
            os.unlink(p)
    except Exception as e:
        log("rfqz stage diagnostics unavailable: %r" % (e,))

    enc_mbps = total_bytes / 1e6 / enc_s
    log(
        "combined encode+decode: %.1f MB/s"
        % (total_bytes / 1e6 / (enc_s + dec_s))
    )

    for p in (f1, f2, rfq, d1, d2):
        os.unlink(p)
    os.rmdir(tmp)

    dev_mbps = None
    try:
        dev_mbps = bench_device_kernels()
    except Exception as e:  # never lose the host result to a device hiccup
        log("device bench unavailable: %r" % (e,))

    # Headline: honest end-to-end PE encode throughput on this machine
    # (same quantity as the reference's published <1min/3408MB single-core
    # number). The on-chip kernel rate goes into the metric text — in this
    # dev environment the chip sits behind a ~30 MB/s tunnel, so end-to-end
    # offload cannot pay off here; see ARCHITECTURE.md for the analysis.
    metric = "PE FASTQ .rfq encode throughput, bit-exact roundtrip verified"
    if dev_mbps is not None:
        metric += " (on-chip encode kernels: %.0f MB/s per chip)" % dev_mbps
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(enc_mbps, 1),
                "unit": "MB/s",
                "vs_baseline": round(enc_mbps / BASELINE_MBPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
