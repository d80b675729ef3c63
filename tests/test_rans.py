"""Interleaved-rANS second stage: host oracle roundtrips, device kernels
byte-exact with the oracle, rfqz container + CLI integration."""

import numpy as np
import pytest

from repaq_tpu.codec import rans_np as R
from repaq_tpu.format import rfqz


def _skewed(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.choice(
        np.frombuffer(b"\x00\x01\x01\x01\x02\x05\x80\xff\x41\x41", np.uint8),
        size=n,
    )


@pytest.mark.parametrize("order", [0, 1])
@pytest.mark.parametrize("n,lanes", [(0, 8), (1, 8), (7, 8), (257, 16),
                                     (4096, 64), (100_000, 256)])
def test_roundtrip_host(order, n, lanes):
    data = _skewed(n).tobytes()
    enc = R.encode_section(data, order=order, lanes=lanes)
    dec, off = R.decode_section(enc)
    assert dec == data
    assert off == len(enc)


def test_roundtrip_all_bytes():
    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, size=50_000, dtype=np.uint8).tobytes()
    for order in (0, 1):
        enc = R.encode_section(data, order=order, lanes=128)
        dec, _ = R.decode_section(enc)
        assert dec == data


def test_single_symbol():
    data = b"\x42" * 10_000
    enc = R.encode_section(data, order=0, lanes=32)
    assert len(enc) < 600
    dec, _ = R.decode_section(enc)
    assert dec == data


def test_quantize_exact_sum():
    rng = np.random.default_rng(1)
    for _ in range(20):
        counts = rng.integers(0, 1000, size=256)
        counts[rng.random(256) < 0.7] = 0
        if counts.sum() == 0:
            counts[3] = 5
        f = R.quantize_freqs(counts)
        assert f.sum() == R.SCALE
        assert ((f > 0) == (counts > 0)).all()


@pytest.mark.parametrize("order", [0, 1])
def test_device_matches_host(order):
    from repaq_tpu.ops import rans_device as D

    n, lanes = 64 * 512, 64
    data = _skewed(n, seed=3).tobytes()
    enc_host = R.encode_section(data, order=order, lanes=lanes)
    enc_dev = D.encode_section_device(data, order=order, lanes=lanes)
    assert enc_dev == enc_host
    dec, off = D.decode_section_device(enc_host)
    assert dec == data and off == len(enc_host)


def test_device_ragged_falls_back():
    from repaq_tpu.ops import rans_device as D

    data = _skewed(1003, seed=4).tobytes()
    enc = D.encode_section_device(data, order=0, lanes=64)
    assert enc == R.encode_section(data, order=0, lanes=64)
    dec, _ = D.decode_section_device(enc)
    assert dec == data


def test_rfqz_container_roundtrip(tmp_path):
    rng = np.random.default_rng(9)
    blob = (
        _skewed(300_000, seed=2).tobytes()
        + rng.integers(0, 256, size=100_000, dtype=np.uint8).tobytes()
    )
    p = tmp_path / "x.rfqz"
    w = rfqz.RfqzWriter(str(p), block_size=64 * 1024, lanes=128)
    for i in range(0, len(blob), 37_777):
        w.write(blob[i : i + 37_777])
    w.close()
    r = rfqz.RfqzReader(str(p))
    got = bytearray()
    while True:
        b = r.read(10_000)
        if not b:
            break
        got += b
    assert bytes(got) == blob
    assert w.coded_bytes < len(blob)  # skewed part must compress


def test_rfqz_bad_magic(tmp_path):
    p = tmp_path / "bad.rfqz"
    p.write_bytes(b"NOPE1234")
    with pytest.raises(rfqz.RfqzFormatError):
        rfqz.RfqzReader(str(p))


def test_cli_rfqz_roundtrip(fixtures_dir, tmp_path):
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    fq = fixtures_dir / "se_big.fq"
    z = tmp_path / "o.rfqz"
    back = tmp_path / "back.fq"
    env = {"PYTHONPATH": str(repo), "PATH": "/usr/bin:/bin",
           "JAX_PLATFORMS": "cpu"}
    r = subprocess.run(
        [sys.executable, "-m", "repaq_tpu.cli", "-c", "-i", str(fq),
         "-o", str(z), "-k", "100"], env=env, capture_output=True,
    )
    assert r.returncode == 0, r.stderr
    assert z.stat().st_size < fq.stat().st_size * 0.5
    r = subprocess.run(
        [sys.executable, "-m", "repaq_tpu.cli", "-d", "-i", str(z),
         "-o", str(back)], env=env, capture_output=True,
    )
    assert r.returncode == 0, r.stderr
    assert back.read_bytes() == fq.read_bytes()
    # compare mode against .rfqz
    r = subprocess.run(
        [sys.executable, "-m", "repaq_tpu.cli", "-p", "-i", str(fq),
         "-r", str(z)], env=env, capture_output=True,
    )
    assert r.returncode == 0, r.stderr
    assert b'"result":"passed"' in r.stdout


def test_rfqz_corrupt_sections(tmp_path):
    """Truncated or bit-flipped containers must fail cleanly, never crash
    or read out of bounds in the native decoder."""
    data = _skewed(200_000, seed=7).tobytes()
    p = tmp_path / "c.rfqz"
    w = rfqz.RfqzWriter(str(p), block_size=64 * 1024, lanes=64)
    w.write(data)
    w.close()
    blob = bytearray(p.read_bytes())

    # truncation at several points
    for cut in (6, 20, len(blob) // 2, len(blob) - 3):
        q = tmp_path / "t.rfqz"
        q.write_bytes(bytes(blob[:cut]))
        r = rfqz.RfqzReader(str(q))
        try:
            while r.read(65536):
                pass
        except rfqz.RfqzFormatError:
            pass  # clean structured failure is acceptable

    # corrupt the lane-count table of the first section (order byte at 5,
    # then n u32, lanes u16, tables...) — flip bytes through the record
    for pos in range(6, min(len(blob), 600), 37):
        q = bytearray(blob)
        q[pos] ^= 0xFF
        f = tmp_path / "x.rfqz"
        f.write_bytes(bytes(q))
        try:
            r = rfqz.RfqzReader(str(f))
            while r.read(65536):
                pass
        except rfqz.RfqzFormatError:
            pass  # must not segfault / raise anything else


def test_cli_rfqz_pe_and_verify(fixtures_dir, tmp_path):
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    env = {"PYTHONPATH": str(repo), "PATH": "/usr/bin:/bin",
           "JAX_PLATFORMS": "cpu"}
    z = tmp_path / "pe.rfqz"
    r = subprocess.run(
        [sys.executable, "-m", "repaq_tpu.cli", "-c",
         "-i", str(fixtures_dir / "pe_big_R1.fq"),
         "-I", str(fixtures_dir / "pe_big_R2.fq"),
         "-o", str(z), "-k", "100", "--verify"],
        env=env, capture_output=True,
    )
    assert r.returncode == 0, r.stderr
    d1, d2 = tmp_path / "d1.fq", tmp_path / "d2.fq"
    r = subprocess.run(
        [sys.executable, "-m", "repaq_tpu.cli", "-d", "-i", str(z),
         "-o", str(d1), "-O", str(d2)], env=env, capture_output=True,
    )
    assert r.returncode == 0, r.stderr
    assert d1.read_bytes() == (fixtures_dir / "pe_big_R1.fq").read_bytes()
    assert d2.read_bytes() == (fixtures_dir / "pe_big_R2.fq").read_bytes()
    # PE compare against the .rfqz container
    r = subprocess.run(
        [sys.executable, "-m", "repaq_tpu.cli", "-p",
         "-i", str(fixtures_dir / "pe_big_R1.fq"),
         "-I", str(fixtures_dir / "pe_big_R2.fq"), "-r", str(z)],
        env=env, capture_output=True,
    )
    assert r.returncode == 0, r.stderr
    assert b'"result":"passed"' in r.stdout


def test_device_large_payload_no_key_overflow():
    """Device encode of a section whose payload exceeds 2^23 bytes must
    still match the host bytes (packed int32 sort keys used to overflow;
    now a two-operand stable sort carries bytes alongside destinations)."""
    from repaq_tpu.ops import rans_device as D

    rng = np.random.default_rng(11)
    n, lanes = 10 * 1024 * 1024, 4096  # incompressible -> ~2n payload
    data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
    enc_dev = D.encode_section_device(data, order=0, lanes=lanes)
    enc_host = R.encode_section(data, order=0, lanes=lanes)
    assert enc_dev == enc_host
    dec, _ = R.decode_section(enc_dev)
    assert dec == data


def test_stored_section_truncation_detected(tmp_path):
    rng = np.random.default_rng(12)
    data = rng.integers(0, 256, size=100_000, dtype=np.uint8).tobytes()
    p = tmp_path / "s.rfqz"
    w = rfqz.RfqzWriter(str(p))
    w.write(data)
    w.close()
    blob = p.read_bytes()
    assert blob[5] == rfqz.MODE_STORED  # random bytes don't compress
    q = tmp_path / "trunc.rfqz"
    q.write_bytes(blob[: len(blob) // 2])
    r = rfqz.RfqzReader(str(q))
    with pytest.raises(rfqz.RfqzFormatError):
        while r.read(65536):
            pass


def test_short_file_clean_error(tmp_path):
    p = tmp_path / "tiny.rfqz"
    p.write_bytes(b"RFQZ")  # magic but no version byte
    with pytest.raises(rfqz.RfqzFormatError):
        rfqz.RfqzReader(str(p))


def test_reader_streams_from_pipe_like(tmp_path):
    """RfqzReader over a non-seekable stream object (read-only), pulling
    compressed bytes incrementally."""
    class OneByteAtATime:
        def __init__(self, raw):
            self.raw = raw
            self.i = 0

        def read(self, k=-1):
            if self.i >= len(self.raw):
                return b""
            step = min(k if k > 0 else 1 << 20, 7777)
            out = self.raw[self.i : self.i + step]
            self.i += len(out)
            return out

    data = _skewed(150_000, seed=13).tobytes()
    p = tmp_path / "s.rfqz"
    w = rfqz.RfqzWriter(str(p), block_size=32 * 1024, lanes=64)
    w.write(data)
    w.close()
    r = rfqz.RfqzReader(OneByteAtATime(p.read_bytes()))
    got = bytearray()
    while True:
        b = r.read(12_345)
        if not b:
            break
        got += b
    assert bytes(got) == data


def test_decode_section_truncated_header_raises():
    """ADVICE r1 (high): a 1-byte buffer must raise RansTruncated, not
    misparse n=0 from a short slice and claim 11 bytes consumed."""
    with pytest.raises(R.RansTruncated):
        R.decode_section(b"\x00", 0)
    # every strict prefix of a real section must be truncated-or-decoded,
    # never a silent short/garbled success
    data = _skewed(5000, seed=21).tobytes()
    sec = R.encode_section(data, order=0, lanes=8)
    for cut in [0, 1, 3, 6, 7, 10, len(sec) // 2, len(sec) - 1]:
        with pytest.raises((R.RansTruncated, IndexError)):
            R.decode_section(sec[:cut], 0)
    out, end = R.decode_section(sec, 0)
    assert out == data and end == len(sec)


def test_decode_section_zero_lanes_rejected():
    """ADVICE r1: lanes=0 with n>0 must be a clean ValueError, not a
    ZeroDivisionError escaping the reader's retry classification."""
    bad = bytes([0]) + (100).to_bytes(4, "little") + (0).to_bytes(2, "little")
    # order-0 table for a single symbol then empty payload tables
    bad += bytes([0, 65]) + R.SCALE.to_bytes(2, "little")
    bad += (0).to_bytes(4, "little")
    with pytest.raises(ValueError) as ei:
        R.decode_section(bad, 0)
    assert not isinstance(ei.value, R.RansTruncated)


def test_reader_one_byte_section_boundary(tmp_path):
    """ADVICE r1 (high): force the reader's refill boundary to land with
    exactly 1 byte of the next section buffered — the stream must still
    decode losslessly (previously desynced and dropped a section)."""
    data = _skewed(300_000, seed=22).tobytes()
    p = tmp_path / "b.rfqz"
    w = rfqz.RfqzWriter(str(p), block_size=64 * 1024, lanes=64)
    w.write(data)
    w.close()
    raw = p.read_bytes()

    # find the first section boundary after the 5-byte container header and
    # serve reads so a fetch ends exactly 1 byte past it
    mv = memoryview(raw)
    _, end = rfqz.decode_block(mv[5:], 0)
    split = 5 + end + 1

    class TwoPhase:
        def __init__(self):
            self.i = 0

        def read(self, k=-1):
            if self.i >= len(raw):
                return b""
            stop = split if self.i < split else len(raw)
            out = raw[self.i : min(self.i + (k if k > 0 else 1 << 30), stop)]
            self.i += len(out)
            return out

    r = rfqz.RfqzReader(TwoPhase())
    got = bytearray()
    while True:
        b = r.read(50_000)
        if not b:
            break
        got += b
    assert bytes(got) == data


def _coverage_reads(n_reads=3000, glen=200_000, seed=5):
    """Packed 2-bit reads sampled from a shared genome (cross-read
    redundancy the LZ stage exists for)."""
    from repaq_tpu.codec import kernels_np as K

    rng = np.random.default_rng(seed)
    genome = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=glen)
    bases = np.concatenate(
        [genome[s : s + 150] for s in rng.integers(0, glen - 151, n_reads)]
    )
    return K.pack_2bit(bases)


def test_seqlz_mode_roundtrip_and_wins():
    packed = _coverage_reads()
    rec = rfqz.encode_block(packed, label="seq")
    assert rec[0] == rfqz.MODE_SEQLZ, "seq coverage data must pick seq-LZ"
    out, end = rfqz.decode_block(memoryview(rec), 0)
    assert out == packed.tobytes() and end == len(rec)
    assert len(rec) < 0.8 * len(packed)
    # plain rANS would have stored this almost raw
    plain = rfqz.encode_block(packed, label="coords")
    assert len(rec) < len(plain)


def test_bytelz_mode_roundtrip():
    rng = np.random.default_rng(1)
    base = rng.integers(0, 255, 4096).astype(np.uint8)
    data = np.concatenate(
        [base[rng.integers(0, 3000) :][:700] for _ in range(200)]
    )
    rec = rfqz.encode_block(data, label="tail")
    assert rec[0] == rfqz.MODE_LZ
    out, end = rfqz.decode_block(memoryview(rec), 0)
    assert out == data.tobytes() and end == len(rec)


def test_lz_incompressible_falls_back():
    rng = np.random.default_rng(2)
    data = rng.integers(0, 255, 200_000).astype(np.uint8)
    rec = rfqz.encode_block(data, label="seq")
    assert rec[0] != rfqz.MODE_SEQLZ  # no matches -> rANS/store candidate


def test_lz_container_stream_roundtrip(tmp_path):
    """Full RfqzWriter/RfqzReader with labeled segments incl. an LZ-coded
    seq stream, streamed back through the incremental reader."""
    packed = _coverage_reads(seed=9)
    other = _skewed(150_000, seed=10)
    p = tmp_path / "lz.rfqz"
    w = rfqz.RfqzWriter(str(p))
    w.write_segments([("seq", packed.tobytes()), ("qual", other.tobytes())])
    w.close()
    r = rfqz.RfqzReader(str(p))
    got = bytearray()
    while True:
        b = r.read(37_777)
        if not b:
            break
        got += b
    assert bytes(got) == packed.tobytes() + other.tobytes()


def test_lz_corrupt_sections_clean_errors(tmp_path):
    packed = _coverage_reads(seed=11)
    rec = bytearray(rfqz.encode_block(packed, label="seq"))
    assert rec[0] == rfqz.MODE_SEQLZ
    import pytest as _pytest

    # flip bytes across the record; decode must raise cleanly, never crash
    for pos in (5, 9, 13, 20, len(rec) // 2, len(rec) - 2):
        bad = bytearray(rec)
        bad[pos] ^= 0x55
        try:
            out, _ = rfqz.decode_block(memoryview(bytes(bad)), 0)
            # silent success is fine only if it roundtrips identically
            # (flips in dead padding); otherwise it must have raised
        except (ValueError, rfqz.RfqzFormatError, IndexError):
            continue


def test_seqlz_cross_section_history():
    """MODE_SEQLZ history dictionary: a section whose redundancy lives
    entirely in the PREVIOUS section must still find matches (and shrink),
    and decode must reproduce it by mirroring the encoder's history. Also
    covers the shard-boundary property: decoding with MORE history than
    the encoder had is byte-safe (backward distances)."""
    import numpy as np

    from repaq_tpu.codec import _native, kernels_np as K
    from repaq_tpu.format import rfqz

    if not _native.available():
        import pytest

        pytest.skip("native LZ required")
    rng = np.random.default_rng(11)
    genome = rng.integers(0, 4, 300_000).astype(np.uint8)
    base = np.frombuffer(b"GATC", np.uint8)

    def reads(k):
        parts = [genome[rng.integers(0, 299_000):][:500] for _ in range(k)]
        return base[np.concatenate(parts)]

    sec1 = K.pack_2bit(reads(1200))  # ~600 KB bases -> section 1
    sec2 = K.pack_2bit(reads(1200))  # same genome: matches only via hist

    # no history: each section fends for itself
    solo2 = rfqz.encode_block(sec2, label="seq")
    h = rfqz.SeqLzHistory()
    rec1 = rfqz.encode_block(sec1, label="seq", seq_hist=h)
    rec2 = rfqz.encode_block(sec2, label="seq", seq_hist=h)
    assert rec1[0] == rfqz.MODE_SEQLZ
    assert rec2[0] == rfqz.MODE_SEQLZ
    assert len(rec2) < len(solo2) * 0.9, (len(rec2), len(solo2))

    hd = rfqz.SeqLzHistory()
    out1, end1 = rfqz.decode_block(memoryview(rec1), 0, seq_hist=hd)
    out2, _ = rfqz.decode_block(memoryview(rec2), 0, seq_hist=hd)
    assert out1 == sec1.tobytes()
    assert out2 == sec2.tobytes()

    # shard boundary: rec2' encoded with EMPTY history decodes fine under
    # a reader that carries section-1 history
    rec2_solo = rfqz.encode_block(sec2, label="seq",
                                  seq_hist=rfqz.SeqLzHistory())
    hd2 = rfqz.SeqLzHistory()
    rfqz.decode_block(memoryview(rec1), 0, seq_hist=hd2)
    out2b, _ = rfqz.decode_block(memoryview(rec2_solo), 0, seq_hist=hd2)
    assert out2b == sec2.tobytes()


def test_seqlz_history_decode_without_native(monkeypatch):
    """Decode must work everywhere (ADVICE r3 high): an archive whose
    second MODE_SEQLZ section matches into the first via the history
    dictionary must decode with the native library unavailable —
    SeqLzHistory.bases() has to fall back to kernels_np.unpack_2bit."""
    import numpy as np

    from repaq_tpu.codec import _native, kernels_np as K
    from repaq_tpu.format import rfqz

    if not _native.available():
        pytest.skip("native LZ required to ENCODE the fixture")
    rng = np.random.default_rng(23)
    genome = rng.integers(0, 4, 300_000).astype(np.uint8)
    base = np.frombuffer(b"GATC", np.uint8)

    def reads(k):
        parts = [genome[rng.integers(0, 299_000):][:500] for _ in range(k)]
        return base[np.concatenate(parts)]

    sec1 = K.pack_2bit(reads(1200))
    sec2 = K.pack_2bit(reads(1200))
    h = rfqz.SeqLzHistory()
    rec1 = rfqz.encode_block(sec1, label="seq", seq_hist=h)
    rec2 = rfqz.encode_block(sec2, label="seq", seq_hist=h)
    assert rec1[0] == rfqz.MODE_SEQLZ and rec2[0] == rfqz.MODE_SEQLZ

    monkeypatch.setattr(_native, "available", lambda: False)
    hd = rfqz.SeqLzHistory()
    out1, _ = rfqz.decode_block(memoryview(rec1), 0, seq_hist=hd)
    out2, _ = rfqz.decode_block(memoryview(rec2), 0, seq_hist=hd)
    assert out1 == sec1.tobytes()
    assert out2 == sec2.tobytes()


@pytest.mark.parametrize("nsym,base", [(4, 65), (16, 33), (16, 0), (24, 1)])
def test_device_order1_compact_variants(nsym, base):
    """The order-1 compare-select path (alphabet <= 16, with and without
    byte 0 in the alphabet — the initial context is the literal byte 0)
    and the >16 gather fallback must all match the host bytes."""
    from repaq_tpu.ops import rans_device as D

    rng = np.random.default_rng(nsym * 131 + base)
    n, lanes = 48 * 256, 32
    # markov-ish: strong context dependence exercises per-context tables
    syms = (base + np.arange(nsym)).astype(np.uint8)
    state = 0
    out = np.empty(n, np.uint8)
    r = rng.random(n)
    for i in range(n):
        state = (state + (1 if r[i] < 0.3 else 0)) % nsym
        out[i] = syms[state]
    data = out.tobytes()
    enc = R.encode_section(data, order=1, lanes=lanes)
    dec, off = D.decode_section_device(enc)
    assert dec == data and off == len(enc)
