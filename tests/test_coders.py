"""Property tests for the token coders in the scalar oracle."""

import random
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

import pytest

from repaq_tpu.codec import oracle
from repaq_tpu.format.header import RfqHeader
from repaq_tpu.meta import parse_name


def test_pack_unpack_roundtrip():
    random.seed(1)
    for _ in range(50):
        n = random.randint(0, 300)
        seq = bytes(random.choice(b"GATC") for _ in range(n))
        packed = oracle.pack_bases_2bit(seq)
        assert len(packed) == (n + 3) // 4
        assert bytes(oracle.unpack_bases_2bit(packed, n)) == seq


def test_pack_n_as_zero():
    assert oracle.pack_bases_2bit(b"N") == oracle.pack_bases_2bit(b"G")


@pytest.mark.parametrize("density", [0.0, 0.01, 0.3, 0.9, 1.0])
def test_single_qual_stream_roundtrip(density):
    random.seed(int(density * 100) + 3)
    for trial in range(20):
        n = random.randint(1, 2000)
        qual = bytearray(
            ord("X") if random.random() < density else ord("Y") for _ in range(n)
        )
        enc = oracle.encode_single_qual_by_col(bytes(qual), ord("X"))
        dec = bytearray(b"Y" * n)
        oracle.decode_single_qual_by_col(enc, ord("X"), dec)
        assert dec == qual


def test_single_qual_long_gaps():
    # exercise the 2-byte and 4-byte gap tokens
    for gap in [127, 128, 129, 16384, 16385, 100000]:
        qual = bytearray(b"." * (gap + 2))
        qual[gap] = ord("X")
        qual[gap + 1] = ord("X")
        enc = oracle.encode_single_qual_by_col(bytes(qual), ord("X"))
        dec = bytearray(b"." * len(qual))
        oracle.decode_single_qual_by_col(enc, ord("X"), dec)
        assert dec == qual


def test_run_token_only_after_position_one():
    # positions 0,1 adjacent but cur>1 fails -> two 1-byte gaps
    enc = oracle.encode_single_qual_by_col(b"XXY", ord("X"))
    assert enc == b"\x00\x00"
    # positions 1,2: second is adjacent and cur>1 -> gap then run of 1
    enc = oracle.encode_single_qual_by_col(b"YXXY", ord("X"))
    assert enc == b"\x01\xc0"
    # long run splits at 32
    enc = oracle.encode_single_qual_by_col(b"Y" + b"X" * 40, ord("X"))
    assert enc == b"\x01" + bytes([0xC0 | 31]) + bytes([0xC0 | 6])


def test_coords_roundtrip():
    random.seed(11)
    for _ in range(30):
        n = random.randint(0, 500)
        vals = []
        last = 1000
        for _ in range(n):
            r = random.random()
            if r < 0.3:
                vals.append(last)
            elif r < 0.6:
                last = last + random.randint(1, 64)
                vals.append(last)
            else:
                last = random.randint(0, (1 << 21) - 1)
                vals.append(last)
        enc = oracle.encode_coords(vals)
        assert oracle.decode_coords(enc, n) == vals


def test_coords_over_2m_rejected():
    with pytest.raises(Exception):
        oracle.encode_coords([1 << 21])


def test_overlap_search():
    r1 = b"ACGTACGTACGTACGTACGT"
    # forward: r2 starts with r1's 12-suffix
    r2 = r1[-12:] + b"TTTTTTTT"
    assert oracle.overlap(r1, r2) == 12
    # backward: r2 ends with r1's 12-prefix
    r2 = b"GGGGGGGG" + r1[:12]
    assert oracle.overlap(r1, r2) == -12
    # identical reads overlap fully forward at first o where suffix==prefix
    assert oracle.overlap(r1, r1) > 0
    assert oracle.overlap(r1, b"T" * 20) == 0


def test_reverse_complement():
    assert oracle.reverse_complement(b"ACGTN") == b"NACGT"
    assert oracle.reverse_complement(b"AAAA") == b"TTTT"


def test_meta_parse_reference_case():
    m = parse_name(b"@A00251:28:H3YV7DSXX:40:1101:2356:1000 1:N:0:TAAGTGGC")
    assert m.name_part1 == b"@A00251:28:H3YV7DSXX"
    assert (m.lane, m.tile, m.x, m.y) == (40, 1101, 2356, 1000)
    assert m.name_part2 == b" 1:N:0:TAAGTGGC"
    assert m.has_lane_tile_xy


def test_meta_parse_non_illumina():
    m = parse_name(b"@V300026370L1C001R0010000123/1")
    assert not m.has_lane_tile_xy
    assert m.name_part1 == b"@V300026370L1C001R0010000123/1"


def test_meta_parse_seven_colons():
    # y parsed from field 7, name2 begins at the 7th colon (inclusive)
    m = parse_name(b"@a:b:c:1:2:3:4:rest")
    assert m.has_lane_tile_xy
    assert (m.lane, m.tile, m.x, m.y) == (1, 2, 3, 4)
    assert m.name_part2 == b":rest"


def test_meta_parse_six_colons_no_space():
    # no break event -> not illumina (reference quirk)
    m = parse_name(b"@a:b:c:1:2:3:4")
    assert not m.has_lane_tile_xy


def test_qual_runlen_roundtrip():
    random.seed(5)
    header = RfqHeader()
    header.qual_bins = 4
    header.qual_buf = bytes([70, 58, 44, 35])
    header._make_qual_bit_table()
    for _ in range(20):
        n = random.randint(1, 500)
        qual = bytes(random.choice(header.qual_buf) for _ in range(n))
        enc = oracle.encode_qual_runlen(header, qual)
        dec = bytearray(n)
        oracle.decode_qual_runlen(header, enc, dec)
        assert bytes(dec) == qual


def test_lz_parse_thread_invariance():
    """The windowed MT parse must emit byte-identical token streams for
    any REPAQ_LZ_THREADS (the window structure, not the schedule, defines
    the output)."""
    import os
    import subprocess
    import sys

    prog = (
        "import sys; sys.path.insert(0, %r)\n"
        "import numpy as np\n"
        "from repaq_tpu.codec import _native\n"
        "if not _native.available():\n"
        "    print('skip'); raise SystemExit\n"
        "rng = np.random.default_rng(3)\n"
        "g = rng.integers(0, 4, 400_000).astype(np.uint8)\n"
        "parts = [g[rng.integers(0, 399_000):][:1000].copy()"
        " for _ in range(900)]\n"
        "data = np.concatenate(parts)\n"
        "ll, ml, dd = _native.lz_parse(data, 24)\n"
        "import hashlib\n"
        "print(hashlib.sha256(ll.tobytes()+ml.tobytes()+dd.tobytes())"
        ".hexdigest())\n" % str(REPO)
    )
    outs = set()
    for t in ("1", "3", "8"):
        r = subprocess.run(
            [sys.executable, "-c", prog],
            env=dict(os.environ, REPAQ_LZ_THREADS=t, JAX_PLATFORMS="cpu"),
            capture_output=True, text=True, timeout=120,
        )
        assert r.returncode == 0, r.stderr[-1000:]
        outs.add(r.stdout.strip())
    assert len(outs) == 1, outs


def test_qualcol_decode_counts_corrupt_sentinel():
    """Length-corrupt by-col qual streams must return None (ADVICE r3):
    callers route those chunks to the host decoder, which raises, instead
    of proceeding with tiny caps and emitting wrong bytes."""
    import numpy as np

    from repaq_tpu.codec import kernels_np as K

    qual = np.full(400, 70, dtype=np.uint8)
    qual[7] = 71
    bins = np.array([71], dtype=np.uint8)
    enc = K.encode_qual_by_col(qual, bins, 70)
    assert K.qualcol_decode_counts(enc, 1) is not None
    # truncated lens prefix
    assert K.qualcol_decode_counts(enc[:2], 1) is None
    # bin-stream lengths overrun the buffer
    bad = enc.copy()
    bad[:4] = np.frombuffer((1 << 24).to_bytes(4, "little"), np.uint8)
    assert K.qualcol_decode_counts(bad, 1) is None


def test_qual_runlen_vectorized_matches_oracle():
    """kernels_np.decode_qual_runlen (VERDICT r3 #7: the last pure-Python
    hot path) must be byte-exact with the oracle across bin counts and
    run shapes, including the buffer-reiteration quirk."""
    import numpy as np

    from repaq_tpu.codec import kernels_np as K

    random.seed(9)
    for bins in (2, 3, 4, 7, 13):
        header = RfqHeader()
        header.qual_bins = bins
        header.qual_buf = bytes(range(70, 70 + bins))
        header._make_qual_bit_table()
        for trial in range(30):
            n = random.randint(1, 800)
            if trial % 3 == 0:  # long same-qual runs stress the counts
                qual = b"".join(
                    bytes([random.choice(header.qual_buf)])
                    * random.randint(1, 90)
                    for _ in range(10)
                )[:n]
                qual = qual + bytes([header.qual_buf[0]]) * (n - len(qual))
            else:
                qual = bytes(
                    random.choice(header.qual_buf) for _ in range(n)
                )
            enc = oracle.encode_qual_runlen(header, qual)
            dec = bytearray(n)
            oracle.decode_qual_runlen(header, enc, dec)
            got = K.decode_qual_runlen(
                np.frombuffer(enc, dtype=np.uint8),
                header.bit2qual,
                header.major_qual_num_bits(),
                header.normal_qual_num_bits,
                n,
            )
            assert got.tobytes() == bytes(dec), (bins, trial)


def test_quality_scan_native_matches_numpy():
    """format/header.quality_stats: the fused native pass and the numpy
    sweeps must produce the identical stats dict (including the invalid-
    char classification, N-quality relations and >=128 zeroing)."""
    import numpy as np

    from repaq_tpu.codec import _native
    from repaq_tpu.format import header as H

    if not _native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGTN", np.uint8)
    quals = np.frombuffer(b"F:,#ab", np.uint8)
    for trial in range(120):
        n = int(rng.integers(0, 3000))
        seq = rng.choice(bases, p=[0.3, 0.3, 0.2, 0.19, 0.01], size=n)
        qual = rng.choice(quals, size=n)
        if trial % 7 == 3 and n:
            seq[rng.integers(0, n)] = ord("x")
        if trial % 11 == 5 and n:
            seq[rng.integers(0, n)] = ord("a")
        if trial % 13 == 7 and n:
            qual[rng.integers(0, n)] = 200
        if trial % 5 == 1 and n:  # constant-qual N runs hit the
            qual[:] = ord("F")    # nonn_after_matches branch
        got = H.quality_stats(seq, qual)
        avail = _native.available
        _native.available = lambda: False
        try:
            want = H.quality_stats(seq, qual)
        finally:
            _native.available = avail
        for k in want:
            same = (np.array_equal(got[k], want[k])
                    if isinstance(want[k], np.ndarray) else got[k] == want[k])
            assert same, (trial, k, got[k], want[k])
