"""Randomized equivalence: vectorized codec vs the scalar oracle."""

import random

import numpy as np
import pytest

from repaq_tpu.codec import kernels_np as K
from repaq_tpu.codec import oracle, vectorized
from repaq_tpu.codec.blocks import ReadBlock, lens_to_offsets
from repaq_tpu.codec.names import parse_names
from repaq_tpu.meta import parse_name


def _random_reads(rng, n, illumina=True, n_frac=0.0, var_len=False, quals="FF:,:F"):
    reads = []
    for i in range(n):
        L = rng.randint(50, 160) if var_len else 100
        seq = []
        q = []
        for _ in range(L):
            if rng.random() < n_frac:
                seq.append("N")
                q.append("#")
            else:
                seq.append(rng.choice("ACGT"))
                q.append(rng.choice(quals))
        if illumina:
            name = "@A00:1:FC:%d:%d:%d:%d 1:N:0:ACGT" % (
                rng.randint(1, 8),
                rng.randint(1000, 2000),
                rng.randint(0, 40000),
                rng.randint(0, 40000),
            )
        else:
            name = "@BGI%08d/1" % i
        reads.append(
            oracle.FastqRead(
                name.encode(), "".join(seq).encode(), b"+", "".join(q).encode()
            )
        )
    return reads


def _random_pairs(rng, n, overlap_frac=0.5):
    comp = {"A": "T", "T": "A", "C": "G", "G": "C"}
    pairs = []
    for i in range(n):
        x, y = rng.randint(0, 40000), rng.randint(0, 40000)
        L = 100
        s1 = "".join(rng.choice("ACGT") for _ in range(L))
        if rng.random() < overlap_frac:
            o = rng.randint(12, L)
            rc = "".join(comp[c] for c in reversed(s1[-o:]))
            s2 = rc + "".join(rng.choice("ACGT") for _ in range(L - o))
            s2 = "".join(comp[c] for c in reversed(s2))
        else:
            s2 = "".join(rng.choice("ACGT") for _ in range(L))
        q1 = "".join(rng.choice("FF:,:F") for _ in range(L))
        q2 = "".join(rng.choice("FF:,:F") for _ in range(L))
        n1 = b"@A00:1:FC:4:%d:%d:%d 1:N:0:ACGT" % (1101, x, y)
        n2 = b"@A00:1:FC:4:%d:%d:%d 2:N:0:ACGT" % (1101, x, y)
        pairs.append(
            (
                oracle.FastqRead(n1, s1.encode(), b"+", q1.encode()),
                oracle.FastqRead(n2, s2.encode(), b"+", q2.encode()),
            )
        )
    return pairs


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize(
    "kind", ["illumina", "bgi", "nfrac", "varlen", "manyq"]
)
def test_se_encode_equivalence(seed, kind):
    rng = random.Random(seed * 131 + hash(kind) % 1000)
    kwargs = {}
    if kind == "bgi":
        kwargs = dict(illumina=False)
    elif kind == "nfrac":
        kwargs = dict(n_frac=0.08)
    elif kind == "varlen":
        kwargs = dict(var_len=True)
    elif kind == "manyq":
        kwargs = dict(quals="".join(chr(33 + i) for i in range(70)))
    reads = _random_reads(rng, 150, **kwargs)

    h1 = oracle.make_header_se(reads)
    h2 = vectorized.make_header_se(ReadBlock.from_reads(reads))
    assert h1.to_bytes() == h2.to_bytes()

    c1 = oracle.encode_chunk(h1, reads, False)
    c2 = vectorized.encode_chunk(h2, ReadBlock.from_reads(reads), False)
    assert c1.to_bytes() == c2.to_bytes()

    d1 = oracle.decode_chunk(h1, c1)
    d2 = vectorized.decode_chunk(h2, c2).to_reads()
    assert [(r.name, r.seq, r.strand, r.qual) for r in d1] == [
        (r.name, r.seq, r.strand, r.qual) for r in d2
    ]
    for got, want in zip(d1, reads):
        assert (got.name, got.seq, got.strand, got.qual) == (
            want.name,
            want.seq,
            want.strand,
            want.qual,
        )


@pytest.mark.parametrize("seed", range(6))
def test_pe_encode_equivalence(seed):
    rng = random.Random(seed * 733 + 5)
    pairs = _random_pairs(rng, 120)
    h1 = oracle.make_header_pe(pairs)
    reads = []
    for a, b in pairs:
        reads.append(a)
        reads.append(b)
    h2 = vectorized.make_header_pe(ReadBlock.from_reads(reads))
    assert h1.to_bytes() == h2.to_bytes()
    assert h1.support_interleaved == h2.support_interleaved

    c1 = oracle.encode_chunk_pe(h1, pairs)
    c2 = vectorized.encode_chunk(h2, ReadBlock.from_reads(reads), True)
    assert c1.to_bytes() == c2.to_bytes()

    d1 = oracle.decode_chunk(h1, c1)
    d2 = vectorized.decode_chunk(h2, c2).to_reads()
    assert [(r.name, r.seq, r.qual) for r in d1] == [
        (r.name, r.seq, r.qual) for r in d2
    ]


def test_pe_degraded_interleave_equivalence():
    """Pairs violating the interleave invariants mid-chunk: degradation
    point semantics must match the oracle exactly."""
    rng = random.Random(77)
    for breaker in ["name2", "xy", "both", "name2_first_pair"]:
        pairs = _random_pairs(rng, 40, overlap_frac=0.3)
        if breaker in ("name2", "both"):
            r1, r2 = pairs[17]
            pairs[17] = (
                r1,
                oracle.FastqRead(
                    r2.name.replace(b" 2:N:0", b" 9:Z:9"), r2.seq, r2.strand, r2.qual
                ),
            )
        if breaker in ("xy", "both"):
            r1, r2 = pairs[9]
            pairs[9] = (
                r1,
                oracle.FastqRead(
                    r2.name.replace(b":1101:", b":1102:"), r2.seq, r2.strand, r2.qual
                ),
            )
        if breaker == "name2_first_pair":
            r1, r2 = pairs[0]
            pairs[0] = (
                r1,
                oracle.FastqRead(
                    r2.name.replace(b" 2:N", b" 2:X"), r2.seq, r2.strand, r2.qual
                ),
            )
        h1 = oracle.make_header_pe(pairs)
        reads = []
        for a, b in pairs:
            reads.append(a)
            reads.append(b)
        h2 = vectorized.make_header_pe(ReadBlock.from_reads(reads))
        assert h1.to_bytes() == h2.to_bytes(), breaker
        h2.support_interleaved = h1.support_interleaved
        c1 = oracle.encode_chunk_pe(h1, pairs)
        c2 = vectorized.encode_chunk(h2, ReadBlock.from_reads(reads), True)
        assert c1.to_bytes() == c2.to_bytes(), breaker
        d2 = vectorized.decode_chunk(h2, c2).to_reads()
        want = [x for p in pairs for x in p]
        assert [(r.name, r.seq, r.qual) for r in d2] == [
            (r.name, r.seq, r.qual) for r in want
        ], breaker


def test_pe_degraded_mid_chunk_via_forced_header():
    """Header says interleavable (from chunk 1) but a later chunk violates
    it -> per-chunk degradation path."""
    rng = random.Random(31)
    pairs = _random_pairs(rng, 30)
    h = oracle.make_header_pe(pairs)
    assert h.support_interleaved
    bad = _random_pairs(rng, 30)
    r1, r2 = bad[5]
    bad[5] = (
        r1,
        oracle.FastqRead(r2.name.replace(b":1101:", b":7:"), r2.seq, r2.strand, r2.qual),
    )
    reads = [x for p in bad for x in p]
    c1 = oracle.encode_chunk_pe(h, bad)
    c2 = vectorized.encode_chunk(h, ReadBlock.from_reads(reads), True)
    assert c1.to_bytes() == c2.to_bytes()


def test_overlap_pairs_matches_oracle():
    rng = np.random.default_rng(4)
    p, L = 300, 120
    r1 = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(p, L))
    r2 = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(p, L))
    # plant forward overlaps
    for i in range(0, p, 3):
        o = int(rng.integers(12, L + 1))
        r2[i, :o] = r1[i, L - o :]
    # plant backward overlaps
    for i in range(1, p, 3):
        o = int(rng.integers(12, L + 1))
        r2[i, L - o :] = r1[i, :o]
    got = vectorized._overlap_pairs(r1, r2)
    for i in range(p):
        assert got[i] == oracle.overlap(r1[i].tobytes(), r2[i].tobytes()), i


def test_block_to_fastq_bytes():
    rng = random.Random(2)
    reads = _random_reads(rng, 50, var_len=True)
    block = ReadBlock.from_reads(reads)
    assert block.to_fastq_bytes() == b"".join(r.to_fastq() for r in reads)


def test_parse_names_block_fuzz():
    rng = random.Random(12)
    alph = b"@ABC:0123456789 /x-+"
    names = [
        bytes(rng.choice(alph) for _ in range(rng.randint(0, 50))) for _ in range(500)
    ]
    lens = np.array([len(c) for c in names], dtype=np.int64)
    flat = np.frombuffer(b"".join(names), dtype=np.uint8)
    off = lens_to_offsets(lens)
    res = parse_names(flat, off)
    for i, c in enumerate(names):
        m = parse_name(c)
        assert bool(res["illumina"][i]) == m.has_lane_tile_xy, c
        if m.has_lane_tile_xy:
            assert (
                int(res["lane"][i]),
                int(res["tile"][i]),
                int(res["x"][i]),
                int(res["y"][i]),
            ) == (m.lane, m.tile, m.x, m.y), c
        s, ln = int(res["name1_start"][i]), int(res["name1_len"][i])
        assert flat[s : s + ln].tobytes() == m.name_part1, c
        s, ln = int(res["name2_start"][i]), int(res["name2_len"][i])
        assert flat[s : s + ln].tobytes() == m.name_part2, c


def test_parse_names_native_equals_numpy():
    """The native batch parser and the numpy event algebra must agree on
    every field for adversarial name shapes."""
    from repaq_tpu.codec import _native
    from repaq_tpu.codec import names as N

    if not _native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = random.Random(77)
    alph = b"@ABC:0123456789 /x-+::  "
    cases = [
        bytes(rng.choice(alph) for _ in range(rng.randint(0, 60)))
        for _ in range(2000)
    ] + [
        b"@A00251:28:H3YV7DSXX:4:1101:5284:1000 1:N:0:TAAGTGGC",
        b"@a:b:c:d:5:6 tail",
        b"@a:b:c:d:5:6:7:8:9",
        b"@::::::",
        b"@x y",
        b"",
        b"@a:b:c:-99999999999999999999:5:6:7 z",
    ]
    lens = np.array([len(c) for c in cases], dtype=np.int64)
    flat = np.frombuffer(b"".join(cases), dtype=np.uint8)
    off = lens_to_offsets(lens)
    got = N.parse_names(flat, off)  # native path
    # force the numpy algebra
    import unittest.mock as mock

    with mock.patch.object(_native, "available", lambda: False):
        want = N.parse_names(flat, off)
    for k in got:
        assert np.array_equal(
            np.asarray(got[k], dtype=np.int64),
            np.asarray(want[k], dtype=np.int64),
        ), k


@pytest.mark.parametrize("seed", range(3))
def test_legacy_runlen_chunk_decode(seed):
    """v1-era containers use run-length quality (by-col flag clear):
    vectorized.decode_chunk must take the kernels_np.decode_qual_runlen
    path and agree with the oracle byte-for-byte (VERDICT r3 #7)."""
    from repaq_tpu.constants import BIT_ENCODE_QUAL_BY_COL

    rng = random.Random(seed * 97 + 3)
    reads = _random_reads(rng, 120)
    h1 = oracle.make_header_se(reads)
    h2 = vectorized.make_header_se(ReadBlock.from_reads(reads))
    for h in (h1, h2):
        h.flags &= ~BIT_ENCODE_QUAL_BY_COL
    assert not h1.encode_qual_by_col()

    c1 = oracle.encode_chunk(h1, reads, False)
    c2 = vectorized.encode_chunk(h2, ReadBlock.from_reads(reads), False)
    assert c1.to_bytes() == c2.to_bytes()
    d1 = oracle.decode_chunk(h1, c1)
    d2 = vectorized.decode_chunk(h2, c2).to_reads()
    assert [(r.seq, r.qual) for r in d1] == [(r.seq, r.qual) for r in d2]
    for got, want in zip(d2, reads):
        assert (got.seq, got.qual) == (want.seq, want.qual)


def test_to_fastq_buf_subset_matches_take():
    """Native one-pass FASTQ assembly (all reads and even/odd subsets)
    must equal the take()+scatter fallback byte-for-byte."""
    from repaq_tpu.codec import _native

    rng = random.Random(9)
    reads = _random_reads(rng, 97, var_len=True)
    block = ReadBlock.from_reads(reads)
    want_all = b"".join(r.to_fastq() for r in reads)
    assert block.to_fastq_buf().tobytes() == want_all
    idx = np.arange(block.n)
    for sel in (idx[0::2], idx[1::2], idx[: block.n // 3]):
        want = b"".join(reads[i].to_fastq() for i in sel.tolist())
        assert block.to_fastq_buf(sel).tobytes() == want
    if _native.available():
        avail = _native.available
        _native.available = lambda: False
        try:
            assert block.to_fastq_buf(idx[1::2]).tobytes() == b"".join(
                reads[i].to_fastq() for i in idx[1::2].tolist()
            )
        finally:
            _native.available = avail


def test_format_names_native_matches_numpy():
    """codec/names.build_names: native format_names and the numpy digit
    matrix must produce identical (flat, offsets) for every field-presence
    combination."""
    import numpy as np

    from repaq_tpu.codec import _native, names as N

    if not _native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    for trial in range(40):
        n = int(rng.integers(1, 200))
        n1 = [bytes(rng.integers(33, 90, size=int(rng.integers(1, 30)))
                    .astype(np.uint8)) for _ in range(n)]
        n1_flat = np.frombuffer(b"".join(n1), dtype=np.uint8)
        n1_lens = np.array([len(b) for b in n1], dtype=np.int64)
        n1_starts = np.concatenate([[0], np.cumsum(n1_lens)[:-1]])
        with_fields = trial % 3 != 0
        lane = tile = x = y = None
        if with_fields:
            lane = rng.integers(0, 9, size=n)
            tile = rng.integers(0, 30000, size=n)
            x = rng.integers(0, 1 << 21, size=n)
            y = rng.integers(0, 1 << 21, size=n)
        n2_flat = n2_starts = n2_lens = None
        if trial % 2:
            n2 = [bytes(rng.integers(33, 90, size=int(rng.integers(0, 12)))
                        .astype(np.uint8)) for _ in range(n)]
            n2_flat = np.frombuffer(b"".join(n2), dtype=np.uint8)
            n2_lens = np.array([len(b) for b in n2], dtype=np.int64)
            n2_starts = np.concatenate([[0], np.cumsum(n2_lens)[:-1]])
        args = (n, n1_flat, n1_starts, n1_lens, lane, tile, x, y,
                n2_flat, n2_starts, n2_lens)
        got_f, got_o = N.build_names(*args)
        avail = _native.available
        _native.available = lambda: False
        try:
            want_f, want_o = N.build_names(*args)
        finally:
            _native.available = avail
        assert got_f.tobytes() == want_f.tobytes(), trial
        assert np.array_equal(got_o, want_o), trial
