"""Golden byte-identity tests against reference-encoded .rfq files."""

import pytest

from repaq_tpu import pipeline

SE_CASES = [
    # (input, golden, chunk_kb)
    ("se_illumina.fq", "se_illumina.ref.rfq", 1000),
    ("se_bgi.fq", "se_bgi.ref.rfq", 1000),
    ("se_nonl.fq", "se_nonl.ref.rfq", 1000),
    ("se_varlen.fq", "se_varlen.ref.rfq", 1000),
    ("se_big.fq", "se_big.ref.k100.rfq", 100),
    ("se_manyq.fq", "se_manyq.ref.k100.rfq", 100),
    ("se_fewn.fq", "se_fewn.ref.k100.rfq", 100),
]

PE_CASES = [
    ("pe_R1.fq", "pe_R2.fq", "pe.ref.rfq", 1000),
    ("pe_big_R1.fq", "pe_big_R2.fq", "pe_big.ref.k100.rfq", 100),
    # N bases inside overlap regions with <100 Ns total: the N-position
    # stream is recorded against the truncated (overlap-elided) sequence
    ("pe_nov_R1.fq", "pe_nov_R2.fq", "pe_nov.ref.rfq", 1000),
]

ENGINES = ["oracle", "vectorized"]


def _engine(name):
    return pipeline.get_engine(name)


@pytest.mark.parametrize("engine_name", ENGINES)
@pytest.mark.parametrize("fq,golden,kb", SE_CASES)
def test_se_encode_matches_reference(fixtures_dir, tmp_path, fq, golden, kb, engine_name):
    out = tmp_path / "out.rfq"
    pipeline.compress_se(
        str(fixtures_dir / fq), str(out), chunk_size=kb * 1000,
        engine=_engine(engine_name),
    )
    assert out.read_bytes() == (fixtures_dir / golden).read_bytes()


@pytest.mark.parametrize("engine_name", ENGINES)
@pytest.mark.parametrize("fq,golden,kb", SE_CASES)
def test_se_decode_restores_original(fixtures_dir, tmp_path, fq, golden, kb, engine_name):
    out = tmp_path / "dec.fq"
    pipeline.decompress(
        str(fixtures_dir / golden), str(out), engine=_engine(engine_name)
    )
    assert out.read_bytes() == (fixtures_dir / fq).read_bytes()


@pytest.mark.parametrize("engine_name", ENGINES)
@pytest.mark.parametrize("r1,r2,golden,kb", PE_CASES)
def test_pe_encode_matches_reference(fixtures_dir, tmp_path, r1, r2, golden, kb, engine_name):
    out = tmp_path / "out.rfq"
    pipeline.compress_pe(
        str(fixtures_dir / r1), str(fixtures_dir / r2), str(out),
        chunk_size=kb * 1000, engine=_engine(engine_name),
    )
    assert out.read_bytes() == (fixtures_dir / golden).read_bytes()


@pytest.mark.parametrize("engine_name", ENGINES)
@pytest.mark.parametrize("r1,r2,golden,kb", PE_CASES)
def test_pe_decode_restores_original(fixtures_dir, tmp_path, r1, r2, golden, kb, engine_name):
    out1 = tmp_path / "dec1.fq"
    out2 = tmp_path / "dec2.fq"
    pipeline.decompress_pe(
        str(fixtures_dir / golden), str(out1), str(out2),
        engine=_engine(engine_name),
    )
    assert out1.read_bytes() == (fixtures_dir / r1).read_bytes()
    assert out2.read_bytes() == (fixtures_dir / r2).read_bytes()


def test_crlf_input_matches(fixtures_dir, tmp_path):
    """CRLF line endings route through the quirk-exact scalar reader and
    must still match the reference byte-for-byte."""
    out = tmp_path / "crlf.rfq"
    pipeline.compress_se(str(fixtures_dir / "se_crlf.fq"), str(out))
    assert out.read_bytes() == (fixtures_dir / "se_crlf.ref.rfq").read_bytes()


def test_workers_output_identical(fixtures_dir, tmp_path):
    """Thread-pool chunk encoding must be byte-identical to serial."""
    out = tmp_path / "w.rfq"
    pipeline.compress_se(
        str(fixtures_dir / "se_big.fq"), str(out), chunk_size=100_000, workers=4
    )
    assert out.read_bytes() == (fixtures_dir / "se_big.ref.k100.rfq").read_bytes()


def test_gz_input_matches(fixtures_dir, tmp_path):
    out = tmp_path / "out.rfq"
    pipeline.compress_se(
        str(fixtures_dir / "se_big.fq.gz"), str(out), chunk_size=100_000
    )
    assert out.read_bytes() == (fixtures_dir / "se_big.ref.k100.rfq").read_bytes()


def test_compare_mode_passes(fixtures_dir):
    res = pipeline.compare(
        str(fixtures_dir / "se_big.fq"),
        str(fixtures_dir / "se_big.ref.k100.rfq"),
        quiet=True,
    )
    assert res["result"] == "passed"
    assert res["fastq_reads"] == res["rfq_reads"] == 3000
    assert res["fastq_bases"] == res["rfq_bases"] == 300000


def test_compare_pe_mode_passes(fixtures_dir):
    res = pipeline.compare_pe(
        str(fixtures_dir / "pe_big_R1.fq"),
        str(fixtures_dir / "pe_big_R2.fq"),
        str(fixtures_dir / "pe_big.ref.k100.rfq"),
        quiet=True,
    )
    assert res["result"] == "passed"
    assert res["rfq_reads"] == 3000


def test_compare_detects_mismatch(fixtures_dir, tmp_path):
    data = (fixtures_dir / "se_illumina.fq").read_bytes()
    mutated = bytearray(data)
    # flip one base character on the second line
    pos = data.index(b"\n") + 1
    mutated[pos] = ord("A") if mutated[pos] != ord("A") else ord("C")
    bad = tmp_path / "bad.fq"
    bad.write_bytes(bytes(mutated))
    res = pipeline.compare(
        str(bad), str(fixtures_dir / "se_illumina.ref.rfq"), quiet=True
    )
    assert res["result"] == "failed"


def test_multichunk_no_newline_flag_carry(fixtures_dir, tmp_path):
    """A file smaller than the reader's 1MB block sets the no-newline flag
    from the first fetch, so EVERY chunk carries it; decode must use the
    one-chunk lookahead to trim only the final chunk."""
    out = tmp_path / "nl.rfq"
    pipeline.compress_se(
        str(fixtures_dir / "se_big_nonl.fq"), str(out), chunk_size=100_000
    )
    assert out.read_bytes() == (
        fixtures_dir / "se_big_nonl.ref.k100.rfq"
    ).read_bytes()
    dec = tmp_path / "nl.fq"
    pipeline.decompress(str(out), str(dec))
    assert dec.read_bytes() == (fixtures_dir / "se_big_nonl.fq").read_bytes()


def test_pe_no_newline_decode_fixes_reference_data_loss(fixtures_dir, tmp_path):
    """PE multi-chunk with R1 missing its trailing newline: encode is
    byte-identical to the reference, but the reference's PE decompress
    drops the lookahead chunks (repaq.cpp:379-411 — verified to lose 44%
    of this fixture's reads); we restore the input exactly (documented
    divergence, ARCHITECTURE.md)."""
    out = tmp_path / "penl.rfq"
    pipeline.compress_pe(
        str(fixtures_dir / "pe_nl1.fq"), str(fixtures_dir / "pe_nl2.fq"),
        str(out), chunk_size=100_000,
    )
    assert out.read_bytes() == (fixtures_dir / "pe_nl.ref.rfq").read_bytes()
    d1 = tmp_path / "d1.fq"
    d2 = tmp_path / "d2.fq"
    pipeline.decompress_pe(str(out), str(d1), str(d2))
    assert d1.read_bytes() == (fixtures_dir / "pe_nl1.fq").read_bytes()
    assert d2.read_bytes() == (fixtures_dir / "pe_nl2.fq").read_bytes()
