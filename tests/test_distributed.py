"""Multi-process data-parallel compression: part-per-rank outputs must
assemble into the exact serial (and reference) bytes."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

from repaq_tpu.parallel import distributed as dist

REPO = Path(__file__).resolve().parent.parent


def test_partition():
    assert dist.partition(10, 3) == [(0, 4), (4, 7), (7, 10)]
    assert dist.partition(2, 4) == [(0, 1), (1, 2), (2, 2), (2, 2)]


def test_plan_matches_serial_chunking(fixtures_dir):
    plan = dist.plan_chunks(str(fixtures_dir / "se_big.fq"), 100_000)
    assert len(plan) == 3
    assert plan[0].byte_start == 0
    assert plan[-1].byte_end == os.path.getsize(fixtures_dir / "se_big.fq")
    assert sum(p.n_reads for p in plan) == 3000
    # contiguity
    for a, b in zip(plan, plan[1:]):
        assert a.byte_end == b.byte_start


@pytest.mark.parametrize("nproc", [1, 2, 3])
def test_distributed_matches_golden(fixtures_dir, tmp_path, nproc):
    out = tmp_path / "dist.rfq"
    for pid in range(nproc):
        dist.compress_se_distributed(
            str(fixtures_dir / "se_big.fq"), str(out), chunk_size=100_000,
            num_processes=nproc, process_id=pid, assemble=False,
        )
    from repaq_tpu import pipeline

    header = dist.derive_header(
        str(fixtures_dir / "se_big.fq"), 100_000, pipeline.get_engine()
    )
    dist.assemble_parts(str(out), header.to_bytes(), nproc)
    assert out.read_bytes() == (fixtures_dir / "se_big.ref.k100.rfq").read_bytes()


def test_distributed_no_trailing_newline(fixtures_dir, tmp_path):
    """Per-chunk flags come from the plan; a rank encoding only middle
    chunks must still set them exactly like the serial reader would."""
    out = tmp_path / "nl.rfq"
    for pid in range(2):
        dist.compress_se_distributed(
            str(fixtures_dir / "se_nonl.fq"), str(out), chunk_size=10_000,
            num_processes=2, process_id=pid, assemble=False,
        )
    header = dist.derive_header(
        str(fixtures_dir / "se_nonl.fq"), 10_000,
        __import__("repaq_tpu.pipeline", fromlist=["get_engine"]).get_engine(),
    )
    dist.assemble_parts(str(out), header.to_bytes(), 2)
    # serial output with the same (clamped) chunk size for comparison
    from repaq_tpu import pipeline

    serial = tmp_path / "serial.rfq"
    pipeline.compress_se(
        str(fixtures_dir / "se_nonl.fq"), str(serial), chunk_size=10_000
    )
    assert out.read_bytes() == serial.read_bytes()


def test_distributed_separate_processes(fixtures_dir, tmp_path):
    """Real OS processes, like separate hosts sharing a filesystem."""
    out = tmp_path / "proc.rfq"
    script = (
        "import sys; sys.path.insert(0, %r); "
        "from repaq_tpu.parallel import distributed as d; "
        "d.compress_se_distributed(%r, %r, chunk_size=100_000, "
        "num_processes=2, process_id=int(sys.argv[1]), assemble=False)"
        % (str(REPO), str(fixtures_dir / "se_big.fq"), str(out))
    )
    procs = [
        subprocess.Popen([sys.executable, "-c", script, str(pid)])
        for pid in range(2)
    ]
    for p in procs:
        assert p.wait() == 0
    from repaq_tpu import pipeline

    header = dist.derive_header(
        str(fixtures_dir / "se_big.fq"), 100_000, pipeline.get_engine()
    )
    dist.assemble_parts(str(out), header.to_bytes(), 2)
    assert out.read_bytes() == (fixtures_dir / "se_big.ref.k100.rfq").read_bytes()


def test_pair_plan_contiguity(fixtures_dir):
    plan = dist.plan_pair_chunks(
        str(fixtures_dir / "pe_big_R1.fq"), str(fixtures_dir / "pe_big_R2.fq"),
        100_000,
    )
    assert len(plan) > 1
    assert plan[0].byte_start1 == 0 and plan[0].byte_start2 == 0
    assert plan[-1].byte_end1 == os.path.getsize(fixtures_dir / "pe_big_R1.fq")
    assert plan[-1].byte_end2 == os.path.getsize(fixtures_dir / "pe_big_R2.fq")
    for a, b in zip(plan, plan[1:]):
        assert a.byte_end1 == b.byte_start1
        assert a.byte_end2 == b.byte_start2


@pytest.mark.parametrize("nproc", [1, 2, 3])
def test_pe_distributed_matches_golden(fixtures_dir, tmp_path, nproc):
    out = tmp_path / "dist_pe.rfq"
    for pid in range(nproc):
        dist.compress_pe_distributed(
            str(fixtures_dir / "pe_big_R1.fq"), str(fixtures_dir / "pe_big_R2.fq"),
            str(out), chunk_size=100_000, num_processes=nproc, process_id=pid,
            assemble=False,
        )
    from repaq_tpu import pipeline

    header = dist.derive_header_pe(
        str(fixtures_dir / "pe_big_R1.fq"), str(fixtures_dir / "pe_big_R2.fq"),
        100_000, pipeline.get_engine(),
    )
    dist.assemble_parts(str(out), header.to_bytes(), nproc)
    assert out.read_bytes() == (
        fixtures_dir / "pe_big.ref.k100.rfq"
    ).read_bytes()


def test_pe_distributed_no_trailing_newline(fixtures_dir, tmp_path):
    """The no-newline flags live in the plan; middle-chunk ranks must set
    them exactly like the serial pair reader (which sees EOF timing)."""
    out = tmp_path / "nl_pe.rfq"
    for pid in range(2):
        dist.compress_pe_distributed(
            str(fixtures_dir / "pe_nl1.fq"), str(fixtures_dir / "pe_nl2.fq"),
            str(out), chunk_size=10_000, num_processes=2, process_id=pid,
            assemble=False,
        )
    from repaq_tpu import pipeline

    header = dist.derive_header_pe(
        str(fixtures_dir / "pe_nl1.fq"), str(fixtures_dir / "pe_nl2.fq"),
        10_000, pipeline.get_engine(),
    )
    dist.assemble_parts(str(out), header.to_bytes(), 2)
    serial = tmp_path / "serial_pe.rfq"
    pipeline.compress_pe(
        str(fixtures_dir / "pe_nl1.fq"), str(fixtures_dir / "pe_nl2.fq"),
        str(serial), chunk_size=10_000,
    )
    assert out.read_bytes() == serial.read_bytes()


@pytest.mark.parametrize("nproc", [1, 3])
def test_interleaved_distributed_matches_golden(fixtures_dir, tmp_path, nproc):
    # build an interleaved stream from the PE fixtures
    r1 = (fixtures_dir / "pe_big_R1.fq").read_bytes().splitlines(keepends=True)
    r2 = (fixtures_dir / "pe_big_R2.fq").read_bytes().splitlines(keepends=True)
    inter = tmp_path / "inter.fq"
    with open(inter, "wb") as f:
        for i in range(0, len(r1), 4):
            f.writelines(r1[i : i + 4])
            f.writelines(r2[i : i + 4])
    out = tmp_path / "dist_il.rfq"
    for pid in range(nproc):
        dist.compress_pe_distributed(
            str(inter), "", str(out), chunk_size=100_000,
            num_processes=nproc, process_id=pid, assemble=False,
            interleaved=True,
        )
    from repaq_tpu import pipeline

    header = dist.derive_header_pe(
        str(inter), "", 100_000, pipeline.get_engine(), interleaved=True
    )
    dist.assemble_parts(str(out), header.to_bytes(), nproc)
    assert out.read_bytes() == (
        fixtures_dir / "pe_big.ref.k100.rfq"
    ).read_bytes()


def test_sharded_rfqz_compose(tmp_path):
    """--num_shards with a .rfqz target: per-rank bare section streams
    concatenate under one container header; decoded .rfq stream equals the
    serial pipeline's (VERDICT r1 item 8)."""
    import gzip
    import subprocess
    import sys

    fx = str(REPO / "tests" / "fixtures")
    in1 = str(tmp_path / "in.fq")
    with gzip.open(os.path.join(fx, "se_big.fq.gz")) as f:
        open(in1, "wb").write(f.read())
    out = str(tmp_path / "s.rfqz")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=str(REPO))
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "repaq_tpu.cli", "-c", "-i", in1, "-o",
             out, "-k", "100", "--num_shards", "3", "--shard", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for i in range(3)
    ]
    for p in procs:
        _o, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-1500:]
    # decoded container must reproduce the input exactly
    back = str(tmp_path / "back.fq")
    r = subprocess.run(
        [sys.executable, "-m", "repaq_tpu.cli", "-d", "-i", out, "-o", back],
        env=env, capture_output=True,
    )
    assert r.returncode == 0, r.stderr[-1500:]
    assert open(back, "rb").read() == open(in1, "rb").read()
    # and the decoded .rfq stream equals the golden reference bytes
    from repaq_tpu.format.rfqz import RfqzReader

    rfq_bytes = RfqzReader(out).read()
    with open(os.path.join(fx, "se_big.ref.k100.rfq"), "rb") as f:
        assert rfq_bytes == f.read()


# ---- parallel decompress (round 3: the decode mirror) ----


def test_plan_rfq_chunks(fixtures_dir):
    """The metadata-only chunk index must agree with a full parse."""
    import io

    from repaq_tpu.format.chunk import RfqChunk
    from repaq_tpu.format.header import RfqHeader

    path = str(fixtures_dir / "se_big.ref.k100.rfq")
    header, specs = dist.plan_rfq_chunks(path)
    raw = open(path, "rb").read()
    stream = io.BytesIO(raw)
    h2 = RfqHeader.read(stream)
    i = 0
    while True:
        off = stream.tell()
        c = RfqChunk.read(stream, h2)
        if c.reads == 0:
            break
        assert specs[i].offset == off
        assert specs[i].reads == c.reads
        assert specs[i].flags == c.flags
        i += 1
    assert i == len(specs) == 3


@pytest.mark.parametrize("nproc", [1, 2, 3, 5])
def test_decompress_distributed_se(fixtures_dir, tmp_path, nproc):
    out = tmp_path / "out.fq"
    for pid in range(nproc):
        dist.decompress_distributed(
            str(fixtures_dir / "se_big.ref.k100.rfq"), str(out),
            num_processes=nproc, process_id=pid, assemble=False,
        )
    dist.assemble_fastq_parts(str(out), nproc)
    assert out.read_bytes() == (fixtures_dir / "se_big.fq").read_bytes()


@pytest.mark.parametrize("nproc", [2, 3])
def test_decompress_distributed_pe(fixtures_dir, tmp_path, nproc):
    o1 = tmp_path / "r1.fq"
    o2 = tmp_path / "r2.fq"
    for pid in range(nproc):
        dist.decompress_distributed(
            str(fixtures_dir / "pe_big.ref.k100.rfq"), str(o1), str(o2),
            num_processes=nproc, process_id=pid, assemble=False,
        )
    dist.assemble_fastq_parts(str(o1), nproc)
    dist.assemble_fastq_parts(str(o2), nproc)
    assert o1.read_bytes() == (fixtures_dir / "pe_big_R1.fq").read_bytes()
    assert o2.read_bytes() == (fixtures_dir / "pe_big_R2.fq").read_bytes()


def test_decompress_distributed_no_trailing_newline(fixtures_dir, tmp_path):
    """The final-chunk trim must land on the rank owning the LAST chunk."""
    for nproc in (2, 3):
        out = tmp_path / ("nl%d.fq" % nproc)
        for pid in range(nproc):
            dist.decompress_distributed(
                str(fixtures_dir / "se_big_nonl.ref.k100.rfq"), str(out),
                num_processes=nproc, process_id=pid, assemble=False,
            )
        dist.assemble_fastq_parts(str(out), nproc)
        assert out.read_bytes() == (
            fixtures_dir / "se_big_nonl.fq"
        ).read_bytes()


def test_decompress_workers_identical(fixtures_dir, tmp_path):
    """-d --workers N: same bytes for any worker count (threaded decode
    mirror of the compress-side worker pool)."""
    from repaq_tpu import pipeline

    for name, fq in (
        ("se_big.ref.k100.rfq", "se_big.fq"),
        ("se_big_nonl.ref.k100.rfq", "se_big_nonl.fq"),
    ):
        o1 = tmp_path / ("w1_" + fq)
        o3 = tmp_path / ("w3_" + fq)
        pipeline.decompress(str(fixtures_dir / name), str(o1), workers=1)
        pipeline.decompress(str(fixtures_dir / name), str(o3), workers=3)
        want = (fixtures_dir / fq).read_bytes()
        assert o1.read_bytes() == want
        assert o3.read_bytes() == want


def test_decompress_workers_pe(fixtures_dir, tmp_path):
    from repaq_tpu import pipeline

    o1 = tmp_path / "r1.fq"
    o2 = tmp_path / "r2.fq"
    pipeline.decompress_pe(
        str(fixtures_dir / "pe_big.ref.k100.rfq"), str(o1), str(o2),
        workers=4,
    )
    assert o1.read_bytes() == (fixtures_dir / "pe_big_R1.fq").read_bytes()
    assert o2.read_bytes() == (fixtures_dir / "pe_big_R2.fq").read_bytes()


def test_decompress_sharded_cli(fixtures_dir, tmp_path):
    """End-to-end: -d --num_shards over real OS processes."""
    out = str(tmp_path / "out.fq")
    rfq = str(fixtures_dir / "se_big.ref.k100.rfq")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=str(REPO))
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "repaq_tpu.cli", "-d", "-i", rfq, "-o",
             out, "--num_shards", "3", "--shard", str(i), "--workers", "2"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for i in range(3)
    ]
    for p in procs:
        _o, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-1500:]
    assert open(out, "rb").read() == (fixtures_dir / "se_big.fq").read_bytes()


def test_plan_chunks_sharded_matches_replicated(tmp_path):
    """plan_chunks_sharded (VERDICT r3 #6: rank-sharded newline scan +
    carry relay) must reproduce plan_chunks EXACTLY — same chunk byte
    ranges, record counts, and trailing-newline flags — for any rank
    count, including the no-trailing-newline and variable-length files."""
    import gzip
    import threading
    from pathlib import Path

    import numpy as np

    from repaq_tpu.parallel import distributed as dist

    repo = Path(__file__).resolve().parent.parent
    fx = repo / "tests" / "fixtures"
    files = {}
    for name in ("se_big.fq.gz", "se_big_nonl.fq.gz", "se_varlen.fq.gz"):
        p = tmp_path / name[:-3]
        p.write_bytes(gzip.open(fx / name).read())
        files[name] = str(p)

    def run_sharded(path, chunk_size, R):
        results = [None] * R
        state = {"bufs": [None] * R, "out": None}
        barrier = threading.Barrier(R)

        def allgather_for(pid):
            def ag(vec):
                state["bufs"][pid] = np.asarray(vec, dtype=np.int64)
                barrier.wait()
                if pid == 0:
                    state["out"] = np.stack(state["bufs"])
                barrier.wait()
                out = state["out"]
                barrier.wait()
                return out

            return ag

        def work(pid):
            results[pid] = dist.plan_chunks_sharded(
                path, chunk_size, R, pid, allgather_for(pid)
            )

        ths = [threading.Thread(target=work, args=(p,)) for p in range(R)]
        for t in ths:
            t.start()
        for t in ths:
            t.join()
        return results

    for name, path in files.items():
        for chunk_size in (10_000, 100_000):
            want = dist.plan_chunks(path, chunk_size)
            for R in (1, 2, 3, 5):
                got = run_sharded(path, chunk_size, R)
                for pid in range(R):
                    assert got[pid] == want, (name, chunk_size, R, pid)

    # quirk inputs fall back (None): CRLF and empty-line files
    crlf = tmp_path / "c.fq"
    crlf.write_bytes(b"@r\r\nACGT\r\n+\r\nFFFF\r\n")
    empt = tmp_path / "e.fq"
    empt.write_bytes(b"@r\nACGT\n+\nFFFF\n\n")
    for path in (crlf, empt):
        got = run_sharded(str(path), 10_000, 2)
        assert got[0] is None and got[1] is None, path
