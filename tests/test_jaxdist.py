"""jax.distributed multi-process transport (parallel/jaxdist.py): 2
processes x 4 virtual CPU devices, encoded parts travel over the process
group (ordered gather), writer output must be byte-identical to the golden
reference bytes / serial pipeline."""

import gzip
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FX = os.path.join(REPO, "tests", "fixtures")

_WORKER = r"""
import sys
from repaq_tpu.parallel.jaxdist import compress_distributed_jax

mode, coord, nproc, pid, in1, in2, out1, k = sys.argv[1:9]
compress_distributed_jax(
    in1, out1, in2=in2, chunk_size=int(k), is_pe=(mode == "pe"),
    coordinator=coord, num_processes=int(nproc), process_id=int(pid),
)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_group(mode, in1, in2, out1, k, nproc=2):
    coord = "127.0.0.1:%d" % _free_port()
    env = dict(
        os.environ,
        PYTHONPATH=REPO,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, mode, coord, str(nproc),
             str(pid), in1, in2, out1, str(k)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in range(nproc)
    ]
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]


def _gunzip(src, dst):
    with gzip.open(src, "rb") as f, open(dst, "wb") as o:
        o.write(f.read())


def test_se_two_process_golden(tmp_path):
    in1 = str(tmp_path / "in.fq")
    _gunzip(os.path.join(FX, "se_big.fq.gz"), in1)
    out = str(tmp_path / "out.rfq")
    _run_group("se", in1, "", out, 100_000)
    with open(os.path.join(FX, "se_big.ref.k100.rfq"), "rb") as f:
        assert open(out, "rb").read() == f.read()


def test_pe_two_process_golden(tmp_path):
    f1 = str(tmp_path / "r1.fq")
    f2 = str(tmp_path / "r2.fq")
    _gunzip(os.path.join(FX, "pe_big_R1.fq.gz"), f1)
    _gunzip(os.path.join(FX, "pe_big_R2.fq.gz"), f2)
    out = str(tmp_path / "out.rfq")
    _run_group("pe", f1, f2, out, 100_000)
    with open(os.path.join(FX, "pe_big.ref.k100.rfq"), "rb") as f:
        assert open(out, "rb").read() == f.read()


def test_three_process_uneven_split(tmp_path):
    """Rank count that does not divide the chunk count; also exercises
    multi-slab rounds via a tiny slab size."""
    in1 = str(tmp_path / "in.fq")
    _gunzip(os.path.join(FX, "se_big.fq.gz"), in1)
    out = str(tmp_path / "out.rfq")
    coord = "127.0.0.1:%d" % _free_port()
    env = dict(
        os.environ,
        PYTHONPATH=REPO,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
    )
    worker = _WORKER.replace(
        "from repaq_tpu.parallel.jaxdist import compress_distributed_jax",
        "import repaq_tpu.parallel.jaxdist as J\n"
        "J._SLAB = 4096\n"
        "compress_distributed_jax = J.compress_distributed_jax",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", worker, "se", coord, "3", str(pid),
             in1, "", out, "100000"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in range(3)
    ]
    for p in procs:
        _out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]
    with open(os.path.join(FX, "se_big.ref.k100.rfq"), "rb") as f:
        assert open(out, "rb").read() == f.read()
