"""Deep interop fuzz against the REFERENCE BINARY, both directions.

Not collected by pytest (no test_ prefix): needs the reference compiled at
/tmp/refbuild/repaq (see .claude/skills/verify). Run manually:

    python tests/interop_fuzz.py [n_trials]

Per trial: random FASTQ corpus (SE/PE, Illumina/BGI names, N density,
variable lengths, 1/7/70 quality bins, missing trailing newlines), then
asserts
  1. our .rfq == the reference's .rfq byte-for-byte,
  2. the reference decodes OUR container back to the input,
  3. we decode the REFERENCE's container back to the input.

Known exceptions (counted as reference bugs, not failures — in both cases
OUR pipeline is verified to behave correctly):
- (2) when a PE container carries a no-trailing-newline flag on a
  non-final chunk, the reference drops the lookahead chunk's reads on
  decode (repaq.cpp:379-411 leaks it) — ITS OWN output corrupts the same
  way; verified to be a strict prefix truncation.
- the reference heap-overflows its by-column quality buffer on tiny
  chunks with many quality bins (the 4*bins length table can exceed the
  chunk's qual bytes) and dies with SIGSEGV/SIGABRT after writing; our
  container must still roundtrip through our own decoder.
"""

import filecmp
import os
import random
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
REF = "/tmp/refbuild/repaq"
PY = [sys.executable, "-m", "repaq_tpu.cli"]
ENV = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_fastq(path, rng, n, illumina, n_frac, var_len, quals, pe_mate=0,
              coords=None, no_final_nl=False, ending="\n", empty_tail=0):
    """ending='\\r\\n' exercises the scalar reader's exact 1MB-block
    emulation (reference fastqreader.cpp:108-117 evaluates the \\r\\n skip
    in its block frame — straddling newlines surface as empty lines).
    empty_tail appends blank lines at EOF (an empty line kills the
    reference's reader mid-file, so mid-file blanks only test encoder
    truncation equivalence; tail blanks test the exact stop position)."""
    out = []
    cs = []
    for i in range(n):
        L = rng.randint(30, 180) if var_len else rng.choice([100, 151])
        seq = "".join(
            "N" if rng.random() < n_frac else rng.choice("ACGT")
            for _ in range(L)
        )
        q = "".join(rng.choice(quals) for _ in range(L))
        if illumina:
            if coords is not None:
                lane, tile, x, y = coords[i]
            else:
                lane, tile, x, y = (
                    rng.randint(1, 8), rng.randint(1000, 2999),
                    rng.randint(0, 40000), rng.randint(0, 40000),
                )
            cs.append((lane, tile, x, y))
            mate = pe_mate or 1
            name = "@A00251:28:H3YV7:%d:%d:%d:%d %d:N:0:ACGT" % (
                lane, tile, x, y, mate
            )
        else:
            name = "@v300%06d/%d" % (i, pe_mate or 1)
        out.append(ending.join((name, seq, "+", q)) + ending)
    out.extend([ending] * empty_tail)
    data = "".join(out).encode()
    if no_final_nl:
        data = data[: -len(ending)]
    with open(path, "wb") as f:
        f.write(data)
    return cs


def run(cmd, **kw):
    r = subprocess.run(cmd, capture_output=True, env=ENV, **kw)
    assert r.returncode == 0, (cmd, r.stderr[:500])


class RefCrash(Exception):
    """The reference binary died (it heap-overflows its quality buffer on
    tiny chunks with many quality bins; see ARCHITECTURE.md divergence 5)."""


def run_ref(cmd, **kw):
    r = subprocess.run(cmd, capture_output=True, env=ENV, **kw)
    if r.returncode in (-11, -6, 139, 134):
        raise RefCrash(cmd)
    assert r.returncode == 0, (cmd, r.stderr[:500])


_COMP = bytes.maketrans(b"ACGTN", b"TGCAN")


def _make_overlapping(f1, f2, rng):
    """Rewrite ~60% of R2 sequences so RC(R2) starts with R1's suffix —
    the orientation the PE overlap elision detects (rfqcodec.cpp:1391+)."""
    r1 = open(f1, "rb").read().split(b"\n")
    r2 = open(f2, "rb").read().split(b"\n")
    for i in range(1, min(len(r1), len(r2)) - 1, 4):
        if rng.random() > 0.6:
            continue
        s1, s2 = r1[i], r2[i]
        if not s1 or not s2:
            continue
        o = rng.randint(12, min(len(s1), len(s2)))
        fwd = s1[len(s1) - o :] + s2[o:]
        r2[i] = fwd.translate(_COMP)[::-1][: len(s2)]
    with open(f2, "wb") as f:
        f.write(b"\n".join(r2))


def cmp_decoded(orig, got, quirky):
    """Decoded FASTQ vs source: exact for plain trials; for \r\n /
    blank-tail sources both tools canonicalize to \n and drop trailing
    blanks, so compare against the normalized image."""
    if not quirky:
        return filecmp.cmp(orig, got, shallow=False)
    data = open(orig, "rb").read().replace(b"\r\n", b"\n")
    while data.endswith(b"\n\n"):
        data = data[:-1]
    if data.endswith(b"\n\r"):  # no_final_nl cut into a blank tail line
        data = data[:-1]
    return open(got, "rb").read() == data


def is_reference_truncation(orig, got):
    """The reference's PE lookahead leak (repaq.cpp:379-411) drops the
    lookahead CHUNK's reads. When the flagged chunk is second-to-last the
    loss is a suffix; when the no-newline flag lands on an earlier chunk
    (visible early for small files / large chunk counts) the loss is a
    MID-FILE run of whole records. Classify: got's records must be an
    in-order subsequence of the (newline-normalized) original's records —
    the reference only ever drops reads, never corrupts them."""
    a = open(orig, "rb").read().replace(b"\r\n", b"\n")
    while a.endswith(b"\n\n"):
        a = a[:-1]
    b = open(got, "rb").read()
    if len(b) >= len(a):
        return False
    if a.startswith(b):
        return True
    # match whole 4-line RECORDS, not lines (round-2 advisor: line-level
    # matching could classify genuine corruption — e.g. only a qual line
    # dropped — as the known leak), and require the drops to form at most
    # two contiguous runs of records (the leak drops one lookahead chunk,
    # plus possibly the final partial chunk).
    def records(data):
        lines = data.split(b"\n")
        if lines and lines[-1] == b"":
            lines.pop()
        if len(lines) % 4 != 0:
            return None
        return [tuple(lines[j : j + 4]) for j in range(0, len(lines), 4)]

    ra = records(a)
    rb = records(b)
    if ra is None or rb is None:
        return False
    i = 0
    gap_runs = 0
    in_gap = False
    for rec in rb:
        skipped = 0
        while i < len(ra) and ra[i] != rec:
            i += 1
            skipped += 1
        if i >= len(ra):
            return False
        if skipped:
            gap_runs += 1
        i += 1
    if i < len(ra):
        gap_runs += 1  # trailing drop
    return gap_runs <= 2


def main(trials: int) -> int:
    fails = ref_bugs = 0
    for trial in range(trials):
        rng = random.Random(10_000 + trial)
        tmp = tempfile.mkdtemp(prefix="fz_")
        illumina = rng.random() < 0.7
        kw = dict(
            illumina=illumina,
            n_frac=rng.choice([0.0, 0.02, 0.3]),
            var_len=rng.random() < 0.4,
            quals=rng.choice(
                ["FF:,:F", "F", "".join(chr(33 + i) for i in range(70)),
                 "FFFF:#,"]
            ),
            no_final_nl=rng.random() < 0.25,
            ending=rng.choice(["\n", "\n", "\n", "\r\n"]),
            empty_tail=rng.choice([0, 0, 0, 1, 3]),
        )
        n = rng.randint(1, 800)
        if kw["ending"] == "\r\n" and rng.random() < 0.4:
            n = rng.randint(4000, 7000)  # >1MB: block-boundary quirks live
        quirky = kw["ending"] != "\n" or kw["empty_tail"] > 0
        pe = rng.random() < 0.5
        k = rng.choice(["100", "100", "150"])
        f1 = os.path.join(tmp, "a_R1.fq")
        try:
          try:
            if pe:
                cs = gen_fastq(f1, rng, n, pe_mate=1, **kw)
                f2 = os.path.join(tmp, "a_R2.fq")
                rng2 = random.Random(trial)
                kw2 = dict(kw)
                kw2["no_final_nl"] = rng.random() < 0.25
                gen_fastq(f2, rng2, n, pe_mate=2,
                          coords=cs if illumina else None, **kw2)
                want_overlap = rng.random() < 0.5
                if want_overlap and kw["ending"] == "\n":
                    # (the rewriter splits on \n; \r\n corpora keep their
                    # original non-overlapping pairs)
                    _make_overlapping(f1, f2, rng)
                ours = os.path.join(tmp, "ours.rfq")
                refs = os.path.join(tmp, "ref.rfq")
                run(PY + ["-c", "-i", f1, "-I", f2, "-o", ours, "-k", k])
                run_ref([REF, "-c", "-i", f1, "-I", f2, "-o", refs, "-k", k])
                assert filecmp.cmp(ours, refs, shallow=False), "rfq bytes differ"
                d1, d2 = os.path.join(tmp, "d1.fq"), os.path.join(tmp, "d2.fq")
                run_ref([REF, "-d", "-i", ours, "-o", d1, "-O", d2])
                e1, e2 = os.path.join(tmp, "e1.fq"), os.path.join(tmp, "e2.fq")
                run(PY + ["-d", "-i", refs, "-o", e1, "-O", e2])
                assert cmp_decoded(f1, e1, quirky) and cmp_decoded(
                    f2, e2, quirky
                ), "we can't roundtrip ref's container"
                if not (cmp_decoded(f1, d1, quirky)
                        and cmp_decoded(f2, d2, quirky)):
                    assert is_reference_truncation(f1, d1) or (
                        is_reference_truncation(f2, d2)
                    ), "ref decode diverged in a non-truncation way"
                    ref_bugs += 1
                    print("trial %d: reference lookahead-leak truncation "
                          "(our decode exact)" % trial, flush=True)
                    continue
            else:
                gen_fastq(f1, rng, n, **kw)
                ours = os.path.join(tmp, "ours.rfq")
                refs = os.path.join(tmp, "ref.rfq")
                run(PY + ["-c", "-i", f1, "-o", ours, "-k", k])
                run_ref([REF, "-c", "-i", f1, "-o", refs, "-k", k])
                assert filecmp.cmp(ours, refs, shallow=False), "rfq bytes differ"
                d = os.path.join(tmp, "d.fq")
                run_ref([REF, "-d", "-i", ours, "-o", d])
                assert cmp_decoded(f1, d, quirky), "ref can't roundtrip ours"
                e = os.path.join(tmp, "e.fq")
                run(PY + ["-d", "-i", refs, "-o", e])
                assert cmp_decoded(f1, e, quirky), "we can't roundtrip ref's"
                # our native second stage on the same corpus
                if rng.random() < 0.3:
                    z = os.path.join(tmp, "o.rfqz")
                    zf = os.path.join(tmp, "z.fq")
                    run(PY + ["-c", "-i", f1, "-o", z])
                    run(PY + ["-d", "-i", z, "-o", zf])
                    assert cmp_decoded(f1, zf, quirky), "rfqz roundtrip"
            print("trial %d ok (pe=%s n=%d)" % (trial, pe, n), flush=True)
          except RefCrash:
            # the reference died on its own bug; our container must still
            # roundtrip through OUR decoder
            ours = os.path.join(tmp, "ours.rfq")
            if pe:
                e1, e2 = os.path.join(tmp, "s1.fq"), os.path.join(tmp, "s2.fq")
                run(PY + ["-d", "-i", ours, "-o", e1, "-O", e2])
                assert filecmp.cmp(f1, e1, shallow=False) and filecmp.cmp(
                    f2, e2, shallow=False
                )
            else:
                e = os.path.join(tmp, "s.fq")
                run(PY + ["-d", "-i", ours, "-o", e])
                assert filecmp.cmp(f1, e, shallow=False)
            ref_bugs += 1
            print("trial %d: reference crashed (tiny-chunk qual-buffer "
                  "overflow); our roundtrip exact" % trial, flush=True)
        except Exception as ex:
            fails += 1
            print("TRIAL %d FAILED: %r (dir kept: %s)" % (trial, ex, tmp),
                  flush=True)
    print("done: %d trials, %d failures, %d reference-bug truncations"
          % (trials, fails, ref_bugs))
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 40))
