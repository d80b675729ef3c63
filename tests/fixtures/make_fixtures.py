"""Deterministic generator for the fixture FASTQ inputs.

Run from this directory to regenerate the ``*.fq`` inputs (they are stored
gzipped). The paired ``*.rfq`` goldens were produced by the reference
encoder; see README.md. Two seeded batches exist because the corpus was
built incrementally (seed 42: small files, seed 7: multi-chunk files).
"""

import gzip
import random


def _write(path, text):
    with gzip.open(path, "wt") as f:
        f.write(text)


def batch_small():
    random.seed(42)
    bases = "ACGT"
    quals = "FF:,:F"
    comp = {"A": "T", "T": "A", "C": "G", "G": "C"}

    out = []
    for i in range(300):
        seq, q = [], []
        for _ in range(100):
            if random.random() < 0.05:
                seq.append("N")
                q.append("#")
            else:
                seq.append(random.choice(bases))
                q.append(random.choice(quals))
        out.append(
            "@A00251:28:H3YV7DSXX:4:1101:%d:%d 1:N:0:TAAGTGGC\n%s\n+\n%s\n"
            % (random.randint(1000, 30000), 1000 + i * 17, "".join(seq), "".join(q))
        )
    se_illumina = "".join(out)
    _write("se_illumina.fq.gz", se_illumina)
    _write("se_nonl.fq.gz", se_illumina[:-1])

    out = []
    for i in range(200):
        seq = "".join(random.choice(bases) for _ in range(150))
        q = "".join(random.choice(quals) for _ in range(150))
        out.append("@V300026370L1C001R0010000%03d/1\n%s\n+\n%s\n" % (i, seq, q))
    _write("se_bgi.fq.gz", "".join(out))

    out1, out2 = [], []
    for i in range(250):
        x = random.randint(1000, 30000)
        y = 1000 + i * 13
        s1 = "".join(random.choice(bases) for _ in range(120))
        if random.random() < 0.4:
            o = random.randint(20, 100)
            rc = "".join(comp[c] for c in reversed(s1[-o:]))
            s2 = rc + "".join(random.choice(bases) for _ in range(120 - o))
            s2 = "".join(comp[c] for c in reversed(s2))
        else:
            s2 = "".join(random.choice(bases) for _ in range(120))
        q1 = "".join(random.choice(quals) for _ in range(120))
        q2 = "".join(random.choice(quals) for _ in range(120))
        out1.append(
            "@A00251:28:H3YV7DSXX:4:1101:%d:%d 1:N:0:TAAGTGGC\n%s\n+\n%s\n"
            % (x, y, s1, q1)
        )
        out2.append(
            "@A00251:28:H3YV7DSXX:4:1101:%d:%d 2:N:0:TAAGTGGC\n%s\n+\n%s\n"
            % (x, y, s2, q2)
        )
    _write("pe_R1.fq.gz", "".join(out1))
    _write("pe_R2.fq.gz", "".join(out2))

    out = []
    for i in range(200):
        L = random.randint(50, 200)
        seq = "".join(random.choice(bases) for _ in range(L))
        q = "".join(random.choice(quals) for _ in range(L))
        out.append(
            "@A00251:28:H3YV7DSXX:4:1101:%d:%d 1:N:0:TAAGTGGC\n%s\n+\n%s\n"
            % (random.randint(1000, 2097000), 1000 + i * 7, seq, q)
        )
    _write("se_varlen.fq.gz", "".join(out))


def batch_big():
    random.seed(7)
    bases = "ACGT"
    quals = "FF:,:F"
    comp = {"A": "T", "T": "A", "C": "G", "G": "C"}

    out = []
    for i in range(3000):
        seq, q = [], []
        for _ in range(100):
            if random.random() < 0.03:
                seq.append("N")
                q.append("#")
            else:
                seq.append(random.choice(bases))
                q.append(
                    "I" if (i > 2000 and random.random() < 0.01) else random.choice(quals)
                )
        out.append(
            "@A00251:28:H3YV7DSXX:4:1101:%d:%d 1:N:0:TAAGTGGC\n%s\n+\n%s\n"
            % (random.randint(1000, 30000), 1000 + i * 3, "".join(seq), "".join(q))
        )
    se_big = "".join(out)
    _write("se_big.fq.gz", se_big)
    _write("se_big_nonl.fq.gz", se_big[:-1])

    out1, out2 = [], []
    for i in range(1500):
        x = random.randint(1000, 30000)
        y = 1000 + i * 5
        s1 = "".join(random.choice(bases) for _ in range(120))
        if random.random() < 0.4:
            o = random.randint(15, 110)
            rc = "".join(comp[c] for c in reversed(s1[-o:]))
            s2 = rc + "".join(random.choice(bases) for _ in range(120 - o))
            s2 = "".join(comp[c] for c in reversed(s2))
        else:
            s2 = "".join(random.choice(bases) for _ in range(120))
        q1 = "".join(random.choice(quals) for _ in range(120))
        q2 = "".join(random.choice(quals) for _ in range(120))
        out1.append(
            "@A00251:28:H3YV7DSXX:4:1101:%d:%d 1:N:0:TAAGTGGC\n%s\n+\n%s\n"
            % (x, y, s1, q1)
        )
        out2.append(
            "@A00251:28:H3YV7DSXX:4:1101:%d:%d 2:N:0:TAAGTGGC\n%s\n+\n%s\n"
            % (x, y, s2, q2)
        )
    pe1, pe2 = "".join(out1), "".join(out2)
    _write("pe_big_R1.fq.gz", pe1)
    _write("pe_big_R2.fq.gz", pe2)
    _write("pe_nl1.fq.gz", pe1[:-1])
    _write("pe_nl2.fq.gz", pe2)

    out = []
    for i in range(500):
        seq = "".join(random.choice(bases) for _ in range(100))
        q = "".join(chr(33 + random.randint(0, 80)) for _ in range(100))
        out.append(
            "@A00251:28:H3YV7DSXX:4:1101:%d:%d 1:N:0:TAAGTGGC\n%s\n+\n%s\n"
            % (random.randint(1000, 30000), 1000 + i, seq, q)
        )
    _write("se_manyq.fq.gz", "".join(out))

    out = []
    for i in range(300):
        seq = list("".join(random.choice(bases) for _ in range(100)))
        q = [random.choice(quals) for _ in range(100)]
        if random.random() < 0.1:
            p = random.randint(0, 99)
            seq[p] = "N"
            q[p] = random.choice("#!")
        out.append(
            "@A00251:28:H3YV7DSXX:4:1101:%d:%d 1:N:0:TAAGTGGC\n%s\n+\n%s\n"
            % (random.randint(1000, 30000), 1000 + i, "".join(seq), "".join(q))
        )
    _write("se_fewn.fq.gz", "".join(out))





def batch_nov():
    """PE pairs with N bases inside overlap regions (seed 99)."""
    random.seed(99)
    bases = "ACGT"
    quals = "FF:,:F"
    comp = {"A": "T", "T": "A", "C": "G", "G": "C", "N": "N"}
    out1, out2 = [], []
    for i in range(400):
        x = random.randint(1000, 30000)
        y = 1000 + i * 3
        L = 110
        s1 = [random.choice(bases) for _ in range(L)]
        q1 = [random.choice(quals) for _ in range(L)]
        if random.random() < 0.15:
            p = random.randint(L - 40, L - 1)
            s1[p] = "N"
            q1[p] = random.choice(quals)
        if random.random() < 0.4:
            o = random.randint(15, 100)
            rc = [comp[c] for c in reversed(s1[-o:])]
            s2r = rc + [random.choice(bases) for _ in range(L - o)]
            s2 = [comp[c] for c in reversed(s2r)]
        else:
            s2 = [random.choice(bases) for _ in range(L)]
            if random.random() < 0.1:
                p = random.randint(0, L - 1)
                s2[p] = "N"
        q2 = [random.choice(quals) for _ in range(L)]
        out1.append(
            "@A00251:28:H3YV7DSXX:4:1101:%d:%d 1:N:0:TAAGTGGC\n%s\n+\n%s\n"
            % (x, y, "".join(s1), "".join(q1))
        )
        out2.append(
            "@A00251:28:H3YV7DSXX:4:1101:%d:%d 2:N:0:TAAGTGGC\n%s\n+\n%s\n"
            % (x, y, "".join(s2), "".join(q2))
        )
    _write("pe_nov_R1.fq.gz", "".join(out1))
    _write("pe_nov_R2.fq.gz", "".join(out2))


def batch_crlf():
    """CRLF-terminated SE file (seed 5) exercising the scalar reader."""
    random.seed(5)
    bases = "ACGT"
    quals = "FF:,:F"
    lines = []
    for i in range(150):
        seq = "".join(random.choice(bases) for _ in range(90))
        q = "".join(random.choice(quals) for _ in range(90))
        lines.append(
            "@A00251:28:H3YV7DSXX:4:1101:%d:%d 1:N:0:TAAGTGGC"
            % (random.randint(1000, 30000), 1000 + i)
        )
        lines.append(seq)
        lines.append("+")
        lines.append(q)
    _write("se_crlf.fq.gz", "\r\n".join(lines) + "\r\n")

if __name__ == "__main__":
    batch_small()
    batch_big()
    batch_nov()
    batch_crlf()
