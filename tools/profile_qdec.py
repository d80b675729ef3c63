"""Ablate inside the words-mode qualcol decode."""

import sys
import threading
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from repaq_tpu.codec import device_engine
    from repaq_tpu.codec import kernels_np as K
    from repaq_tpu.ops import device_streams as D

    device_engine._enable_compile_cache(jax)
    print("backend:", jax.devices())
    B, L = 77824, 152
    n = B * L
    rng = np.random.default_rng(0)
    bins = np.frombuffer(b"#,:", dtype=np.uint8)
    rq = rng.choice(np.frombuffer(b"FFFFFFFFFFFFFF:,#", np.uint8), size=n)

    def bucket(x, cap):
        c = 1024
        while c < x:
            if c + (c >> 1) >= x:
                c += c >> 1
                break
            c *= 2
        return min(c, cap)

    qbuf = K.encode_qual_by_col(rq, bins, ord("F"))
    cnts = K.qualcol_decode_counts(qbuf, 3)
    tok_cap = bucket(cnts[0], n)
    pos_cap = bucket(cnts[1], n)
    if pos_cap == tok_cap:
        pos_cap += 4096
    run_cap = bucket(max(64, cnts[1] - cnts[0] + 2), n)
    qcap = bucket(qbuf.shape[0] + 8, n)
    qpad = np.zeros(qcap, np.uint8)
    qpad[: qbuf.shape[0]] = qbuf
    qd = jax.device_put(qpad)
    ql = jnp.int32(qbuf.shape[0])
    bd = jax.device_put(bins)
    major = jnp.uint8(ord("F"))
    nbins = 3
    m = qcap
    print("qcap=%d tok=%d pos=%d run=%d" % (qcap, cnts[0], cnts[1],
                                            cnts[1] - cnts[0]))

    def run(name, f):
        fj = jax.jit(f)
        o = fj(qd, ql)
        _ = int(o)
        t0 = time.time()
        for _r in range(6):
            _ = int(fj(qd, ql))
        ser = (time.time() - t0) / 6

        def work():
            outs = [fj(qd, ql) for _ in range(4)]
            for ot in outs:
                _ = int(ot)

        ths = [threading.Thread(target=work) for _ in range(4)]
        t0 = time.time()
        for t in ths:
            t.start()
        for t in ths:
            t.join()
        sus = (time.time() - t0) / 16
        print("  %-48s serial %6.1f ms  sustained %6.1f ms"
              % (name, ser * 1e3, sus * 1e3))

    def upto_starts(buf, total_len):
        lens_table = (
            buf[0 : 4 * nbins : 4].astype(jnp.int32)
            | (buf[1 : 4 * nbins + 1 : 4].astype(jnp.int32) << 8)
            | (buf[2 : 4 * nbins + 2 : 4].astype(jnp.int32) << 16)
            | (buf[3 : 4 * nbins + 3 : 4].astype(jnp.int32) << 24)
        )
        cum_lens = jnp.cumsum(lens_table)
        stream_begin = 4 * nbins + cum_lens - lens_table
        stream_end = 4 * nbins + cum_lens[-1]
        idx = jnp.arange(m, dtype=jnp.int32)
        in_streams = (idx >= 4 * nbins) & (idx < stream_end)
        force = jnp.zeros(m + 1, dtype=bool)
        force = force.at[jnp.minimum(stream_begin, m)].set(True,
                                                           mode="drop")
        force = force[:m] & in_streams
        lens_dev = jnp.where(in_streams, D._stream_lens_device(buf), 1)
        starts = D.token_start_mask_auto(lens_dev, force) & in_streams
        return starts, stream_begin, stream_end, idx

    run("A: FSM starts only",
        lambda qb, q: jnp.cumsum(
            upto_starts(qb, q)[0].astype(jnp.int32))[-1])

    def upto_compact(qb, q):
        starts, sb, se, idx = upto_starts(qb, q)
        w32 = (
            qb.astype(jnp.int32)
            | (jnp.roll(qb, -1).astype(jnp.int32) << 8)
            | (jnp.roll(qb, -2).astype(jnp.int32) << 16)
            | (jnp.roll(qb, -3).astype(jnp.int32) << 24)
        )
        inf = jnp.int32(2**31 - 1)
        keys = jnp.where(starts, idx, inf)
        tok_i, tok_w = jax.lax.sort((keys, w32), num_keys=1)
        return tok_i[:tok_cap], tok_w[:tok_cap]

    run("B: + w32 + compaction sort",
        lambda qb, q: jnp.cumsum(upto_compact(qb, q)[0])[tok_cap // 2])
    run("C: full words qualcol",
        lambda qb, q: jnp.cumsum(D.qualcol_decode_device(
            qb, nbins, bd, major, n, q, tok_cap=tok_cap,
            pos_cap=pos_cap, esc_cap=0, words_out=True,
            run_cap=run_cap))[-1])
    run("D: full legacy (u8) qualcol",
        lambda qb, q: jnp.cumsum(D.qualcol_decode_device(
            qb, nbins, bd, major, n, q, tok_cap=tok_cap,
            pos_cap=pos_cap, esc_cap=0).astype(jnp.int32))[-1])


if __name__ == "__main__":
    main()
