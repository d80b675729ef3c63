"""Honest ablation of the production flat decode step at the bench
shape."""

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
    from repaq_tpu.ops.pallas_tpu import unpack_bases_pallas

    device_engine._enable_compile_cache(jax)
    print("backend:", jax.devices())

    B, L = 77824, 152
    n = B * L
    rng = np.random.default_rng(0)
    bins = np.frombuffer(b"#,:", dtype=np.uint8)
    rq = rng.choice(np.frombuffer(b"FFFFFFFFFFFFFF:,#", np.uint8), size=n)
    rs = rng.choice(np.frombuffer(b"GATC", np.uint8), size=n)
    rnm = rng.random(n) < 0.001
    rs[rnm] = ord("N")
    rq[rnm] = ord("#")

    def bucket(x, cap):
        c = 1024
        while c < x:
            if c + (c >> 1) >= x:
                c += c >> 1
                break
            c *= 2
        return min(c, cap)

    qbuf = K.encode_qual_by_col(rq, bins, ord("F"))
    npbuf = K.encode_positions(np.flatnonzero(rnm))
    cnts = K.qualcol_decode_counts(qbuf, 3)
    tok_cap = bucket(cnts[0], n)
    pos_cap = bucket(cnts[1], n)
    if pos_cap == tok_cap:
        pos_cap += 4096
    qcap = bucket(qbuf.shape[0] + 8, n)
    ncap = bucket(npbuf.shape[0] + 8, n)
    npc = bucket(32 * npbuf.shape[0] + 8, n)
    print("qual_len=%d qcap=%d tok=%d(%d) pos=%d(%d)" % (
        qbuf.shape[0], qcap, cnts[0], tok_cap, cnts[1], pos_cap))
    packed_h = K.pack_2bit(np.where(rs == ord("N"), ord("G"),
                                    rs).astype(np.uint8))
    qpad = np.zeros(qcap, np.uint8)
    qpad[: qbuf.shape[0]] = qbuf
    npad = np.zeros(ncap, np.uint8)
    npad[: npbuf.shape[0]] = npbuf
    pd = jax.device_put(packed_h)
    qd = jax.device_put(qpad)
    nd = jax.device_put(npad)
    ql = jnp.int32(qbuf.shape[0])
    nl = jnp.int32(npbuf.shape[0])
    bd = jax.device_put(bins)
    major = jnp.uint8(ord("F"))

    def run(name, f):
        fj = jax.jit(f)
        o = fj(pd, qd, ql, nd, nl)
        _ = int(o)
        t0 = time.time()
        for _r in range(6):
            _ = int(fj(pd, qd, ql, nd, nl))
        ser = (time.time() - t0) / 6

        def work():
            outs = [fj(pd, qd, ql, nd, nl) for _ in range(3)]
            for ot in outs:
                _ = int(ot)

        ths = [threading.Thread(target=work) for _ in range(4)]
        t0 = time.time()
        for t in ths:
            t.start()
        for t in ths:
            t.join()
        sus = (time.time() - t0) / 12
        print("  %-46s serial %6.1f ms  sustained %6.1f ms"
              % (name, ser * 1e3, sus * 1e3))

    run("floor (scalar)", lambda p, qb, q, nb, nn: (p[0] + qb[0])
        .astype(jnp.int32))
    run("unpack only (checksum)",
        lambda p, qb, q, nb, nn: jnp.cumsum(
            unpack_bases_pallas(p)[:n].astype(jnp.int32))[-1])
    run("npos decode only",
        lambda p, qb, q, nb, nn: D.decode_positions_device(
            nb, nn, npc)[1])
    run("qualcol decode only (checksum)",
        lambda p, qb, q, nb, nn: jnp.cumsum(D.qualcol_decode_device(
            qb, 3, bd, major, n, q, tok_cap=tok_cap, pos_cap=pos_cap,
            esc_cap=0).astype(jnp.int32))[-1])

    def full(p, qb, q, nb, nn):
        seq = unpack_bases_pallas(p)[:n]
        pos, _c = D.decode_positions_device(nb, nn, npc)
        tgt = jnp.where(pos >= 0, pos, n)
        seq = jnp.concatenate([seq, jnp.zeros(1, jnp.uint8)])
        seq = seq.at[tgt].set(ord("N"), mode="drop")[:n]
        qual = D.qualcol_decode_device(
            qb, 3, bd, major, n, q, tok_cap=tok_cap, pos_cap=pos_cap,
            esc_cap=0)
        payload = device_engine.DeviceEngine._pack_payload([seq, qual])
        return jnp.sum(payload[:, 0].astype(jnp.int32)
                       ^ payload[:, 64].astype(jnp.int32))

    run("FULL decode + payload (checksum)", full)


if __name__ == "__main__":
    main()
