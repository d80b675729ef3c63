"""Stage-level profile of the production device encode/decode step on the
real chip (same shapes/profile as bench.bench_device_production).

Times each stage in isolation (own jit, outputs materialized) plus the full
step, serial and sustained. Run directly on a TPU host/tunnel:

    python tools/profile_device_encode.py [--quick]
"""

import sys
import threading
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from repaq_tpu.codec import device_engine
    from repaq_tpu.ops import device_streams as D
    from repaq_tpu.ops.pallas_tpu import encode_frontend_meta32

    device_engine._enable_compile_cache(jax)
    print("backend:", jax.devices())

    B, L = 77824, 152  # 11.8 Mbase, the engine's largest bucketed shape
    n = B * L
    n_cap = n + ((-n) % 512)
    rng = np.random.default_rng(0)
    bins = np.frombuffer(b"#,:", dtype=np.uint8)
    rq = rng.choice(np.frombuffer(b"FFFFFFFFFFFFFF:,#", np.uint8), size=n)
    rs = rng.choice(np.frombuffer(b"GATC", np.uint8), size=n)
    rnm = rng.random(n) < 0.001
    rs[rnm] = ord("N")
    rq[rnm] = ord("#")
    xs = rng.integers(1000, 40000, size=B).astype(np.int32)
    ys = rng.integers(1000, 40000, size=B).astype(np.int32)

    def bucket(x, cap):
        c = 1024
        while c < x:
            c *= 2
        return min(c, cap)

    nm = int((rq != ord("F")).sum())
    nm_cap = bucket(nm, n)
    np_cap = bucket(int(rnm.sum()), n)
    q_out = bucket(12 + 4 * nm + 8, n)
    np_out = bucket(4 * int(rnm.sum()) + 16, n)
    print("n=%d nonmajor=%d (%.1f%%) nm_cap=%d q_out=%d" % (
        n, nm, 100.0 * nm / n, nm_cap, q_out))

    sp = np.full(n_cap, ord("G"), np.uint8)
    sp[:n] = rs
    qp = np.full(n_cap, ord("F"), np.uint8)
    qp[:n] = rq
    s32 = jax.device_put(sp.view("<u4"))
    q32 = jax.device_put(qp.view("<u4"))
    bd = jax.device_put(bins)
    xd, yd = jax.device_put(xs), jax.device_put(ys)
    major = jnp.uint8(ord("F"))

    REPS = 6

    def sustained_t(fn, sync, nthreads=4, per=4):
        def work():
            outs_t = [fn() for _ in range(per)]
            for ot in outs_t:
                sync(ot)
        ths = [threading.Thread(target=work) for _ in range(nthreads)]
        t0 = time.time()
        for th in ths:
            th.start()
        for th in ths:
            th.join()
        return (time.time() - t0) / (nthreads * per)

    def timeit(name, fn, sync):
        o = fn()
        sync(o)
        t0 = time.time()
        outs = [fn() for _ in range(REPS)]
        for o in outs:
            sync(o)
        dt = (time.time() - t0) / REPS
        dts = sustained_t(fn, sync)
        print("  %-38s %7.2f ms serial  %7.2f ms sustained"
              % (name, dt * 1e3, dts * 1e3))
        return dts

    # ---- stage: frontend ----
    fe = jax.jit(lambda s, q: encode_frontend_meta32(s, q, bd, major))
    timeit("frontend (pack+meta32)", lambda: fe(s32, q32),
           lambda o: o[0].block_until_ready())

    # meta32 input for downstream stages (materialized once)
    _, meta32_v = fe(s32, q32)
    meta32_v.block_until_ready()

    # ---- stage: grouping sort alone (keys build + sort + slice) ----
    nbins = 3

    def grouping(meta32):
        j4 = 4 * jnp.arange(meta32.shape[0], dtype=jnp.int32)
        planes = []
        for k in range(4):
            bid_k = ((meta32 >> (8 * k)) & 0x7F).astype(jnp.int32)
            pos_k = j4 + k
            planes.append(jnp.where(
                (bid_k <= nbins) & (pos_k < n_cap),
                (bid_k << 24) | pos_k, jnp.int32(2**31 - 1),
            ))
        keys_g = jnp.concatenate(planes)
        return jnp.sort(keys_g)[:nm_cap]

    gr = jax.jit(grouping)
    timeit("grouping sort (n keys -> nm_cap)", lambda: gr(meta32_v),
           lambda o: o.block_until_ready())
    grouped_v = gr(meta32_v)
    grouped_v.block_until_ready()

    # ---- stage: classification + emission given grouped ----
    def qual_from_grouped(grouped, qual32):
        # replicate qualcol_encode_device's tail from the grouped keys
        m = grouped.shape[0]
        g_bid = grouped >> 24
        g_pos = grouped & ((1 << 24) - 1)
        is_stream = g_bid < nbins
        seg_start = jnp.concatenate(
            [jnp.array([True]), g_bid[1:] != g_bid[:-1]])
        delta, emits_run, covered, g1, g2, g4 = \
            D._classify_stream_positions(g_pos, seg_start, is_stream)
        b0, counts, ttype = D._stream_b0(
            delta, emits_run, covered, g1, g2, g4)
        cum = jnp.cumsum(counts)
        dest = 4 * nbins + (cum - counts)
        total = 4 * nbins + (cum[-1] if m else 0)

        def tail(midx):
            t = D._gather1(ttype, midx)
            v = D._gather1(delta, midx) - 1
            p = D._gather1(g_pos, midx)
            b1 = jnp.where(t == 1, v & 0xFF,
                           jnp.where(t == 2, (v >> 16) & 0xFF, 0))
            b2 = jnp.where(t == 2, (v >> 8) & 0xFF, 0)
            b3 = jnp.where(t == 2, v & 0xFF, 0)
            return jnp.stack([b1, b2, b3], axis=1).astype(jnp.int32)

        bounds = jnp.searchsorted(
            g_bid, jnp.arange(nbins + 1, dtype=g_bid.dtype), side="left")
        cumz = jnp.concatenate([jnp.zeros(1, cum.dtype), cum])
        lens = (cumz[bounds[1:]] - cumz[bounds[:-1]]).astype(jnp.uint32)
        hdr = jnp.stack([lens & 0xFF, (lens >> 8) & 0xFF,
                         (lens >> 16) & 0xFF, (lens >> 24) & 0xFF],
                        axis=1).astype(jnp.int32).reshape(-1)
        hdr_off = jnp.arange(4 * nbins, dtype=jnp.int32)
        multi_cap = min(nm_cap, nbins * (n_cap // 128 + n_cap // 16384 + 8))
        return D._emit_sort_lazy(
            b0, counts, q_out, dest, total, multi_cap, tail, w=4,
            extra=(hdr_off, hdr),
            first_mask=(counts >= 1) & is_stream,
        )

    qg = jax.jit(qual_from_grouped)
    timeit("classify+emit (from grouped)", lambda: qg(grouped_v, q32),
           lambda o: o[0].block_until_ready())

    # ---- stage: full qualcol ----
    qc = jax.jit(lambda m32, q: D.qualcol_encode_device(
        None, bd, major, None, esc_cap=0, nonmajor_cap=nm_cap,
        out_size=q_out, meta32=m32, qual32=q, n=n_cap))
    timeit("qualcol full", lambda: qc(meta32_v, q32),
           lambda o: o[0].block_until_ready())

    # ---- stage: npos ----
    npf = jax.jit(lambda m32: D.encode_positions_from_meta32(
        m32, n_cap, np_out, pos_cap=np_cap))
    timeit("npos stream", lambda: npf(meta32_v),
           lambda o: o[0].block_until_ready())

    # ---- stage: coords ----
    cf = jax.jit(lambda x: D.coords_encode_device(x, 3 * B + 8))
    timeit("coords (one of two)", lambda: cf(xd),
           lambda o: o[0].block_until_ready())

    # ---- full step (as bench) ----
    def step(s32_, q32_, x, y):
        packed, meta32 = encode_frontend_meta32(s32_, q32_, bd, major)
        packed = packed[: (n_cap + 3) // 4]
        qo, ql = D.qualcol_encode_device(
            None, bd, major, None, esc_cap=0,
            nonmajor_cap=nm_cap, out_size=q_out,
            meta32=meta32, qual32=q32_, n=n_cap)
        no, nl = D.encode_positions_from_meta32(meta32, n_cap, np_out,
                                                pos_cap=np_cap)
        xo, xl = D.coords_encode_device(x, 3 * B + 8)
        yo, yl = D.coords_encode_device(y, 3 * B + 8)
        return packed, qo, ql, no, nl, xo, xl, yo, yl

    fr = jax.jit(step)
    dt = timeit("FULL encode step", lambda: fr(s32, q32, xd, yd),
                lambda o: o[1].block_until_ready())
    print("  -> serial %.0f MB/s (2n=%d bytes)" % (2 * n / 1e6 / dt, 2 * n))

    # sustained
    def sustained(fn, sync, nthreads=4, per=4):
        def work():
            outs_t = [fn() for _ in range(per)]
            for ot in outs_t:
                sync(ot)
        ths = [threading.Thread(target=work) for _ in range(nthreads)]
        t0 = time.time()
        for th in ths:
            th.start()
        for th in ths:
            th.join()
        return (time.time() - t0) / (nthreads * per)

    dt = sustained(lambda: fr(s32, q32, xd, yd),
                   lambda o: o[1].block_until_ready())
    print("  FULL encode sustained: %.2f ms -> %.0f MB/s/chip" % (
        dt * 1e3, 2 * n / 1e6 / dt))


if __name__ == "__main__":
    main()
