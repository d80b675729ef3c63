"""Measure the pallas-key-emission grouping fix + emission-concat
alternatives on the real chip."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from repaq_tpu.codec import device_engine
    from repaq_tpu.ops import device_streams as D
    from repaq_tpu.ops.pallas_tpu import (
        encode_frontend_keys,
        encode_frontend_meta32,
    )

    device_engine._enable_compile_cache(jax)
    print("backend:", jax.devices())

    B, L = 77824, 152
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

    sp = np.full(n_cap, ord("G"), np.uint8)
    sp[:n] = rs
    qp = np.full(n_cap, ord("F"), np.uint8)
    qp[:n] = rq
    s32 = jax.device_put(sp.view("<u4"))
    q32 = jax.device_put(qp.view("<u4"))
    bd = jax.device_put(bins)
    xd, yd = jax.device_put(xs), jax.device_put(ys)
    major = jnp.uint8(ord("F"))

    def diff(name, mk, r1=1, r2=3):
        f1, f2 = jax.jit(mk(1)), jax.jit(mk(r2))
        o = f1(); jax.block_until_ready(o)
        o = f2(); jax.block_until_ready(o)
        t1 = t2 = 1e9
        for _ in range(4):
            t0 = time.time(); jax.block_until_ready(f1())
            t1 = min(t1, time.time() - t0)
            t0 = time.time(); jax.block_until_ready(f2())
            t2 = min(t2, time.time() - t0)
        per = (t2 - t1) / (r2 - r1)
        print("  %-52s %7.2f ms  (1x %.1f, %dx %.1f)"
              % (name, per * 1e3, t1 * 1e3, r2, t2 * 1e3))

    def mk_body(body):
        def gen(r):
            def f():
                acc = jnp.int32(0)
                for i in range(r):
                    acc = acc + body(i)
                return acc
            return f
        return gen

    diff("N1: frontend_keys kernel only",
         mk_body(lambda i: encode_frontend_keys(
             s32 if i == 0 else (s32 | jnp.uint32(0)), q32, bd, major
         )[2][::1024].sum()))
    diff("N2: frontend_keys + sort[:m] (new grouping)",
         mk_body(lambda i: jnp.sort(encode_frontend_keys(
             s32 if i == 0 else (s32 | jnp.uint32(0)), q32, bd, major
         )[2])[:nm_cap][::512].sum()))

    def full_new(i):
        packed, meta32, keys = encode_frontend_keys(
            s32 if i == 0 else (s32 | jnp.uint32(0)), q32, bd, major)
        packed = packed[: (n_cap + 3) // 4]
        qo, ql = D.qualcol_encode_device(
            None, bd, major, None, esc_cap=0, nonmajor_cap=nm_cap,
            out_size=q_out, meta32=meta32, qual32=q32, n=n_cap,
            keys_g=keys)
        no, nl = D.encode_positions_from_meta32(meta32, n_cap, np_out,
                                                pos_cap=np_cap)
        xo, xl = D.coords_encode_device(xd, 3 * B + 8)
        yo, yl = D.coords_encode_device(yd, 3 * B + 8)
        return (packed[::1024].astype(jnp.int32).sum() + ql + nl + xl + yl
                + qo[::1024].astype(jnp.int32).sum())

    diff("N4: FULL new SE step", mk_body(full_new))

    # correctness: new qualcol bytes == host kernels
    from repaq_tpu.codec import kernels_np as K

    def once():
        packed, meta32, keys = encode_frontend_keys(s32, q32, bd, major)
        return D.qualcol_encode_device(
            None, bd, major, None, esc_cap=0, nonmajor_cap=nm_cap,
            out_size=q_out, meta32=meta32, qual32=q32, n=n_cap,
            keys_g=keys)

    qo, ql = jax.jit(once)()
    want = K.encode_qual_by_col(rq, bins, ord("F"))
    got = np.asarray(qo)[: int(ql)].tobytes()
    assert got == want.tobytes(), "NEW qualcol bytes mismatch!"
    print("  new qualcol path: byte-exact vs host kernels")

    # emission-concat alternatives: prematerialized concat vs DUS
    m = nm_cap
    p0 = jax.device_put(rng.integers(0, 2**30, size=m, dtype=np.int32))
    p1 = jax.device_put(rng.integers(0, 2**30, size=m // 2,
                                     dtype=np.int32))

    diff("W2: sort(concat(premat a,b))",
         mk_body(lambda i: jnp.sort(jnp.concatenate(
             [p0 ^ jnp.int32(i), p1]))[::512].sum()))

    def dus(i):
        buf = jnp.zeros(m + m // 2, jnp.int32)
        buf = jax.lax.dynamic_update_slice(buf, p0 ^ jnp.int32(i), (0,))
        buf = jax.lax.dynamic_update_slice(buf, p1, (m,))
        return jnp.sort(buf)[::512].sum()

    diff("W1: sort(dyn-update-slice built)", mk_body(dus))

    def padded2d(i):
        # pad to a (2, m) matrix, flatten by reshape (contiguous)
        a = p0 ^ jnp.int32(i)
        b = jnp.concatenate([p1, jnp.full(m - m // 2, 2**31 - 1,
                                          jnp.int32)])
        return jnp.sort(jnp.stack([a, b]).reshape(-1))[::512].sum()

    diff("W3: sort(stack-2d reshape, padded)", mk_body(padded2d))


if __name__ == "__main__":
    main()
