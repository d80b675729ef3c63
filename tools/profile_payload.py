"""Payload-pack variants on the production SE step: u8-concat+bitcast-i32
(current) vs u8-concat reshape 2-D (no bitcast) vs no payload (parts).
Also times an actual D2H fetch of each payload form."""

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
            if c + (c >> 1) >= x:
                c += c >> 1
                break
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

    def parts_of(s, q, x, y):
        packed, meta32 = encode_frontend_meta32(s, q, bd, major)
        packed = packed[: (n_cap + 3) // 4]
        qo, ql = D.qualcol_encode_device(
            None, bd, major, None, esc_cap=0, nonmajor_cap=nm_cap,
            out_size=q_out, meta32=meta32, qual32=q, n=n_cap)
        no, nl = D.encode_positions_from_meta32(meta32, n_cap, np_out,
                                                pos_cap=np_cap)
        xy, xl, yl = D.coords_encode2_device(jnp.stack([x, y]), 3 * B + 8)
        lens = jnp.stack([ql, nl, xl, yl]).astype(jnp.int32)
        return [packed, qo[:q_out], no, xy,
                device_engine.DeviceEngine._lens_bytes(lens)], ql

    def step_i32(s, q, x, y):
        parts, ql = parts_of(s, q, x, y)
        return device_engine.DeviceEngine._pack_payload(parts), ql

    def step_u8(s, q, x, y):
        parts, ql = parts_of(s, q, x, y)
        flat = jnp.concatenate(parts)
        pad = (-flat.shape[0]) % 512
        if pad:
            flat = jnp.concatenate([flat, jnp.zeros(pad, jnp.uint8)])
        return flat.reshape(-1, 512), ql

    def step_none(s, q, x, y):
        parts, ql = parts_of(s, q, x, y)
        return parts, ql

    def run(name, f):
        fj = jax.jit(f)
        o = fj(s32, q32, xd, yd)
        _ = int(o[1])
        t0 = time.time()
        for _r in range(6):
            _ = int(fj(s32, q32, xd, yd)[1])
        ser = (time.time() - t0) / 6

        def work():
            outs = [fj(s32, q32, xd, yd) for _ in range(3)]
            for ot in outs:
                _ = int(ot[1])

        ths = [threading.Thread(target=work) for _ in range(4)]
        t0 = time.time()
        for t in ths:
            t.start()
        for t in ths:
            t.join()
        sus = (time.time() - t0) / 12
        print("  %-40s serial %6.1f ms  sustained %6.1f ms -> %4.0f MB/s"
              % (name, ser * 1e3, sus * 1e3, 2 * n / 1e6 / sus))
        return fj

    f_i32 = run("payload i32 (current)", step_i32)
    f_u8 = run("payload u8 2-D (no bitcast)", step_u8)
    run("no payload (raw parts)", step_none)

    # fetch timings
    o = f_i32(s32, q32, xd, yd)[0]
    o.block_until_ready()
    t0 = time.time()
    a = np.asarray(o)
    print("  fetch i32 payload %.1f MB: %.0f ms" % (
        a.nbytes / 1e6, (time.time() - t0) * 1e3))
    o = f_u8(s32, q32, xd, yd)[0]
    o.block_until_ready()
    t0 = time.time()
    a = np.asarray(o)
    print("  fetch u8 2-D payload %.1f MB: %.0f ms" % (
        a.nbytes / 1e6, (time.time() - t0) * 1e3))


if __name__ == "__main__":
    main()
