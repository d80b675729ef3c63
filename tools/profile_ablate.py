"""Honest ablation of the production SE encode step: inputs as args,
order-dependent scalar outputs (no DCE/rewrite), int() fetch per call
(forces true completion), serial + sustained."""

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

    def run(name, f, fetch):
        fj = jax.jit(f)
        o = fj(s32, q32, xd, yd)
        fetch(o)
        t0 = time.time()
        for _ in range(6):
            fetch(fj(s32, q32, xd, yd))
        ser = (time.time() - t0) / 6

        def work():
            outs = [fj(s32, q32, xd, yd) for _ in range(3)]
            for ot in outs:
                fetch(ot)

        ths = [threading.Thread(target=work) for _ in range(4)]
        t0 = time.time()
        for t in ths:
            t.start()
        for t in ths:
            t.join()
        sus = (time.time() - t0) / 12
        print("  %-46s serial %6.1f ms   sustained %6.1f ms"
              % (name, ser * 1e3, sus * 1e3))

    def fetch_scalar(o):
        return int(o if not isinstance(o, tuple) else o[0])

    # floor reference
    run("floor: (q32 ^ s32)[0] scalar",
        lambda s, q, x, y: (q[0] ^ s[0]).astype(jnp.int32),
        fetch_scalar)

    def qualcol(s, q):
        _packed, meta32 = encode_frontend_meta32(s, q, bd, major)
        return D.qualcol_encode_device(
            None, bd, major, None, esc_cap=0, nonmajor_cap=nm_cap,
            out_size=q_out, meta32=meta32, qual32=q, n=n_cap)

    run("frontend only (meta sum-scalar)",
        lambda s, q, x, y: jnp.cumsum(
            encode_frontend_meta32(s, q, bd, major)[1]
            .astype(jnp.int32))[-1],
        fetch_scalar)

    def grouping_only(s, q, x, y):
        _p, meta32 = encode_frontend_meta32(s, q, bd, major)
        j4 = 4 * jnp.arange(meta32.shape[0], dtype=jnp.int32)
        planes = []
        for k in range(4):
            bid_k = ((meta32 >> (8 * k)) & 0x7F).astype(jnp.int32)
            pos_k = j4 + k
            planes.append(jnp.where(
                (bid_k <= 3) & (pos_k < n_cap),
                (bid_k << 24) | pos_k, jnp.int32(2**31 - 1)))
        grouped = jnp.sort(jnp.concatenate(planes))[:nm_cap]
        return jnp.cumsum(grouped)[nm_cap // 2]

    run("frontend + grouping sort", grouping_only, fetch_scalar)

    run("frontend + qualcol FULL (len only fetched)",
        lambda s, q, x, y: qualcol(s, q)[1], fetch_scalar)

    run("qualcol + stream checksum (forces emission)",
        lambda s, q, x, y: (
            lambda o: jnp.cumsum(o[0].astype(jnp.int32))[q_out // 2] + o[1]
        )(qualcol(s, q)), fetch_scalar)

    def full_step(s, q, x, y, with_np=True, with_xy=True, pay=True):
        packed, meta32 = encode_frontend_meta32(s, q, bd, major)
        packed = packed[: (n_cap + 3) // 4]
        qo, ql = D.qualcol_encode_device(
            None, bd, major, None, esc_cap=0, nonmajor_cap=nm_cap,
            out_size=q_out, meta32=meta32, qual32=q, n=n_cap)
        acc = ql
        parts = [packed, qo[:q_out]]
        if with_np:
            no, nl = D.encode_positions_from_meta32(
                meta32, n_cap, np_out, pos_cap=np_cap)
            acc = acc + nl
            parts.append(no)
        if with_xy:
            xo, xl = D.coords_encode_device(x, 3 * B + 8)
            yo, yl = D.coords_encode_device(y, 3 * B + 8)
            acc = acc + xl + yl
            parts += [xo, yo]
        if pay:
            payload = device_engine.DeviceEngine._pack_payload(parts)
            return jnp.sum(payload[:, 0] ^ payload[:, 64]) + acc
        chks = sum(jnp.cumsum(p.astype(jnp.int32))[-1] for p in parts)
        return chks + acc

    run("FULL step + payload pack (checksum)",
        lambda s, q, x, y: full_step(s, q, x, y), fetch_scalar)
    run("FULL step, checksums instead of payload",
        lambda s, q, x, y: full_step(s, q, x, y, pay=False),
        fetch_scalar)
    run("step w/o npos (payload)",
        lambda s, q, x, y: full_step(s, q, x, y, with_np=False),
        fetch_scalar)
    run("step w/o coords (payload)",
        lambda s, q, x, y: full_step(s, q, x, y, with_xy=False),
        fetch_scalar)


if __name__ == "__main__":
    main()
