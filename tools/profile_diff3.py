"""Nail the sort-input-pattern cost: concat vs stack vs bitcast vs pure
elementwise, with output correctness asserts so nothing is DCE'd."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from repaq_tpu.codec import device_engine
    device_engine._enable_compile_cache(jax)
    print("backend:", jax.devices())

    n = 11_829_248
    n_cap = n + ((-n) % 512)
    m = 2_097_152
    rng = np.random.default_rng(0)
    kd_h = rng.integers(0, 2**31 - 1, size=n_cap, dtype=np.int32)
    kd = jax.device_put(kd_h)
    meta_h = rng.integers(0, 2**32 - 1, size=n_cap // 4, dtype=np.uint32)
    meta = jax.device_put(meta_h)
    nbins = 3

    def diff(name, mk, check=None, r1=1, r2=3):
        f1, f2 = jax.jit(mk(r1)), jax.jit(mk(r2))
        o = f1(); o.block_until_ready()
        if check is not None:
            assert check(np.asarray(o)), "%s: WRONG RESULT" % name
        o = f2(); o.block_until_ready()
        t1 = t2 = 1e9
        for _ in range(4):
            t0 = time.time(); f1().block_until_ready()
            t1 = min(t1, time.time() - t0)
            t0 = time.time(); f2().block_until_ready()
            t2 = min(t2, time.time() - t0)
        per = (t2 - t1) / (r2 - r1)
        print("  %-52s %7.2f ms  (%dx %.1f, %dx %.1f)"
              % (name, per * 1e3, r1, t1 * 1e3, r2, t2 * 1e3))

    # A-check: is the sort real? return the MEDIAN element of each sort.
    want_med = np.sort(kd_h ^ np.int32(1))[n_cap // 2]

    def mk_A(r):
        def f():
            acc = jnp.int32(0)
            for i in range(r):
                acc = acc + jnp.sort(kd ^ jnp.int32(i + 1))[n_cap // 2]
            return acc
        return f

    med_sum = {1: int(want_med), 3: None}
    diff("A: sort(kd^const), median checked", mk_A,
         check=lambda v: v == want_med)

    def planes_of(i):
        mm = meta ^ jnp.uint32(i)
        j4 = 4 * jnp.arange(mm.shape[0], dtype=jnp.int32)
        out = []
        for k in range(4):
            bid_k = ((mm >> (8 * k)) & 0x7F).astype(jnp.int32)
            pos_k = j4 + k
            out.append(jnp.where(
                (bid_k & 63) <= nbins,
                (bid_k << 24) | pos_k, jnp.int32(2**31 - 1)))
        return out

    def mk_body(body):
        def gen(r):
            def f():
                acc = jnp.int32(0)
                for i in range(r):
                    acc = acc + body(i)
                return acc
            return f
        return gen

    diff("C: sort(concat(planes))[m//2]",
         mk_body(lambda i: jnp.sort(
             jnp.concatenate(planes_of(i)))[m // 2]))
    diff("G: sort(stack(planes,1).reshape)[m//2]",
         mk_body(lambda i: jnp.sort(
             jnp.stack(planes_of(i), axis=1).reshape(-1))[m // 2]))

    def bytekeys(i):
        mm = meta ^ jnp.uint32(i)
        b8 = jax.lax.bitcast_convert_type(
            mm[:, None], jnp.uint8).reshape(-1)
        bid = (b8 & 0x7F).astype(jnp.int32)
        pos = jnp.arange(n_cap, dtype=jnp.int32)
        return jnp.where((bid & 63) <= nbins, (bid << 24) | pos,
                         jnp.int32(2**31 - 1))

    diff("H: sort(bitcast-u8 keys)[m//2]",
         mk_body(lambda i: jnp.sort(bytekeys(i))[m // 2]))
    diff("J: sort(kd masked-inf where)[m//2]",
         mk_body(lambda i: jnp.sort(jnp.where(
             (kd & 255) > 60, jnp.int32(2**31 - 1),
             kd ^ jnp.int32(i + 1)))[m // 2]))
    diff("K: sort(kd+iota*i)[n//2]",
         mk_body(lambda i: jnp.sort(
             kd + jnp.arange(n_cap, dtype=jnp.int32) * jnp.int32(i)
         )[n_cap // 2]))
    # two-operand emission-style sort: concat'ed offsets + byte payload
    vd = jax.device_put(
        rng.integers(0, 256, size=n_cap, dtype=np.int32))

    def mk_2op(r):
        def f():
            acc = jnp.int32(0)
            for i in range(r):
                ks = jnp.concatenate(planes_of(i))
                so, sv = jax.lax.sort((ks, vd), num_keys=1)
                acc = acc + so[m // 2] + sv[m // 2]
            return acc
        return f

    diff("L: 2-op sort(concat planes, payload)", mk_2op)

    def mk_2op_flat(r):
        def f():
            acc = jnp.int32(0)
            for i in range(r):
                so, sv = jax.lax.sort(
                    (kd ^ jnp.int32(i + 1), vd), num_keys=1)
                acc = acc + so[m // 2] + sv[m // 2]
            return acc
        return f

    diff("M: 2-op sort(elementwise keys, payload)", mk_2op_flat)


if __name__ == "__main__":
    main()
