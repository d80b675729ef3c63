"""Isolate what makes grouping (build+sort+slice) cost ~28 ms when the
sort and the key build individually measure ~free."""

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
    kd = jax.device_put(
        rng.integers(0, 2**31 - 1, size=n_cap, dtype=np.int32))
    meta = jax.device_put(
        rng.integers(0, 2**32 - 1, size=n_cap // 4, dtype=np.uint32))
    nbins = 3

    def diff(name, mk, r1=1, r2=3):
        f1, f2 = jax.jit(mk(r1)), jax.jit(mk(r2))
        o = f1(); o.block_until_ready()
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

    def keys_of(i):
        mm = meta ^ jnp.uint32(i)
        j4 = 4 * jnp.arange(mm.shape[0], dtype=jnp.int32)
        planes = []
        for k in range(4):
            bid_k = ((mm >> (8 * k)) & 0x7F).astype(jnp.int32)
            pos_k = j4 + k
            planes.append(jnp.where(
                (bid_k & 63) <= nbins,
                (bid_k << 24) | pos_k, jnp.int32(2**31 - 1)))
        return jnp.concatenate(planes)

    def mk(body):
        def gen(r):
            def f():
                acc = jnp.int32(0)
                for i in range(r):
                    acc = acc + body(i)
                return acc
            return f
        return gen

    diff("A: sort(elementwise fresh keys), full sum",
         mk(lambda i: jnp.sort(kd ^ jnp.int32(i + 1))[::1024].sum()))
    diff("B: sort(elementwise fresh keys)[:m]",
         mk(lambda i: jnp.sort(kd ^ jnp.int32(i + 1))[:m][::1024].sum()))
    diff("C: sort(planes+concat keys), full",
         mk(lambda i: jnp.sort(keys_of(i))[::1024].sum()))
    diff("D: sort(planes+concat keys)[:m]",
         mk(lambda i: jnp.sort(keys_of(i))[:m][::1024].sum()))
    diff("E: keys only",
         mk(lambda i: keys_of(i)[::1024].sum()))
    diff("F: sort(kd+iota mix, fresh)",
         mk(lambda i: jnp.sort(
             kd + jnp.arange(n_cap, dtype=jnp.int32) * jnp.int32(i)
         )[::1024].sum()))


if __name__ == "__main__":
    main()
