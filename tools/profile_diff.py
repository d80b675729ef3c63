"""Differential in-dispatch profiling: run an op 1x vs 2x inside one jit
and take the increment — immune to the ~24 ms dispatch floor."""

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
    keys = rng.integers(0, 2**31 - 1, size=n_cap, dtype=np.int32)
    kd = jax.device_put(keys)
    meta = jax.device_put(
        rng.integers(0, 2**32 - 1, size=n_cap // 4, dtype=np.uint32))

    REPS = 4

    def diff(name, mk):
        # mk(r) -> jitted fn running the op r times (chained)
        f1, f2 = jax.jit(mk(1)), jax.jit(mk(2))
        o = f1(); o.block_until_ready()
        o = f2(); o.block_until_ready()
        t1 = t2 = 1e9
        for _ in range(REPS):
            t0 = time.time(); f1().block_until_ready()
            t1 = min(t1, time.time() - t0)
            t0 = time.time(); f2().block_until_ready()
            t2 = min(t2, time.time() - t0)
        print("  %-46s %7.2f ms  (1x %.1f, 2x %.1f)"
              % (name, (t2 - t1) * 1e3, t1 * 1e3, t2 * 1e3))
        return t2 - t1

    def mk_sort(r):
        def f():
            x = kd
            for i in range(r):
                x = jnp.sort(x ^ jnp.int32(i + 1))
            return x[::1024]
        return f

    diff("sort i32 n=11.8M", mk_sort)

    def mk_sort_m(r):
        def f():
            x = kd[:m]
            for i in range(r):
                x = jnp.sort(x ^ jnp.int32(i + 1))
            return x[::1024]
        return f

    diff("sort i32 m=2.1M", mk_sort_m)

    def mk_sort2op(r):
        def f():
            x = kd
            v = kd
            for i in range(r):
                x, v = jax.lax.sort((x ^ jnp.int32(i + 1), v), num_keys=1)
            return x[::1024] + v[::1024]
        return f

    diff("2-op lax.sort (i32,i32) n=11.8M", mk_sort2op)

    nbins = 3

    def mk_keys(r):
        def f():
            acc = jnp.int32(0)
            for i in range(r):
                mm = meta ^ jnp.uint32(i)
                j4 = 4 * jnp.arange(mm.shape[0], dtype=jnp.int32)
                planes = []
                for k in range(4):
                    bid_k = ((mm >> (8 * k)) & 0x7F).astype(jnp.int32)
                    pos_k = j4 + k
                    planes.append(jnp.where(
                        (bid_k & 63) <= nbins,
                        (bid_k << 24) | pos_k, jnp.int32(2**31 - 1)))
                keys = jnp.concatenate(planes)
                acc = acc + keys[::1024].sum()
            return acc
        return f

    diff("grouping KEY BUILD only (4 planes+concat)", mk_keys)

    def mk_group(r):
        def f():
            acc = jnp.int32(0)
            for i in range(r):
                mm = meta ^ jnp.uint32(i)
                j4 = 4 * jnp.arange(mm.shape[0], dtype=jnp.int32)
                planes = []
                for k in range(4):
                    bid_k = ((mm >> (8 * k)) & 0x7F).astype(jnp.int32)
                    pos_k = j4 + k
                    planes.append(jnp.where(
                        (bid_k & 63) <= nbins,
                        (bid_k << 24) | pos_k, jnp.int32(2**31 - 1)))
                keys = jnp.concatenate(planes)
                g = jnp.sort(keys)[:m]
                acc = acc + g[::1024].sum()
            return acc
        return f

    diff("grouping build+sort+slice", mk_group)

    def mk_group_barrier(r):
        def f():
            acc = jnp.int32(0)
            for i in range(r):
                mm = meta ^ jnp.uint32(i)
                j4 = 4 * jnp.arange(mm.shape[0], dtype=jnp.int32)
                planes = []
                for k in range(4):
                    bid_k = ((mm >> (8 * k)) & 0x7F).astype(jnp.int32)
                    pos_k = j4 + k
                    planes.append(jnp.where(
                        (bid_k & 63) <= nbins,
                        (bid_k << 24) | pos_k, jnp.int32(2**31 - 1)))
                keys = jnp.concatenate(planes)
                keys = jax.lax.optimization_barrier(keys)
                g = jnp.sort(keys)[:m]
                acc = acc + g[::1024].sum()
            return acc
        return f

    diff("grouping with barrier before sort", mk_group_barrier)

    def mk_cumsum(r):
        def f():
            x = kd
            for i in range(r):
                x = jnp.cumsum(x ^ jnp.int32(i))
            return x[::1024]
        return f

    diff("cumsum i32 n=11.8M", mk_cumsum)

    def mk_scatter(r):
        im = jnp.asarray(
            np.sort(np.random.default_rng(1).choice(
                8 * m, size=m, replace=False)).astype(np.int32))
        def f():
            out = jnp.zeros(8 * m, jnp.int32)
            for i in range(r):
                out = out.at[im].set(kd[:m] ^ jnp.int32(i), mode="drop")
            return out[::1024]
        return f

    diff("scatter m=2.1M unique sorted", mk_scatter)


if __name__ == "__main__":
    main()
