"""Primitive-rate measurements on the real chip: sort / scatter / scan /
gather at the sizes the encode step uses. Informs the round-5 redesign."""

import sys
import threading
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
    vals = rng.integers(0, 256, size=n_cap, dtype=np.int32)
    kd = jax.device_put(keys)
    vd = jax.device_put(vals)
    km = jax.device_put(keys[:m])
    vm = jax.device_put(vals[:m])
    idxm = np.sort(rng.choice(8 * m, size=m, replace=False)).astype(np.int32)
    im = jax.device_put(idxm)
    meta = jax.device_put(
        rng.integers(0, 2**32 - 1, size=n_cap // 4, dtype=np.uint32))

    def sustained(fn, sync, nthreads=4, per=3):
        o = fn(); sync(o)          # compile
        def work():
            outs = [fn() for _ in range(per)]
            for ot in outs:
                sync(ot)
        ths = [threading.Thread(target=work) for _ in range(nthreads)]
        t0 = time.time()
        for th in ths:
            th.start()
        for th in ths:
            th.join()
        return (time.time() - t0) / (nthreads * per)

    def run(name, f, sync=None):
        fn = jax.jit(f)
        sy = sync or (lambda o: o.block_until_ready())
        dt = sustained(fn, sy)
        print("  %-44s %7.2f ms" % (name, dt * 1e3))

    run("sort i32 packed n=11.8M", lambda: jnp.sort(kd))
    run("sort i32 packed m=2.1M", lambda: jnp.sort(km))
    run("sort u32 n=11.8M", lambda: jnp.sort(kd.astype(jnp.uint32)))
    run("2-op lax.sort (i32,i32) n=11.8M",
        lambda: jax.lax.sort((kd, vd), num_keys=1),
        sync=lambda o: o[0].block_until_ready())
    run("2-op lax.sort (i32,i32) m=2.1M",
        lambda: jax.lax.sort((km, vm), num_keys=1),
        sync=lambda o: o[0].block_until_ready())
    run("2-op lax.sort (i32,u8) n=11.8M",
        lambda: jax.lax.sort((kd, vd.astype(jnp.uint8)), num_keys=1),
        sync=lambda o: o[0].block_until_ready())
    run("scatter m=2.1M unique-sorted into 16.8M",
        lambda: jnp.zeros(8 * m, jnp.int32).at[im].set(vm, mode="drop"))
    run("scatter m=2.1M into n (u8)",
        lambda: jnp.zeros(8 * m, jnp.uint8).at[im].set(
            vm.astype(jnp.uint8), mode="drop"))
    run("cumsum i32 n=11.8M", lambda: jnp.cumsum(kd))
    run("cummax i32 n=11.8M", lambda: jax.lax.cummax(kd))
    run("3x masked cummax (B=3) n=11.8M",
        lambda: jax.lax.cummax(
            jnp.where((vd[None, :] % 3) == jnp.arange(3)[:, None],
                      kd[None, :], -1), axis=1))
    run("gather m=2.1M from n i32", lambda: kd[im % n])
    run("elementwise 6-pass n=11.8M",
        lambda: ((kd * 3 + 1) ^ (kd >> 5)) + ((kd << 2) | 7))
    # the real grouping: keys from meta32 planes + sort + slice
    nbins = 3

    def grouping():
        j4 = 4 * jnp.arange(meta.shape[0], dtype=jnp.int32)
        planes = []
        for k in range(4):
            bid_k = ((meta >> (8 * k)) & 0x7F).astype(jnp.int32)
            pos_k = j4 + k
            planes.append(jnp.where(
                (bid_k % 23 <= nbins),
                (bid_k << 24) | pos_k, jnp.int32(2**31 - 1)))
        return jnp.sort(jnp.concatenate(planes))[:m]

    run("grouping build+sort+slice n=11.8M", grouping)


if __name__ == "__main__":
    main()
