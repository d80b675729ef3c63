"""Batched axis-sort rates vs one flat sort (honest: args + sustained +
serial with int() fetch of an order-dependent scalar)."""

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
    n_cap = n + (-n) % 512
    rng = np.random.default_rng(0)
    kd = jax.device_put(
        rng.integers(0, 2**31 - 1, size=n_cap, dtype=np.int32))

    def run(name, f):
        fj = jax.jit(f)
        o = fj(kd)
        _ = int(o)
        t0 = time.time()
        for _r in range(5):
            _ = int(fj(kd))
        ser = (time.time() - t0) / 5

        def work():
            outs = [fj(kd) for _ in range(3)]
            for ot in outs:
                _ = int(ot)

        ths = [threading.Thread(target=work) for _ in range(4)]
        t0 = time.time()
        for t in ths:
            t.start()
        for t in ths:
            t.join()
        sus = (time.time() - t0) / 12
        print("  %-52s serial %6.1f ms  sustained %6.1f ms"
              % (name, ser * 1e3, sus * 1e3))

    run("flat sort n=11.8M",
        lambda x: jnp.cumsum(jnp.sort(x))[n_cap // 2])
    for C in (4, 8, 16, 64):
        run("batched sort (%d, %d) axis=-1" % (C, n_cap // C),
            lambda x, C=C: jnp.cumsum(
                jnp.sort(x.reshape(C, -1), axis=-1).reshape(-1)
            )[n_cap // 2])
    run("2-op flat sort n=11.8M",
        lambda x: jnp.cumsum(jax.lax.sort(
            (x, x ^ 7), num_keys=1)[1])[n_cap // 2])
    for C in (8, 16):
        def f2(x, C=C):
            xr = x.reshape(C, -1)
            k, v = jax.lax.sort((xr, xr ^ 7), num_keys=1, dimension=1)
            return jnp.cumsum(v.reshape(-1))[n_cap // 2]
        run("2-op batched sort (%d, .) axis=-1" % C, f2)
    run("flat sort m=2.1M",
        lambda x: jnp.cumsum(jnp.sort(x[: 1 << 21]))[1 << 20])
    run("flat sort 8.87M (3n/4... decode qb_cap)",
        lambda x: jnp.cumsum(jnp.sort(x[: 8_871_936]))[1 << 20])


if __name__ == "__main__":
    main()
