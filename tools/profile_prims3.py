"""Chained-in-one-dispatch slopes, rooted at jit ARGUMENTS (no constant
folding, no dispatch-floor ambiguity, no possibility of caching: each
step consumes the previous step's output)."""

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
    n_cap = n + (-n) % 512
    m = 2_097_152
    rng = np.random.default_rng(0)
    kd = jax.device_put(
        rng.integers(0, 2**31 - 1, size=n_cap, dtype=np.int32))
    maskh = rng.random(n_cap) < 0.177
    keysh = np.where(maskh,
                     (rng.integers(0, 3, size=n_cap) << 24)
                     | np.arange(n_cap), 2**31 - 1).astype(np.int32)
    keys_d = jax.device_put(keysh)
    km = jax.device_put(keysh[:m])
    desth = np.sort(rng.choice(8 << 20, size=3_000_000,
                               replace=False)).astype(np.int32)
    dest3 = jax.device_put(desth)

    def slope(name, chain, x0, k1=1, k2=5):
        # chain(x, i) -> array of same shape/dtype as x
        def mk(k):
            def f(x):
                for i in range(k):
                    x = chain(x, i)
                return x[::4096]
            return f

        f1, f2 = jax.jit(mk(k1)), jax.jit(mk(k2))
        jax.block_until_ready(f1(x0))
        jax.block_until_ready(f2(x0))
        t1 = t2 = 1e9
        for _ in range(4):
            t0 = time.time(); jax.block_until_ready(f1(x0))
            t1 = min(t1, time.time() - t0)
            t0 = time.time(); jax.block_until_ready(f2(x0))
            t2 = min(t2, time.time() - t0)
        per = (t2 - t1) / (k2 - k1)
        print("  %-52s %7.2f ms  (%dx %.1f, %dx %.1f)"
              % (name, per * 1e3, k1, t1 * 1e3, k2, t2 * 1e3))

    slope("sort n=11.8M uniform",
          lambda x, i: jnp.sort(x ^ jnp.int32(i + 1)), kd)
    slope("sort n=11.8M 82%-INF keys",
          lambda x, i: jnp.sort(x) ^ jnp.int32(0),  # idempotent but real
          keys_d)
    slope("sort m=2.1M keys", lambda x, i: jnp.sort(x ^ jnp.int32(i)), km)
    slope("cumsum n", lambda x, i: jnp.cumsum(x ^ jnp.int32(i)), kd)
    slope("scatter-SET 3M (chained via buf xor)",
          lambda x, i: jnp.zeros(3_000_000, jnp.int32).at[
              (x ^ jnp.int32(i)) % 3_000_000].set(x, mode="drop"),
          dest3)
    slope("n-scatter compaction (chained)",
          lambda x, i: jnp.concatenate([
              jnp.zeros(4 << 20, jnp.int32).at[
                  jnp.where(x != 2**31 - 1,
                            jnp.cumsum((x != 2**31 - 1)
                                       .astype(jnp.int32)) - 1,
                            jnp.int32(4 << 20))].set(x, mode="drop"),
              x[4 << 20:]]) ^ jnp.int32(i),
          keys_d)
    slope("elementwise 8-op n",
          lambda x, i: ((x * 3 + i) ^ (x >> 5)) + ((x << 2) | 7), kd)


if __name__ == "__main__":
    main()
