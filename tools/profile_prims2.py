"""Primitive rates with ALL inputs passed as jit ARGUMENTS (closure-
captured device arrays are baked in as constants and XLA constant-folds
whole sorts at compile time — the round-5 measurement trap). Sustained
(4 threads x 3) to amortize the ~24 ms dispatch floor, plus chained 1x/3x
slopes inside one dispatch where possible."""

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
    m = 2_097_152
    rng = np.random.default_rng(0)
    kd = jax.device_put(
        rng.integers(0, 2**31 - 1, size=n_cap, dtype=np.int32))
    meta = jax.device_put(
        rng.integers(0, 2**32 - 1, size=n_cap // 4, dtype=np.uint32))
    # realistic grouped keys: 17.7% (bid<<24|pos), rest INF
    maskh = rng.random(n_cap) < 0.177
    bidh = rng.integers(0, 3, size=n_cap)
    keysh = np.where(maskh, (bidh << 24) | np.arange(n_cap),
                     2**31 - 1).astype(np.int32)
    keys_d = jax.device_put(keysh)
    vals_d = jax.device_put(
        rng.integers(0, 256, size=n_cap, dtype=np.int32))
    desth = np.sort(rng.choice(8 << 20, size=3_000_000,
                               replace=False)).astype(np.int32)
    dest3 = jax.device_put(desth)
    v3 = jax.device_put(rng.integers(0, 256, size=3_000_000,
                                     dtype=np.int32))
    km = jax.device_put(keysh[:m])

    def sustained(fn, *args, nthreads=4, per=3):
        o = fn(*args); jax.block_until_ready(o)

        def work():
            outs = [fn(*args) for _ in range(per)]
            for ot in outs:
                jax.block_until_ready(ot)

        best = 1e9
        for _ in range(2):
            ths = [threading.Thread(target=work)
                   for _ in range(nthreads)]
            t0 = time.time()
            for t in ths:
                t.start()
            for t in ths:
                t.join()
            best = min(best, (time.time() - t0) / (nthreads * per))
        return best

    def run(name, f, *args):
        dt = sustained(jax.jit(f), *args)
        print("  %-56s %7.2f ms" % (name, dt * 1e3))

    run("sort n=11.8M (uniform, arg)", lambda x: jnp.sort(x), kd)
    run("sort n=11.8M (82%-INF keys, arg)", lambda x: jnp.sort(x), keys_d)
    run("sort n=11.8M + [:m] slice", lambda x: jnp.sort(x)[:m], keys_d)
    run("sort m=2.1M (keys, arg)", lambda x: jnp.sort(x), km)
    run("2-op sort (keys, payload) n=11.8M",
        lambda x, v: jax.lax.sort((x, v), num_keys=1), keys_d, vals_d)
    run("2-op sort (keys, u8 payload) n=11.8M",
        lambda x, v: jax.lax.sort((x, v.astype(jnp.uint8)), num_keys=1),
        keys_d, vals_d)
    run("keys build from meta32 (4 planes+concat)",
        lambda mm: jnp.concatenate([
            jnp.where((((mm >> (8 * k)) & 0x7F).astype(jnp.int32) & 63)
                      <= 3,
                      (((mm >> (8 * k)) & 0x7F).astype(jnp.int32) << 24)
                      | (4 * jnp.arange(mm.shape[0], dtype=jnp.int32)
                         + k),
                      jnp.int32(2**31 - 1)) for k in range(4)]), meta)
    run("cumsum n (arg)", lambda x: jnp.cumsum(x), kd)
    run("cummax n (arg)", lambda x: jax.lax.cummax(x), kd)
    run("cumsum words n/4 (arg)",
        lambda mm: jnp.cumsum(mm.astype(jnp.int32)), meta)
    run("scatter-SET 3M -> u8 8.4MB (args)",
        lambda d, v: jnp.zeros(8 << 20, jnp.uint8).at[d].set(
            v.astype(jnp.uint8)), dest3, v3)
    run("scatter-ADD 3M bytes -> u32 words (args)",
        lambda d, v: jnp.zeros((8 << 20) // 4, jnp.int32).at[d >> 2].add(
            (v & 0xFF) << (8 * (d & 3))), dest3, v3)
    run("n-size scatter compaction -> m buf (args)",
        lambda x: jnp.zeros(4 << 20, jnp.int32).at[
            jnp.where(x != 2**31 - 1,
                      jnp.cumsum((x != 2**31 - 1).astype(jnp.int32)) - 1,
                      4 << 20)].set(x, mode="drop"), keys_d)
    run("gather m from n (args)",
        lambda x, d: x[jnp.clip(d, 0, n_cap - 1)], kd, dest3)
    run("bitcast u8 n -> i32 (arg)",
        lambda x: jax.lax.bitcast_convert_type(
            x.astype(jnp.uint8).reshape(-1, 4), jnp.int32), kd)
    run("u32 concat 2x(n/4) as output (args)",
        lambda a, b: jnp.concatenate([a, b]), meta, meta)


if __name__ == "__main__":
    main()
