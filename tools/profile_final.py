"""Final, bulletproof primitive economics: SERIAL dispatches, FRESH
input buffers per call, floor measured with an identity op and
subtracted. Also: sustained-mode sanity (identical vs distinct buffers
across threads)."""

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
    base = rng.integers(0, 2**31 - 1, size=n_cap, dtype=np.int32)
    maskh = rng.random(n_cap) < 0.177
    keysh = np.where(maskh,
                     (rng.integers(0, 3, size=n_cap) << 24)
                     | np.arange(n_cap), 2**31 - 1).astype(np.int32)

    REPS = 3

    def measure(name, f, make_input, floor):
        fj = jax.jit(f)
        d = jax.device_put(make_input(0))
        jax.block_until_ready(fj(d))  # compile
        best = 1e9
        for r in range(REPS):
            d = jax.device_put(make_input(r + 1))
            jax.block_until_ready(d)
            t0 = time.time()
            jax.block_until_ready(fj(d))
            best = min(best, time.time() - t0)
        print("  %-56s %7.1f ms (wall %.1f - floor %.1f)"
              % (name, (best - floor) * 1e3, best * 1e3, floor * 1e3))
        return best - floor

    # floor: identity-ish op on the same input size, full-size output
    fid = jax.jit(lambda x: x + 1)
    d = jax.device_put(base)
    jax.block_until_ready(fid(d))
    floor = 1e9
    for r in range(4):
        d = jax.device_put(base ^ np.int32(r))
        jax.block_until_ready(d)
        t0 = time.time()
        jax.block_until_ready(fid(d))
        floor = min(floor, time.time() - t0)
    print("  floor (x+1 on 47MB, fresh buffer): %.1f ms" % (floor * 1e3))

    measure("sort n=11.8M uniform", lambda x: jnp.sort(x),
            lambda r: base ^ np.int32(r), floor)
    measure("sort n=11.8M 82%-INF keys", lambda x: jnp.sort(x),
            lambda r: keysh ^ np.int32(r & 0), floor)
    measure("sort m=2.1M", lambda x: jnp.sort(x),
            lambda r: (base[:m] ^ np.int32(r)), floor)
    measure("sort m/2=1.05M", lambda x: jnp.sort(x),
            lambda r: (base[: m // 2] ^ np.int32(r)), floor)
    measure("2-op sort (i32 keys, i32 payload) n",
            lambda x: jax.lax.sort((x, x ^ 7), num_keys=1),
            lambda r: keysh ^ np.int32(r & 0), floor)
    measure("2-op sort m=2.1M",
            lambda x: jax.lax.sort((x, x ^ 7), num_keys=1),
            lambda r: base[:m] ^ np.int32(r), floor)
    measure("cumsum n", lambda x: jnp.cumsum(x),
            lambda r: base ^ np.int32(r), floor)
    measure("cumsum n/4", lambda x: jnp.cumsum(x),
            lambda r: base[: n_cap // 4] ^ np.int32(r), floor)
    measure("cummax n", lambda x: jax.lax.cummax(x),
            lambda r: base ^ np.int32(r), floor)

    desth = np.sort(rng.choice(8 << 20, size=3_000_000,
                               replace=False)).astype(np.int32)

    measure("scatter-SET 3M unique -> 8.4MB u8",
            lambda d_: jnp.zeros(8 << 20, jnp.uint8).at[d_].set(
                (d_ & 0xFF).astype(jnp.uint8)),
            lambda r: desth, floor)
    measure("scatter-ADD 3M bytes -> u32 words",
            lambda d_: jnp.zeros((8 << 20) // 4, jnp.int32)
            .at[d_ >> 2].add((d_ & 0xFF) << (8 * (d_ & 3))),
            lambda r: desth, floor)
    measure("n-size scatter compaction (where+cumsum+set)",
            lambda x: jnp.zeros(4 << 20, jnp.int32).at[
                jnp.where(x != 2**31 - 1,
                          jnp.cumsum((x != 2**31 - 1).astype(jnp.int32))
                          - 1, jnp.int32(4 << 20))].set(x, mode="drop"),
            lambda r: keysh, floor)
    gsrc = jax.device_put(base)

    def g3(d_):
        return gsrc[jnp.clip(d_, 0, n_cap - 1)]

    # gsrc is a closure CONSTANT here — but gather of 3M from a constant
    # cannot be folded cheaply... measure anyway, flagged.
    measure("gather 3M from n i32 (src const - lower bound only)",
            g3, lambda r: desth ^ np.int32(r & 1), floor)

    measure("concat 4x(n/4) -> sort",
            lambda mm: jnp.sort(jnp.concatenate(
                [mm, mm ^ 1, mm ^ 2, mm ^ 3])),
            lambda r: base[: n_cap // 4] ^ np.int32(r), floor)
    measure("bitcast u8(n)->i32 materialized",
            lambda x: jax.lax.bitcast_convert_type(
                x.reshape(-1, 4), jnp.int32) + 1,
            lambda r: ((base ^ np.int32(r)) & 0xFF).astype(np.uint8),
            floor)

    from repaq_tpu.ops.pallas_tpu import (
        encode_frontend_keys,
        encode_frontend_meta32,
    )

    bins = np.frombuffer(b"#,:", dtype=np.uint8)
    bd = jax.device_put(bins)
    major = jnp.uint8(ord("F"))
    qp = rng.choice(np.frombuffer(b"FFFFFFFFFFFFFF:,#", np.uint8),
                    size=n_cap)

    measure("frontend meta32 kernel",
            lambda q32: encode_frontend_meta32(q32, q32, bd, major)[1],
            lambda r: (qp ^ np.uint8(r & 1)).view("<u4"), floor)
    measure("frontend KEYS kernel (packed+meta+keys)",
            lambda q32: encode_frontend_keys(q32, q32, bd, major)[2],
            lambda r: (qp ^ np.uint8(r & 1)).view("<u4"), floor)
    measure("frontend KEYS + sort n + slice m",
            lambda q32: jnp.sort(
                encode_frontend_keys(q32, q32, bd, major)[2])[:m],
            lambda r: (qp ^ np.uint8(r & 1)).view("<u4"), floor)

    # sustained sanity: identical vs distinct buffers across threads
    fsort = jax.jit(lambda x: jnp.sort(x))
    same = jax.device_put(base)
    distinct = [jax.device_put(base ^ np.int32(100 + i))
                for i in range(4)]
    jax.block_until_ready(fsort(same))

    def sus(bufs):
        def work(t):
            for _ in range(3):
                jax.block_until_ready(fsort(bufs[t % len(bufs)]))
        ths = [threading.Thread(target=work, args=(t,)) for t in range(4)]
        t0 = time.time()
        for t in ths:
            t.start()
        for t in ths:
            t.join()
        return (time.time() - t0) / 12

    print("  sustained sort, IDENTICAL buffer all threads: %.1f ms/call"
          % (sus([same]) * 1e3))
    print("  sustained sort, DISTINCT buffer per thread:   %.1f ms/call"
          % (sus(distinct) * 1e3))


if __name__ == "__main__":
    main()
