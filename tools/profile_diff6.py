"""Does XLA TPU sort cost depend on the VALUE pattern? Same jit
structure everywhere (1x vs 3x slope, constant-perturbed inputs):
uniform random vs 82%-duplicate-INF vs unique-high keys."""

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
    rng = np.random.default_rng(0)
    kd = jax.device_put(
        rng.integers(0, 2**31 - 1, size=n_cap, dtype=np.int32))
    # mask array: 17.7% "nonmajor"
    mask = jax.device_put((rng.random(n_cap) < 0.177))
    pos = jax.device_put(np.arange(n_cap, dtype=np.int32))
    bid = jax.device_put(
        rng.integers(0, 3, size=n_cap, dtype=np.int32))

    def diff(name, mk, r2=3):
        f1, f2 = jax.jit(mk(1)), jax.jit(mk(r2))
        o = f1(); jax.block_until_ready(o)
        o = f2(); jax.block_until_ready(o)
        t1 = t2 = 1e9
        for _ in range(4):
            t0 = time.time(); jax.block_until_ready(f1())
            t1 = min(t1, time.time() - t0)
            t0 = time.time(); jax.block_until_ready(f2())
            t2 = min(t2, time.time() - t0)
        per = (t2 - t1) / (r2 - 1)
        print("  %-56s %7.2f ms  (1x %.1f, %dx %.1f)"
              % (name, per * 1e3, t1 * 1e3, r2, t2 * 1e3))

    def mk_body(body):
        def gen(r):
            def f():
                acc = jnp.int32(0)
                for i in range(r):
                    acc = acc + body(i)
                return acc
            return f
        return gen

    inf = jnp.int32(2**31 - 1)

    diff("R0: sort(uniform random)[mid]",
         mk_body(lambda i: jnp.sort(kd ^ jnp.int32(i + 1))[n_cap // 2]))
    diff("R1: sort(82% INF dup, keys low)[mid]",
         mk_body(lambda i: jnp.sort(jnp.where(
             mask, (bid << 24) | (pos ^ jnp.int32(i)), inf))[n_cap // 2]))
    diff("R2: sort(UNIQUE: major=(4<<24)|pos)[mid]",
         mk_body(lambda i: jnp.sort(jnp.where(
             mask, (bid << 24) | pos,
             (jnp.int32(4) << 24) | (pos ^ jnp.int32(i))))[n_cap // 2]))
    diff("R3: sort(all-equal INF)[mid]",
         mk_body(lambda i: jnp.sort(
             jnp.zeros(n_cap, jnp.int32) + inf - (0 * (kd ^ jnp.int32(i)))
         )[n_cap // 2]))
    diff("R4: sort(already sorted = iota)[mid]",
         mk_body(lambda i: jnp.sort(pos ^ jnp.int32(i & 0))[n_cap // 2]
                 + jnp.int32(i)))
    diff("R5: sort(uniform) TWICE chained",
         mk_body(lambda i: jnp.sort(jnp.sort(
             kd ^ jnp.int32(i + 1)) ^ jnp.int32(7))[n_cap // 2]))

    # scatter building blocks (for the compaction-by-scatter plan)
    dest_h = np.sort(rng.choice(8 << 20, size=3_000_000,
                                replace=False)).astype(np.int32)
    dest = jax.device_put(dest_h)
    vals = jax.device_put(
        rng.integers(0, 256, size=3_000_000, dtype=np.int32))

    diff("S1: scatter-ADD 3M bytes into u32 words",
         mk_body(lambda i: jnp.zeros((8 << 20) // 4, jnp.int32)
                 .at[dest >> 2].add(((vals ^ jnp.int32(i)) & 0xFF)
                                    << (8 * (dest & 3)))[::512].sum()))
    diff("S2: scatter-SET 3M into u8 buf",
         mk_body(lambda i: jnp.zeros(8 << 20, jnp.uint8)
                 .at[dest].set(((vals ^ jnp.int32(i)) & 0xFF)
                               .astype(jnp.uint8))[::512]
                 .astype(jnp.int32).sum()))
    diff("S3: n-size scatter-SET (drop majors) into m buf",
         mk_body(lambda i: jnp.zeros(4 << 20, jnp.int32)
                 .at[jnp.where(mask, jnp.cumsum(mask.astype(jnp.int32))
                               - 1, 4 << 20)]
                 .set(kd ^ jnp.int32(i), mode="drop")[::512].sum()))
    diff("C1: cumsum i32 over n",
         mk_body(lambda i: jnp.cumsum(kd ^ jnp.int32(i))[n_cap // 2]))


if __name__ == "__main__":
    main()
