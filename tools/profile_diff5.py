"""Measure the u32-word scatter-add emission building blocks:
- scatter-add of byte<<lane into u32 words (dup word indices)
- u8 -> i32 bitcast relayout alone
- u32 concat as jit OUTPUT (no sort)
- the current _pack_payload
- unpack kernel + u8 bitcast
"""

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
    u8a = jax.device_put(
        rng.integers(0, 255, size=n_cap, dtype=np.uint8))
    u8b = jax.device_put(
        rng.integers(0, 255, size=n_cap, dtype=np.uint8))
    w32a = jax.device_put(
        rng.integers(0, 2**32 - 1, size=n_cap // 4, dtype=np.uint32))
    w32b = jax.device_put(
        rng.integers(0, 2**32 - 1, size=n_cap // 4, dtype=np.uint32))
    # ~3M sorted unique byte-dest offsets into an 8.4MB stream
    dest_h = np.sort(rng.choice(8 << 20, size=3_000_000,
                                replace=False)).astype(np.int32)
    dest = jax.device_put(dest_h)
    vals = jax.device_put(
        rng.integers(0, 256, size=3_000_000, dtype=np.int32))

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
        print("  %-54s %7.2f ms  (1x %.1f, %dx %.1f)"
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

    # scatter-add bytes into u32 words (duplicate word indices expected)
    def sadd(i):
        v = (vals ^ jnp.int32(i)) & 0xFF
        w = jnp.zeros((8 << 20) // 4, jnp.int32)
        w = w.at[dest >> 2].add(v << (8 * (dest & 3)))
        return w[::512].sum()

    diff("S1: scatter-ADD 3M bytes into u32 words", mk_body(sadd))

    def sset(i):
        v = (vals ^ jnp.int32(i)) & 0xFF
        w = jnp.zeros(8 << 20, jnp.uint8)
        w = w.at[dest].set(v.astype(jnp.uint8))
        return w[::512].astype(jnp.int32).sum()

    diff("S2: scatter-SET 3M bytes into u8 buffer", mk_body(sset))

    diff("B1: bitcast u8(n) -> i32 materialized",
         mk_body(lambda i: jax.lax.bitcast_convert_type(
             (u8a ^ jnp.uint8(i)).reshape(-1, 4), jnp.int32
         )[::512, 0].sum()))
    diff("B2: bitcast u32 -> u8(n) materialized",
         mk_body(lambda i: jax.lax.bitcast_convert_type(
             (w32a ^ jnp.uint32(i))[:, None], jnp.uint8
         ).reshape(-1)[::512].astype(jnp.int32).sum()))

    def payload_u8(i):
        from repaq_tpu.codec.device_engine import DeviceEngine

        return DeviceEngine._pack_payload(
            [u8a ^ jnp.uint8(i), u8b])[::64, 0].sum()

    diff("P1: current _pack_payload (u8 concat+bitcast)",
         mk_body(payload_u8))

    def payload_u32(i):
        w = jnp.concatenate([w32a ^ jnp.uint32(i), w32b])
        return w.reshape(-1, 128)[::64, 0].astype(jnp.int32).sum()

    diff("P2: u32 concat payload (no bitcast)", mk_body(payload_u32))

    from repaq_tpu.ops.pallas_tpu import unpack_bases_pallas

    packed = jax.device_put(
        rng.integers(0, 255, size=n_cap // 4, dtype=np.uint8))

    diff("U1: unpack kernel + bitcast to u8",
         mk_body(lambda i: unpack_bases_pallas(
             packed ^ jnp.uint8(i))[::512].astype(jnp.int32).sum()))

    # gather: PE expansion-style byte gather of n from n
    src = jax.device_put(((np.arange(n_cap) * 7919) % n_cap)
                         .astype(np.int32))

    diff("G1: gather n u8 by arbitrary idx",
         mk_body(lambda i: (u8a ^ jnp.uint8(i))[src][::512]
                 .astype(jnp.int32).sum()))


if __name__ == "__main__":
    main()
