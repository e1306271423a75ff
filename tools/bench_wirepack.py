"""Microbench: device cost of the compact coef wire pack (round-4).

The round-3 compact wire format cut the 1080p batch-4 download
14.6 -> 6.8 MB but the fused device step went ~49 -> ~119 ms/frame;
this isolates which pack component costs what on the real chip.

    python tools/bench_wirepack.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    h, w = 1620, 1920          # 1080p coef plane (luma + chroma rows)
    rng = np.random.default_rng(7)
    base = rng.integers(-6, 7, size=(4, h, w)).astype(np.int16)
    # sprinkle escapes at the measured ~0.2% rate
    esc = rng.random((4, h, w)) < 0.002
    base = np.where(esc, rng.integers(-300, 300, (4, h, w)), base)
    x = jnp.asarray(base.astype(np.int16))

    def sync(v):
        return np.asarray(jnp.sum(jax.tree.leaves(v)[0].astype(jnp.int32)))

    def timeit(name, fn):
        f = jax.jit(fn)
        o = f(x)
        sync(o)
        t0 = time.time()
        for _ in range(5):
            o = f(x)
            sync(o)
        print(f"{name}: {(time.time()-t0)/5*1e3:.1f} ms")

    k = max(8, w // 64)

    timeit("baseline int16 passthrough", lambda c: c)

    def nib_only(c16):
        c = c16.astype(jnp.int32)
        nib = jnp.clip(c, -8, 7)
        nibu = (nib & 0xF).astype(jnp.uint8)
        return nibu[..., 0::2] | (nibu[..., 1::2] << 4)

    timeit("nib pack only", nib_only)

    def topk_only(c16):
        c = c16.astype(jnp.int32)
        _, cols = jax.lax.top_k(jnp.abs(c), k)
        vals = jnp.take_along_axis(c16, cols, axis=-1)
        return vals, cols.astype(jnp.int16)

    timeit(f"top_k (k={k}) only", topk_only)

    def lowhigh_only(c16):
        c = c16.astype(jnp.int32)
        low = (c & 0xFF).astype(jnp.uint8)
        high = (c16 >> 8).astype(jnp.int8)
        return low, high

    timeit("low/high planes only", lowhigh_only)

    def full_pack(c16):
        from x266_tpu.engine.fused import _pack_coefs_device
        return jax.vmap(_pack_coefs_device)(c16)

    timeit("full _pack_coefs_device", full_pack)

    # candidate replacement: cumsum-slot scatter compaction
    def make_scatter(kk):
        def cumsum_scatter(c16):
            c = c16.astype(jnp.int32)
            mask = c != 0
            slot = jnp.cumsum(mask, axis=-1) - 1
            slot = jnp.where(mask, jnp.minimum(slot, kk - 1), kk)
            hh = c.shape[-2]
            rows = jnp.broadcast_to(jnp.arange(hh)[:, None], (hh, w))
            colsv = jnp.broadcast_to(jnp.arange(w)[None, :], (hh, w))

            def one(sl, val):
                cols = jnp.zeros((hh, kk), jnp.int32).at[
                    rows, sl].set(colsv, mode="drop")
                vals = jnp.zeros((hh, kk), jnp.int16).at[
                    rows, sl].set(val, mode="drop")
                return vals, cols.astype(jnp.int16)

            return jax.vmap(one)(slot, c16)
        return cumsum_scatter

    timeit("cumsum+scatter nonzeros k=64", make_scatter(64))

    # larger-K top_k (full nonzero compaction candidates)
    for kk in (64, 128):
        def topk_big(c16, kk=kk):
            c = c16.astype(jnp.int32)
            _, cols = jax.lax.top_k(jnp.abs(c), kk)
            vals = jnp.take_along_axis(c16, cols, axis=-1)
            return vals, cols.astype(jnp.int16)

        timeit(f"top_k k={kk}", topk_big)

    # single-buffer wire: nib + esc + flat concatenated to one u8 blob
    def one_buffer(c16):
        c = c16.astype(jnp.int32)
        nib = jnp.clip(c, -8, 7)
        nibu = (nib & 0xF).astype(jnp.uint8)
        packed = nibu[..., 0::2] | (nibu[..., 1::2] << 4)
        _, cols = jax.lax.top_k(jnp.abs(c), k)
        vals = jnp.take_along_axis(c16, cols, axis=-1)
        def u8(x):
            b = jax.lax.bitcast_convert_type(
                x.astype(jnp.uint16), jnp.uint8)
            return b.reshape(x.shape[0], -1)

        blobs = [packed.reshape(packed.shape[0], -1), u8(vals),
                 u8(cols)]
        return jnp.concatenate(blobs, axis=-1)

    timeit("one-buffer (nib+esc) blob", one_buffer)

    # candidate: one-hot matmul compaction (MXU: W x K per row)
    def onehot_matmul(c16):
        c = c16.astype(jnp.int32)
        mask = (c > 7) | (c < -7)
        slot = jnp.cumsum(mask, axis=-1) - 1
        slot = jnp.where(mask, jnp.minimum(slot, k - 1), k)
        oh = jax.nn.one_hot(slot, k, dtype=jnp.float32)   # (..., W, K)
        colsv = jnp.arange(w, dtype=jnp.float32)
        cols = jnp.einsum("...wk,w->...k", oh, colsv)
        vals = jnp.einsum("...wk,...w->...k", oh,
                          c.astype(jnp.float32))
        return vals, cols

    timeit("one-hot matmul escapes (f32)", onehot_matmul)


if __name__ == "__main__":
    main()
