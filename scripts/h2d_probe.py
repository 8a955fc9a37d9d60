"""Characterize the tunneled TPU's H2D path for the page-upload design:

  * serial vs concurrent uploads at serving-relevant sizes;
  * compressible (mostly-0xFF synthetic-page-like) vs random payloads —
    if the tunnel compresses in flight, dense white pages are already
    cheap and a host-side sparse encoding buys nothing;
  * device-side sparse decode cost: unpackbits + cumsum + take_along_axis
    (monotone gather) at page scale, the candidate decode for a
    mask+values upload encoding.
"""

import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

import _bootstrap  # noqa: F401  (repo-root import shim)


def main():
    import jax
    import jax.numpy as jnp
    print('devices:', jax.devices(), file=sys.stderr)

    dev = jax.devices()[0]
    pool = ThreadPoolExecutor(max_workers=32)

    def bench_h2d(label, parts):
        # fresh buffers each rep (defeat any host-side caching)
        t0 = time.perf_counter()
        if len(parts) > 1:
            futs = [pool.submit(jax.device_put, p, dev) for p in parts]
            jax.block_until_ready([f.result() for f in futs])
        else:
            jax.block_until_ready(jax.device_put(parts[0], dev))
        dt = time.perf_counter() - t0
        total = sum(p.nbytes for p in parts)
        print(f'H2D {label}: {dt * 1e3:.0f}ms, {total / dt / 1e6:.1f}MB/s')
        return dt

    rng = np.random.default_rng(0)
    MB = 1 << 20

    def pagelike(nbytes):
        """~90% 0xFF background + text-like runs, per synthetic pages."""
        a = np.full(nbytes, 255, np.uint8)
        n_txt = nbytes // 10
        pos = rng.integers(0, nbytes - 8, n_txt // 8)
        for off in range(8):
            a[pos + off] = rng.integers(0, 255)
        return a

    for mk, kind in [(lambda n: rng.integers(0, 255, n, dtype=np.uint8),
                      'random'), (pagelike, 'pagelike')]:
        bench_h2d(f'1 x 11MB {kind}', [mk(11 * MB)])
        bench_h2d(f'4 x 2.8MB {kind} concurrent',
                  [mk(11 * MB // 4) for _ in range(4)])
        bench_h2d(f'8 x 1.4MB {kind} concurrent',
                  [mk(11 * MB // 8) for _ in range(8)])
        bench_h2d(f'1 x 2.8MB {kind}', [mk(11 * MB // 4)])

    # --- device-side sparse decode cost ---------------------------------
    B, H, W = 16, 496, 736
    HW = H * W
    K = 1 << 16
    frac = 0.12

    mask = rng.random((B, HW)) < frac
    counts = mask.sum(axis=1)
    print('nonwhite per page:', counts.min(), counts.max(), 'K =', K)
    packed = np.packbits(mask, axis=1)
    values = rng.integers(0, 255, (B, K), dtype=np.uint8)

    @jax.jit
    def decode(packed_bits, vals):
        m = jnp.unpackbits(packed_bits, axis=1)[:, :HW]
        idx = jnp.cumsum(m.astype(jnp.int32), axis=1) - 1
        idx = jnp.clip(idx, 0, K - 1)
        px = jnp.take_along_axis(vals, idx, axis=1)
        page = jnp.where(m > 0, px, jnp.uint8(255))
        return page.reshape(B, H, W, 1)

    pb = jax.device_put(packed, dev)
    vb = jax.device_put(values, dev)
    out = jax.block_until_ready(decode(pb, vb))  # compile
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = decode(pb, vb)
    np.asarray(out[0, 0, 0, 0])  # force completion with a D2H pull
    dt = (time.perf_counter() - t0) / reps
    print(f'sparse decode (B={B}, HW={HW}, K={K}): {dt * 1e3:.1f}ms/launch')

    # sanity: decode reproduces the dense page
    dense = np.where(mask, np.take_along_axis(
        values, np.clip(np.cumsum(mask, axis=1) - 1, 0, K - 1), axis=1),
        255).astype(np.uint8).reshape(B, H, W, 1)
    ok = np.array_equal(np.asarray(out), dense)
    print('decode exact:', ok)


if __name__ == '__main__':
    main()
