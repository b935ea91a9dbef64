"""Gather cost-model probe: ns per index vs (table size, row width, index
coherence) on the real TPU.

Extends docs/PERF.md's round-2 cost model (16-byte rows only) with the row
widths that matter for the trilinear design space: 16 B (one bilinear quad),
32 B (a candidate "duo row" carrying BOTH trilinear mip taps), 64 B (the
measured 4x dead end). Forced execution via index chaining inside one
lax.scan (no per-iteration host round trips), per PERF.md's measurement
pitfalls.

Usage: python tools/bench_gather.py [--n 2097152] [--iters 24]
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2 * 1024 * 1024,
                    help="indices per gather (~one 1080p pass)")
    ap.add_argument("--iters", type=int, default=24)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/tpu_renderer_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    rng = np.random.default_rng(0)
    n = args.n

    def bench(table_kb: int, row_u32: int, coherent: bool) -> float:
        rows = max(table_kb * 1024 // (row_u32 * 4), 8)
        table = jnp.asarray(
            rng.integers(0, 2**32, (rows, row_u32), dtype=np.uint32))
        if coherent:
            # image-like: neighboring indices address neighboring rows
            # (the shade stage's access pattern after the Hilbert sort)
            base = np.linspace(0, rows - 1, n).astype(np.int32)
            idx0 = np.clip(base + rng.integers(-2, 3, n), 0, rows - 1)
        else:
            idx0 = rng.integers(0, rows, n).astype(np.int32)
        idx0 = jnp.asarray(idx0.astype(np.int32))

        def step(carry, _):
            # chain: indices depend on the previous gather's checksum, so
            # the scan body cannot be elided or overlapped
            idx = (idx0 + carry) % rows
            g = table[idx]                      # THE gather
            s = (g[:, 0] & jnp.uint32(1)).astype(jnp.int32).sum()
            return s, None

        @jax.jit
        def run(c0):
            c, _ = jax.lax.scan(step, c0, None, length=args.iters)
            return c

        c = run(jnp.int32(0))
        _ = int(c)  # compile + warm
        t0 = time.perf_counter()
        c = run(jnp.int32(1))
        _ = int(c)  # forces the chain
        dt = time.perf_counter() - t0
        return dt / args.iters / n * 1e9

    print(f"{'table':>8} {'row B':>6} {'pattern':>9} {'ns/idx':>8} "
          f"{'ms/2.1Mpx':>10}")
    for kb in (256, 512, 1024, 2048, 6553):
        for row_u32 in (4, 8, 16):
            for coh in (False, True):
                ns = bench(kb, row_u32, coh)
                print(f"{kb:>6}KB {row_u32*4:>6} "
                      f"{'coherent' if coh else 'random':>9} {ns:>8.2f} "
                      f"{ns * 2.09e6 / 1e6:>10.2f}", flush=True)


if __name__ == "__main__":
    main()
