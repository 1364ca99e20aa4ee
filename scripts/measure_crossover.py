"""Measure the host-vs-device batch-size crossover for the offload policy.

The auto offload policy (filters/read_level._device_offload_enabled) only
engages above ARRIBA_TPU_DEVICE_MIN_ROWS. This script MEASURES where that
crossover actually sits on the current machine/accelerator pair for the
low-entropy scan (the heaviest wired per-read device op): host = the C++
low_entropy_scan_flat on one core; device = ops/readfilters.low_entropy_batch
including host->device transfer of freshly-built arrays (the product's real
dispatch pattern, not a device-resident loop).

Usage: python scripts/measure_crossover.py [--sizes 4096,16384,65536,262144]
Prints a table and a suggested ARRIBA_TPU_DEVICE_MIN_ROWS.
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sizes", default="4096,16384,65536,262144")
    parser.add_argument("--read-len", type=int, default=152)
    args = parser.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    L = args.read_len

    rng = np.random.default_rng(7)
    crossover = None
    print(f"{'rows':>8} {'host_cpp_s':>11} {'device_s':>10} {'winner':>8}")
    for n in sizes:
        codes = rng.integers(0, 4, (n, L)).astype(np.uint8)
        lengths = np.full(n, L - 2, np.int32)
        w0 = np.full(n, 5, np.int32)
        w1 = np.full(n, L - 10, np.int32)

        # host: C++ single-core scan over the flat byte stream
        host_s = float("nan")
        try:
            from arriba_tpu import _native
            seqs = (codes + ord("A")).astype(np.uint8)  # any 4-letter bytes
            flat = seqs.reshape(-1).tobytes()
            offs = np.arange(n + 1, dtype=np.int64) * L
            flags = np.zeros(n, np.uint8)
            t0 = time.perf_counter()
            _native.low_entropy_scan_flat(flat, offs, w0, w1, w0, w1, flags,
                                          0.6, 3)
            host_s = time.perf_counter() - t0
        except Exception as error:  # noqa: BLE001
            print(f"host path unavailable: {error}", file=sys.stderr)

        # device: jit'd op + fresh transfers (the product dispatch pattern)
        device_s = float("nan")
        try:
            import jax
            import jax.numpy as jnp

            from arriba_tpu.ops.readfilters import low_entropy_batch

            op = jax.jit(low_entropy_batch, static_argnames=("kmer_content",))

            def run():
                out = op(jnp.asarray(codes), jnp.asarray(lengths),
                         jnp.asarray(w0), jnp.asarray(w1), jnp.asarray(w0),
                         jnp.asarray(w1), 0.6)
                return np.asarray(out)

            run()  # compile
            t0 = time.perf_counter()
            run()
            device_s = time.perf_counter() - t0
        except Exception as error:  # noqa: BLE001
            print(f"device path unavailable: {error}", file=sys.stderr)

        winner = "device" if device_s < host_s else "host"
        if winner == "device" and crossover is None:
            crossover = n
        print(f"{n:>8} {host_s:>11.4f} {device_s:>10.4f} {winner:>8}")

    if crossover is None:
        print("\nno crossover found in the measured range: the host wins at "
              "every size here (keep auto offload disabled; "
              "ARRIBA_TPU_DEVICE_MIN_ROWS above the largest measured size)")
    else:
        print(f"\nsuggested ARRIBA_TPU_DEVICE_MIN_ROWS={crossover}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
