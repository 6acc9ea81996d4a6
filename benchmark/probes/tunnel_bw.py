"""Probe: host<->device link bandwidth + round-trip latency on this backend."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    d = jax.devices()[0]
    print("device:", d)
    # latency: tiny round trip
    x = jnp.zeros((8,), jnp.int32)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(10):
        _ = int(jnp.sum(x))
    lat = (time.perf_counter() - t0) / 10
    print(f"round-trip latency: {lat*1000:.1f} ms")
    for mb in (1, 4, 16):
        n = mb * 1024 * 1024 // 4
        h = np.arange(n, dtype=np.int32)
        t0 = time.perf_counter()
        xd = jax.device_put(h)
        jax.block_until_ready(xd)
        up = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = np.asarray(xd)
        down = time.perf_counter() - t0
        print(f"{mb:3d} MB  up {mb/up:7.1f} MB/s  down {mb/down:7.1f} MB/s")


if __name__ == "__main__":
    main()
