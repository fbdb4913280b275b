#!/usr/bin/env python
"""Device-tunnel health probe — run BEFORE recording any benchmark.

The axon tunnel degrades in distinct modes (observed and documented in
docs/PERFORMANCE.md): full stall (even a 4-byte device_get hangs),
per-process first-transfer stall (2-7 min, size-independent), and slow
regimes (bandwidth 1.5-2x off). Benchmarks recorded during degradation
understate the code. This prints a one-line JSON verdict:

  healthy   roundtrip < 5 s and upload >= 20 MB/s
  stalled   first roundtrip took > 60 s (or timed out upstream)
  slow      transfers complete but bandwidth < 20 MB/s

Usage: timeout 600 python tools/tunnel_probe.py
(exit 0 healthy / 2 slow / 3 stalled-but-recovered; a hard hang is the
caller's timeout).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    x = jnp.ones((8, 8), jnp.float32)
    np.asarray(x[:1, :1])
    t_round = time.time() - t0

    mb = 16
    # mb MiB of float32: mb * 262144 elements * 4 B  (a prior revision sent
    # mb/2 MiB but divided mb*4 by the time — an 8x bandwidth overstatement
    # that made the 'slow' verdict unreachable)
    host = np.random.default_rng(0).standard_normal(mb * 262144).astype(np.float32)
    t0 = time.time()
    dev = jax.device_put(host)
    np.asarray(dev[:1])
    t_up = time.time() - t0
    up_mbps = mb / t_up

    t0 = time.time()
    _ = np.asarray(dev)
    t_down = time.time() - t0
    down_mbps = mb / t_down

    # warm small-sync latency: the per-dispatch cost that pollutes kernel
    # timings (healthy ~30-40 ms; the first-transfer stall above excluded)
    lats = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(x[:1, :1])
        lats.append(time.time() - t0)
    sync_ms = sorted(lats)[len(lats) // 2] * 1000

    if t_round > 60:
        verdict, code = "stalled", 3
    elif up_mbps < 20:
        verdict, code = "slow", 2
    else:
        verdict, code = "healthy", 0
    print(
        json.dumps(
            {
                "verdict": verdict,
                "roundtrip_s": round(t_round, 2),
                "sync_ms": round(sync_ms, 1),
                "upload_mib_s": round(up_mbps, 1),
                "download_mib_s": round(down_mbps, 1),
                "backend": jax.default_backend(),
            }
        )
    )
    sys.exit(code)


if __name__ == "__main__":
    main()
