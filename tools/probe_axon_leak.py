"""Dev probe: the axon tunnel client retains a host-side copy of EVERY
host->device transfer for the life of the process (r5 finding — the
1869-frame eval envelope grew host RSS by exactly uploaded-bytes, 3.1 GB,
while CPU runs of the identical code stayed flat).

This is framework-free evidence: 100 raw jax.device_put calls of a 2.5 MB
numpy array leak ~256 MB of RSS, and neither `del`, explicit `.delete()`,
nor `block_until_ready` reclaims it.  Consequence for the framework: on
this backend, per-frame UPLOAD BYTES are a host-memory leak rate — the
compact eval payload (texture_gan._eval_compact_transform, ~1.6 MB/frame
vs 7.4 MB f32) is a 4.6x mitigation, and the envelope's O(1)-frame memory
check must use jax.live_arrays() device bytes (the actual contract), not
host RSS.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax


def rss():
    for line in open("/proc/self/status"):
        if line.startswith("VmRSS:"):
            return int(line.split()[1]) / 1e3


def main():
    import gc
    x = np.random.rand(640 * 1024).astype(np.float32)  # 2.5 MB
    f = jax.jit(lambda a: a.sum())
    print("backend:", jax.default_backend())
    for mode in ("del", "delete", "block+del"):
        r0 = rss()
        for _ in range(100):
            d = jax.device_put(x)
            if mode == "block+del":
                d.block_until_ready()
            float(f(d))
            if mode == "delete":
                d.delete()
            else:
                del d
        gc.collect()
        time.sleep(1)
        print(f"100 x device_put(2.5MB) [{mode}]: "
              f"rss {r0:.0f} -> {rss():.0f} MB "
              f"(leak {(rss() - r0) / 100:.2f} MB per transfer)")


if __name__ == "__main__":
    main()
