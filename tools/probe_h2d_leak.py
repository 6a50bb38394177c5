"""Isolate the host-memory growth seen in long train runs (ssd512_ft
OOM-killed at ~130 GB anon RSS, iter 4960; rfbnet_ft measured +17.7
MB/iter ~= 2x its u8 image-batch bytes).

Hypothesis: every host->device transfer's staging memory is retained
for process lifetime (axon plugin side), i.e. RSS grows by ~bytes
transferred, independent of our object lifetimes.

This probe does nothing but device_put a fresh 25 MB uint8 array in a
loop (the SSD512 train-batch payload), fully syncing and dropping every
reference, and prints RSS + live jax array count every 10 transfers.
  - our-code retention   -> live_arrays grows
  - plugin staging leak  -> RSS grows ~25 MB/transfer, live_arrays flat
  - no leak              -> RSS flat

Variants probed: plain device_put; device_put with a NamedSharding
(shard_batch's path); jnp.asarray-then-device_put (the exact
shard_batch composition)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from odtpu.utils.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0


def run(tag, fn, n=40):
    base = rss_mb()
    for i in range(1, n + 1):
        x = np.ones((32, 512, 512, 3), np.uint8)  # 25.2 MB, fresh each time
        y = fn(x)
        y.block_until_ready()
        del x, y
        if i % 10 == 0:
            print("%s: %d transfers, rss +%.1f MB (%.2f MB/transfer), "
                  "live arrays %d" % (tag, i, rss_mb() - base,
                                      (rss_mb() - base) / i,
                                      len(jax.live_arrays())), flush=True)


def main():
    dev = jax.devices()[0]
    print("backend:", dev.platform, dev, flush=True)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))
    sharded = NamedSharding(mesh, P("data"))

    run("plain device_put", lambda x: jax.device_put(x, dev))
    run("device_put + NamedSharding", lambda x: jax.device_put(x, sharded))
    run("jnp.asarray -> device_put (shard_batch path)",
        lambda x: jax.device_put(jnp.asarray(x), sharded))


if __name__ == "__main__":
    main()
