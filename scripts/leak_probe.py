"""Measure host RSS growth per train step on the real chip to localize the
~3 GB/epoch leak that OOM-killed the r5 convergence run (124 GB RSS).

Phases:
  A: train_step loop with a FIXED on-host batch (fresh device transfer each
     step happens inside jit arg staging) -> isolates the step itself.
  B: same but fresh numpy batch each step (like the real loader).
  C: per-epoch jax.device_get(state) fetches.

Measured 2026-08-19 (v5e via axon tunnel, ViT-B B=8, r4b config):
  A (fixed batch):  +25 MB/step  (0.49 GB / 20 steps)
  B (fresh batch):  +25 MB/step  (identical)
  C (device_get(state) x5): flat after the first fetch -> no leak
Conclusion: the leak is per host->device argument transfer in the
tunnel client, independent of the Python-side buffer lifetime.
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp


def rss_gb():
    with open("/proc/self/status") as f:
        for ln in f:
            if ln.startswith("VmRSS"):
                return int(ln.split()[1]) / 1e6
    return -1.0


from wildlifemapper_tpu.config import config_from_json
from wildlifemapper_tpu.train.step import StepBuilder

cfg = config_from_json(open("/tmp/prof/r4b_train/config.json").read())
print("devices", jax.devices(), flush=True)

B = cfg.data.batch_size
T = cfg.data.max_targets
rng = np.random.default_rng(0)


def make_batch():
    return {
        "image": rng.integers(0, 255, (B, 1024, 1024, 3), dtype=np.uint8),
        "labels": rng.integers(0, 7, (B, T)).astype(np.int32),
        "boxes": rng.uniform(0.2, 0.6, (B, T, 4)).astype(np.float32),
        "valid": (np.arange(T)[None] < 60).repeat(B, 0),
        "size": np.full((B, 2), 768, np.int32),
    }


builder = StepBuilder(cfg)
params = builder.init_params(jax.random.PRNGKey(0), batch_size=1)
state = builder.init_state(params, steps_per_epoch=116)
train_step = builder.jit_train_step()
key = jax.random.PRNGKey(1)

fixed = make_batch()
state, m = train_step(state, fixed, key)
print("compiled; warm RSS %.2f GB" % rss_gb(), flush=True)

print("--- phase A: fixed batch", flush=True)
base = rss_gb()
for i in range(60):
    state, m = train_step(state, fixed, key)
    if i % 20 == 19:
        _ = jax.device_get(m["loss"])
        print("A step %3d rss %.2f GB (d %.3f)" % (i, rss_gb(), rss_gb() - base),
              flush=True)

print("--- phase B: fresh batch each step", flush=True)
base = rss_gb()
for i in range(60):
    state, m = train_step(state, make_batch(), key)
    if i % 20 == 19:
        _ = jax.device_get(m["loss"])
        print("B step %3d rss %.2f GB (d %.3f)" % (i, rss_gb(), rss_gb() - base),
              flush=True)

print("--- phase C: device_get(state) x5", flush=True)
base = rss_gb()
for i in range(5):
    host = jax.device_get(state)
    del host
    print("C fetch %d rss %.2f GB (d %.3f)" % (i, rss_gb(), rss_gb() - base),
          flush=True)
print("DONE", flush=True)
