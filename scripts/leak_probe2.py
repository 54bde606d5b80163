"""Leak mitigation probe: does explicit device_put + Array.delete() (after
the step completes) stop the ~25 MB/step host RSS growth from phase A of
leak_probe.py?  Phases:
  D: device_put batch, step, sync via metrics fetch, then .delete() leaves
  E: same but only `del` (GC) without explicit delete()
  F: control — plain numpy arg like phase A, plus gc.collect() each step

Measured 2026-08-19 (same setup):
  D (device_put + Array.delete()): +24 MB/step
  E (device_put + del/GC):         +25 MB/step
  F (numpy arg + gc.collect()):    +25 MB/step
Conclusion: no Python-side mitigation works; the client retains the
transfer buffers. Workaround: scripts/train_segments.sh (process
recycling at epoch-segment boundaries, epoch-exact resume).
"""
import gc, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax


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

B, T = cfg.data.batch_size, cfg.data.max_targets
rng = np.random.default_rng(0)
fixed = {
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
state, m = train_step(state, fixed, key)
_ = jax.device_get(m["loss"])
print("compiled; warm RSS %.2f GB" % rss_gb(), flush=True)


def run(tag, steps, fn):
    base = rss_gb()
    for i in range(steps):
        fn()
        if i % 20 == 19:
            print("%s step %3d rss %.2f GB (d %.3f)"
                  % (tag, i, rss_gb(), rss_gb() - base), flush=True)


def phase_d():
    global state
    xb = jax.device_put(fixed)
    s2, m = train_step(state, xb, key)
    _ = jax.device_get(m["loss"])          # step complete
    for leaf in jax.tree.leaves(xb):
        leaf.delete()
    state = s2


def phase_e():
    global state
    xb = jax.device_put(fixed)
    s2, m = train_step(state, xb, key)
    _ = jax.device_get(m["loss"])
    del xb
    state = s2


def phase_f():
    global state
    s2, m = train_step(state, fixed, key)
    _ = jax.device_get(m["loss"])
    gc.collect()
    state = s2


print("--- D: device_put + delete()", flush=True)
run("D", 60, phase_d)
print("--- E: device_put + del/GC", flush=True)
run("E", 60, phase_e)
print("--- F: numpy arg + gc.collect", flush=True)
run("F", 40, phase_f)
print("DONE", flush=True)
