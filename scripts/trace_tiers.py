"""Round-3 prong (a): fine-grained attribution of the mAP-exact tier
(full canvas, bf16+flash) and the checkpoint-compat crop tier at B=16.

Names EVERY device op >= 1 ms — the round-2 trace left ~95 ms/step in an
unattributed 'rest' bucket; this prints the full per-op table.
"""
import glob
import gzip
import json
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def build(tier):
    import dataclasses

    from wildlifemapper_tpu.config import model_config
    from wildlifemapper_tpu.eval.postprocess import batched_nms, postprocess
    from wildlifemapper_tpu.models import WildlifeMapper

    if tier == "parity":  # mAP-exact: full canvas, bf16 + flash
        cfg = model_config("vit_b", dtype="bfloat16",
                           use_flash_attention=True)
    elif tier == "crop":  # checkpoint-compat crop: prologue at canvas
        cfg = model_config("vit_b", dtype="bfloat16",
                           use_flash_attention=True, content_size=768)
    else:
        raise ValueError(tier)
    model = WildlifeMapper(cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 1024, 1024, 3), jnp.float32))

    @jax.jit
    def pipeline(params, images, orig_sizes):
        out = model.apply(params, images)
        dets = postprocess(out, orig_sizes, confidence_threshold=0.05)
        dets["keep"] = batched_nms(dets["boxes"], dets["scores"],
                                   dets["labels"], dets["keep"], 0.4,
                                   class_aware=False)
        return dets

    return pipeline, params


def analyze(logdir, n_iters):
    files = glob.glob(logdir + "/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace", flush=True)
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}

    by_name = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "")
            if "jit_pipeline" in name or name.startswith("jit_"):
                continue
            by_name[name] += e.get("dur", 0) / 1e3 / n_iters
            cnt[name] += 1
    total = sum(by_name.values())
    print(f"\ntotal child op time: {total:.1f} ms/iter; ALL ops >= 0.5 ms:")
    for name, ms in sorted(by_name.items(), key=lambda kv: -kv[1]):
        if ms >= 0.5:
            print(f"  {ms:8.2f} ms x{cnt[name]//n_iters:<4d} {name[:140]}")
    small = sum(ms for ms in by_name.values() if ms < 0.5)
    print(f"  {small:8.2f} ms  [{sum(1 for m in by_name.values() if m < 0.5)}"
          f" ops < 0.5 ms]")


def run_tier(tier, batch=16):
    print(f"\n================ tier: {tier} B={batch} ================",
          flush=True)
    pipeline, params = build(tier)
    rng = np.random.default_rng(0)
    x = np.zeros((batch, 1024, 1024, 3), np.float32)
    x[:, :768, :768, :] = rng.normal(size=(batch, 768, 768, 3))
    x = jnp.asarray(x)
    orig = jnp.full((batch, 2), 1024, jnp.int32)
    t0 = time.time()
    jax.device_get(pipeline(params, x, orig))
    print(f"compile: {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    for _ in range(10):
        out = pipeline(params, x, orig)
    jax.device_get(out)
    dt = (time.time() - t0) / 10
    print(f"step: {dt*1000:.1f} ms  {batch/dt:.1f} tiles/sec", flush=True)

    logdir = f"/tmp/prof/trace_{tier}_b{batch}"
    jax.profiler.start_trace(logdir, create_perfetto_trace=True)
    for _ in range(3):
        out = pipeline(params, x, orig)
    jax.device_get(out)
    jax.profiler.stop_trace()
    analyze(logdir, 3)


if __name__ == "__main__":
    for tier in sys.argv[1:] or ["parity", "crop"]:
        run_tier(tier)
