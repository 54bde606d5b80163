"""Headline benchmark: 1024px tiles/sec/chip through the full detection
pipeline (HFC + ViT-B encoder + decoder + postprocess + NMS), bf16.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.md) and no A100 is
reachable from this environment, so the denominator is a documented analytic
estimate of the PyTorch reference on A100: SAM ViT-B encoder ~40 ms/1024px
image on A100 (from the SAM paper's ViT-H ~150 ms scaled by FLOPs), plus HFC
FFT + decoder overhead -> ~25 tiles/sec. BASELINE.json's target is >=5x that
(>=125 tiles/sec/chip on v5e).
"""

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent XLA executable cache: remote axon compiles run 30 s - 25 min
# cold (CLAUDE.md), and the in-session evidence pipelines (the round-5
# verdict runner) warm this same directory — so a driver bench that runs
# right after a session reuses those compiles instead of repeating them.
# Under /root/repo/_runs (gitignored), NOT /tmp: host reboots wipe /tmp
# (observed twice on 08-19) and a wiped cache turns the driver bench into
# 3+ cold 10-25 min remote compiles. Env override wins; failures
# (read-only fs, old jax) just fall back to cold compiles.
if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    try:
        cache_dir = "/root/repo/_runs/jax_cache"
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:
        pass

A100_REF_TILES_PER_SEC = 25.0

# A dead axon relay makes jax.devices() HANG rather than error (CLAUDE.md
# "TPU environment gotchas"), which turned round 3's bench record into an
# rc=1 timeout. Probe in a bounded subprocess first so a dead relay yields
# an honest "blocked" record instead of a hang.
#
# This mirrors scripts/tpu_watch.sh's probe (port 8113, 280 s bound) but
# stays inline on purpose: bench.py is the driver's round gate and must
# not depend on a second file being present/executable. Keep the port and
# timeout in sync with tpu_watch.sh when either changes.
PROBE_TIMEOUT_S = 280


def backend_reachable() -> bool:
    """Bounded probe: can this environment's jax backend initialize?

    Fast TCP pre-check on the axon relay port first: when the port is
    closed, a dead relay would make the jax probe burn its full timeout,
    so drop to a short one — enough for a CPU/non-relay backend (init in
    seconds) to still pass, while a hung axon init fails fast."""
    import socket
    try:
        with socket.create_connection(("127.0.0.1", 8113), timeout=5):
            port_open = True
    except OSError:
        port_open = False
    timeout_s = PROBE_TIMEOUT_S if port_open else 30
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.devices(), 'no devices'"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


BASELINE_NOTE = ("analytic A100 estimate (25 tiles/sec, BASELINE.md) — "
                 "the reference publishes no numbers and no A100 is "
                 "reachable from this environment")


def measure(pipeline, params, make_inputs, batches=(8, 16), n_iter=10):
    """Best tiles/sec over `batches`. Raises if EVERY batch size fails to
    compile — the BENCH gate must never record a vacuous 0.0 pass
    (VERDICT r2 weak #5)."""
    tiles_per_sec = 0.0
    last_exc = None
    for batch in batches:
        inputs = make_inputs(batch)
        # The axon remote compile helper occasionally dies on large modules
        # (PERF.md "environment caveat"); one retry rescues the headline.
        ok = False
        for attempt in range(2):
            try:
                jax.device_get(pipeline(params, *inputs))  # compile + warm
                ok = True
                break
            except Exception as e:
                last_exc = e
        if not ok:
            continue
        t0 = time.time()
        for _ in range(n_iter):
            out = pipeline(params, *inputs)
        jax.device_get(out)  # full sync (block_until_ready lies over axon)
        dt = (time.time() - t0) / n_iter
        tiles_per_sec = max(tiles_per_sec, batch / dt)
    if tiles_per_sec == 0.0:
        raise RuntimeError(
            "bench: every batch size failed to compile") from last_exc
    return tiles_per_sec


def main():
    import dataclasses

    if not backend_reachable():
        # rc 0 + explicit marker: the driver's record should say "relay
        # down", not strand the round on a hung jax.devices().
        print(json.dumps({
            "metric": "1024px_tiles_per_sec_per_chip",
            "value": 0.0,
            "unit": "tiles/sec",
            "vs_baseline": 0.0,
            "baseline": BASELINE_NOTE,
            "blocked": ("jax backend unreachable (bounded probe, "
                        f"{PROBE_TIMEOUT_S}s) — axon relay down; see "
                        "scripts/tpu_watch.sh"),
        }))
        return

    from wildlifemapper_tpu.config import model_config
    from wildlifemapper_tpu.eval.postprocess import batched_nms, postprocess
    from wildlifemapper_tpu.models import WildlifeMapper

    rng = np.random.default_rng(0)

    def build_pipeline(cfg):
        model = WildlifeMapper(cfg)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 1024, 1024, 3),
                                             jnp.float32))

        @jax.jit
        def pipeline(params, images, orig_sizes):
            out = model.apply(params, images)
            dets = postprocess(out, orig_sizes, confidence_threshold=0.05)
            dets["keep"] = batched_nms(dets["boxes"], dets["scores"],
                                       dets["labels"], dets["keep"], 0.4,
                                       class_aware=False)
            return dets

        return pipeline, params

    def make_inputs(batch):
        # the canvas the collate produces: 768px content, zero pad
        xh = np.zeros((batch, 1024, 1024, 3), np.float32)
        xh[:, :768, :768, :] = rng.normal(size=(batch, 768, 768, 3))
        return jnp.asarray(xh), jnp.full((batch, 2), 1024, jnp.int32)

    # Headline: the production (from-scratch) config — bf16, packed Pallas
    # kernels, full content crop. The reference pipeline zero-pads 768px
    # content into a 1024 canvas (misc.py:50) and spends 44% of its FLOPs
    # on pad tokens; here the whole network runs at content resolution,
    # with window_size 12 (the natural choice for the 48x48 content grid:
    # windows tile it exactly, where SAM's 14 would re-pad 48 -> 56; SAM
    # init still works — the converter center-slices the rel-pos tables).
    # This is a *different function* from the released checkpoint's: it is
    # for models trained in this mode. The two checkpoint-servable tiers
    # are measured below and emitted alongside (VERDICT r4 weak #2).
    cfg = model_config("vit_b", dtype="bfloat16", use_flash_attention=True,
                       content_size=768)
    cfg = dataclasses.replace(
        cfg, crop_prologue=True,
        vit=dataclasses.replace(cfg.vit, window_size=12),
        hfc=dataclasses.replace(cfg.hfc, compat_scrambled_reshape=False))
    pipeline, params = build_pipeline(cfg)
    tiles_per_sec = measure(pipeline, params, make_inputs)

    # Checkpoint-servable tiers (non-fatal: the headline is the gate; a
    # flaky secondary compile must not zero the round record):
    #  - checkpoint-compat crop: same weights/per-token function as full
    #    canvas, pad ring dropped (the conjunction config of record);
    #  - parity full canvas: mAP-exact vs f32 (PERF.md "drift as mAP").
    tiers = {}
    secondary = {
        "checkpoint_compat_crop": model_config(
            "vit_b", dtype="bfloat16", use_flash_attention=True,
            content_size=768),
        "parity_full_canvas": model_config(
            "vit_b", dtype="bfloat16", use_flash_attention=True),
    }
    for name, tier_cfg in secondary.items():
        try:
            p, prm = build_pipeline(tier_cfg)
            tiers[name] = round(measure(p, prm, make_inputs,
                                        batches=(16,)), 2)
        except Exception as e:  # noqa: BLE001 — record, don't die
            tiers[name] = f"failed: {type(e).__name__}"

    print(json.dumps({
        "metric": "1024px_tiles_per_sec_per_chip",
        "value": round(tiles_per_sec, 2),
        "unit": "tiles/sec",
        "vs_baseline": round(tiles_per_sec / A100_REF_TILES_PER_SEC, 3),
        "baseline": BASELINE_NOTE,
        "headline_config": ("from-scratch crop_prologue + window 12 "
                            "(production function; not the released-"
                            "checkpoint function)"),
        "checkpoint_servable_tiles_per_sec": tiers,
    }))


if __name__ == "__main__":
    main()
