"""Measure the FAST_SOFTMAX_EXP serving knob (bf16 exp in the global
kernel's forward softmax): crop-tier throughput off/on plus output drift.
The knob only ships if the measured win is real and the drift is within
the bf16 tier's existing tolerance (PERF.md "drift as mAP")."""
import time

import numpy as np

import sys
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

import wildlifemapper_tpu.ops.flash_attention_v2 as fa2
from wildlifemapper_tpu.config import model_config
from wildlifemapper_tpu.models import WildlifeMapper

B = 16


def build():
    cfg = model_config("vit_b", dtype="bfloat16", use_flash_attention=True,
                       content_size=768)
    model = WildlifeMapper(cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 1024, 1024, 3), jnp.float32))
    rng = np.random.default_rng(0)
    x = np.zeros((B, 1024, 1024, 3), np.float32)
    x[:, :768, :768, :] = rng.normal(size=(B, 768, 768, 3))
    return model, params, jnp.asarray(x)


def bench(tag, model, params, x):
    fwd = jax.jit(lambda p, im: model.apply(p, im))
    t0 = time.time()
    out = fwd(params, x)
    logits = jax.device_get(out["pred_logits"])
    print(f"{tag}: compiled {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    for _ in range(10):
        out = fwd(params, x)
    jax.device_get(out["pred_logits"])
    dt = (time.time() - t0) / 10
    print(f"{tag}: {dt*1000:.1f} ms  {B/dt:.1f} tiles/sec", flush=True)
    return logits, B / dt


model, params, x = build()
base_logits, base_tps = bench("f32-softmax (default)", model, params, x)

fa2.FAST_SOFTMAX_EXP = True
fast_logits, fast_tps = bench("bf16-exp softmax", model, params, x)

import scipy.special  # noqa: E402  (baked in)
pb = scipy.special.softmax(base_logits, axis=-1)
pf = scipy.special.softmax(fast_logits, axis=-1)
print(f"speedup: {fast_tps/base_tps:.3f}x  "
      f"max class-prob drift: {np.abs(pb-pf).max():.2e} "
      f"(bf16 tier tolerance of record: 1.5e-3)")
