"""Round-3 training-throughput sweep (VERDICT #3): windowed GROUP_BWD and
global BWD_TILE_BUDGET under the raised VMEM ceilings, on the w12
production config (round-2 baseline: 47.3 t/s @ B=8 ViT-B)."""
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

import wildlifemapper_tpu.ops.flash_attention_v2 as fa2
import wildlifemapper_tpu.ops.windowed_attention_v2 as wa2
from wildlifemapper_tpu.config import Config, model_config
from wildlifemapper_tpu.train.step import StepBuilder

B = 8


def bench(tag):
    m0 = model_config("vit_b", dtype="bfloat16", use_flash_attention=True,
                      content_size=768)
    m0 = dataclasses.replace(
        m0, crop_prologue=True,
        vit=dataclasses.replace(m0.vit, window_size=12),
        hfc=dataclasses.replace(m0.hfc, compat_scrambled_reshape=False))
    cfg = Config(model=m0)
    builder = StepBuilder(cfg)
    params = builder.init_params(jax.random.PRNGKey(0))
    state = builder.init_state(params, steps_per_epoch=10)
    step = builder.jit_train_step()
    rng = np.random.default_rng(0)
    t = cfg.criterion.max_targets
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, 1024, 1024, 3)),
                             jnp.float32),
        "labels": jnp.asarray(rng.integers(1, 7, size=(B, t)).astype(np.int32)),
        "boxes": jnp.asarray(rng.uniform(0.3, 0.6, size=(B, t, 4)
                                         ).astype(np.float32)),
        "valid": jnp.asarray(np.arange(t)[None].repeat(B, 0) < 12),
    }
    full = (f"{tag} [wG={wa2.GROUP} wGb={wa2.GROUP_BWD} "
            f"wV={wa2.VMEM_LIMIT>>20}M gT={fa2.BWD_TILE_BUDGET>>20}M]")
    try:
        t0 = time.time()
        state, m = step(state, batch, jax.random.PRNGKey(2))
        loss = float(jax.device_get(m["loss"]))
        print(f"{full}: compiled {time.time()-t0:.0f}s loss={loss:.3f}",
              flush=True)
    except Exception as e:
        print(f"{full}: FAILED ({type(e).__name__}: {str(e)[:160]})",
              flush=True)
        return None
    t0 = time.time()
    for _ in range(6):
        state, m = step(state, batch, jax.random.PRNGKey(2))
    jax.device_get(m["loss"])
    dt = (time.time() - t0) / 6
    print(f"{full}: {dt*1000:.1f} ms  {B/dt:.1f} tiles/sec", flush=True)
    return B / dt


bench("baseline")

wa2.VMEM_LIMIT = 110 * 1024 * 1024
wa2.GROUP_BWD = 4
bench("wGb4")

wa2.GROUP_BWD = 8
bench("wGb8")

wa2.GROUP_BWD = 2
fa2.BWD_TILE_BUDGET = 4 * 1024 * 1024
bench("gT4")

fa2.BWD_TILE_BUDGET = 8 * 1024 * 1024
bench("gT8")

fa2.BWD_TILE_BUDGET = 2 * 1024 * 1024
fa2.FWD_TILE_BUDGET = 8 * 1024 * 1024
bench("gF8")
