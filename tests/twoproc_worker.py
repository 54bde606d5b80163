"""Worker process for the 2-process distributed integration test.

Runs the REAL world>1 branches (parity target: misc.py:180-220 pickle
all_gather + misc.py:240-251 meter sync + train_utils.py:6-27 init) that the
single-process suite can only unit-test: jax.distributed.initialize over a
localhost coordinator, ragged object all_gather, MetricLogger sync, the eval
merge, and one DP train step over the 2-process global device mesh.

Usage: python twoproc_worker.py <coordinator_port> <process_id> <out_json>
"""
import dataclasses
import json
import os
import sys


def main():
    port, proc_id, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    # exactly ONE local device per process (the pytest parent's 8-device
    # XLA_FLAGS would otherwise leak in and make a 16-device global mesh)
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 1)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from wildlifemapper_tpu.parallel.distributed import (all_gather_objects,
                                                         init_distributed_mode)

    assert init_distributed_mode(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=proc_id)
    assert jax.process_count() == 2, jax.process_count()
    results = {"process_count": jax.process_count()}

    # --- 1. ragged object all_gather (misc.py:180-220 branch) -------------
    local = {"rank": proc_id, "items": list(range(3 + 5 * proc_id)),
             "name": f"proc{proc_id}"}
    gathered = all_gather_objects(local)
    results["gather"] = gathered

    # --- 2. meter sync (misc.py:240-251) ----------------------------------
    from wildlifemapper_tpu.train.metrics import MetricLogger

    logger = MetricLogger(print_fn=lambda *a, **k: None)
    for v in ([1.0, 2.0] if proc_id == 0 else [6.0]):
        logger.update(loss=v)
    logger.synchronize_between_processes()
    results["meter_global_avg"] = logger.global_averages()["loss"]

    # --- 3. eval merge: ragged per-process detection dicts ----------------
    dts = {100 + proc_id * 10 + i:
           {"scores": [0.5 + 0.1 * i], "labels": [1],
            "boxes": [[0.0, 0.0, 10.0, 10.0 + i]]}
           for i in range(1 + proc_id)}  # proc0: 1 image, proc1: 2 images
    merged = {}
    for other in all_gather_objects(dts):
        merged.update(other)
    results["merged_image_ids"] = sorted(merged.keys())

    # --- 4. DP train step over the 2-process global mesh ------------------
    import numpy as np

    import jax.numpy as jnp

    from wildlifemapper_tpu.config import (Config, DataConfig, DecoderConfig,
                                           HFCConfig, MatchCriterionConfig,
                                           TrainConfig, ViTConfig,
                                           model_config)
    from wildlifemapper_tpu.parallel import mesh as mesh_lib
    from wildlifemapper_tpu.train.step import StepBuilder

    vit = ViTConfig(embed_dim=64, depth=2, num_heads=2,
                    global_attn_indexes=(1,), window_size=4, out_chans=32)
    model = dataclasses.replace(
        model_config("vit_b"), vit=vit, img_size=64, patch_size=16,
        hfc=HFCConfig(embed_dim=32, proj_dim=32, num_heads=2, ffn_dim=32),
        decoder=DecoderConfig(transformer_dim=32, mlp_dim=64, num_queries=16,
                              num_heads=2))
    cfg = Config(model=model, data=DataConfig(synthetic=True),
                 train=TrainConfig(lr=1e-3),
                 criterion=MatchCriterionConfig(max_targets=32))

    mesh = mesh_lib.make_mesh(model_parallel=1)  # global 2-device DP mesh
    builder = StepBuilder(cfg, mesh=mesh, use_tp=False)
    params = builder.init_params(jax.random.PRNGKey(0))
    state = builder.init_state(params, steps_per_epoch=4)
    state = builder.place(state)
    step = builder.jit_train_step()

    rng = np.random.default_rng(0)  # same seed -> identical global batch
    t = cfg.criterion.max_targets
    b = 2  # one example per device
    batch_np = {
        "image": rng.normal(size=(b, 64, 64, 3)).astype(np.float32),
        "labels": rng.integers(1, 7, size=(b, t)).astype(np.int32),
        "boxes": rng.uniform(0.3, 0.6, size=(b, t, 4)).astype(np.float32),
        "valid": np.arange(t)[None, :].repeat(b, 0) < 5,
    }
    sharding = mesh_lib.batch_sharding(mesh)
    batch = {k: jax.make_array_from_process_local_data(
                 sharding, v[proc_id:proc_id + 1])
             for k, v in batch_np.items()}
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    results["loss"] = float(jax.device_get(metrics["loss"]))
    results["grad_norm"] = float(jax.device_get(metrics["grad_norm"]))

    with open(out_path, "w") as f:
        json.dump(results, f)
    print("twoproc_worker OK", flush=True)


if __name__ == "__main__":
    main()
