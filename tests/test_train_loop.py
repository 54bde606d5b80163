"""End-to-end training-loop tests on tiny configs (virtual 8-device CPU
mesh), covering: loss decrease, mesh-sharded steps, freeze policy,
checkpoint save/resume."""

import dataclasses
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wildlifemapper_tpu.config import (Config, DataConfig, DecoderConfig,
                                       HFCConfig, MatchCriterionConfig,
                                       TrainConfig, ViTConfig, model_config)
from wildlifemapper_tpu.parallel import mesh as mesh_lib
from wildlifemapper_tpu.train.optimizer import param_group
from wildlifemapper_tpu.train.step import StepBuilder

REF_ANN = Path("/root/reference/coco_annotations")


def tiny_full_config(**data_overrides) -> Config:
    vit = ViTConfig(embed_dim=64, depth=2, num_heads=2,
                    global_attn_indexes=(1,), window_size=4, out_chans=32)
    model = dataclasses.replace(
        model_config("vit_b"), vit=vit, img_size=64, patch_size=16,
        hfc=HFCConfig(embed_dim=32, proj_dim=32, num_heads=2, ffn_dim=32),
        decoder=DecoderConfig(transformer_dim=32, mlp_dim=64, num_queries=16,
                              num_heads=2))
    data = DataConfig(coco_path=str(REF_ANN), resize_size=48, canvas_size=64,
                      max_targets=32, allow_truncation=True, batch_size=2,
                      synthetic=True, flip_prob=0.5)
    train = TrainConfig(lr=1e-3, epochs=1, clip_max_norm=1.0,
                        checkpoint_every=1)
    return Config(model=model, data=data, train=train,
                  criterion=MatchCriterionConfig(max_targets=32))


def _fake_batch(rng, cfg, b=2):
    t = cfg.criterion.max_targets
    return {
        "image": jnp.asarray(rng.normal(size=(b, 64, 64, 3)), jnp.float32),
        "labels": jnp.asarray(rng.integers(1, 7, size=(b, t)).astype(np.int32)),
        "boxes": jnp.asarray(rng.uniform(0.3, 0.6, size=(b, t, 4)).astype(np.float32)),
        "valid": jnp.asarray(np.arange(t)[None, :].repeat(b, 0) < 5),
    }


def test_train_step_decreases_loss(rng):
    cfg = tiny_full_config()
    builder = StepBuilder(cfg)
    params = builder.init_params(jax.random.PRNGKey(0))
    state = builder.init_state(params, steps_per_epoch=10)
    step = builder.jit_train_step()
    batch = _fake_batch(rng, cfg)
    drng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(15):
        state, m = step(state, batch, drng)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_ema_and_warmup(rng):
    cfg = tiny_full_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=0.9,
                                       warmup_steps=5))
    builder = StepBuilder(cfg)
    params = builder.init_params(jax.random.PRNGKey(0))
    state = builder.init_state(params, steps_per_epoch=10)
    assert state.ema_params is not None
    # snapshot before stepping: donate_argnums invalidates the init buffers
    i0 = np.array(jax.tree.leaves(
        params["params"]["box_decoder"]["class_embed"])[0])
    step = builder.jit_train_step()
    batch = _fake_batch(rng, cfg)
    drng = jax.random.PRNGKey(1)
    for _ in range(3):
        state, m = step(state, batch, drng)
        assert np.isfinite(float(m["loss"]))
    # EMA lags params: shadow of a trainable kernel sits strictly between
    # the init value and the live value.
    live = state.params["params"]["box_decoder"]["class_embed"]
    ema = state.ema_params["params"]["box_decoder"]["class_embed"]
    l0 = jax.tree.leaves(live)[0]
    e0 = jax.tree.leaves(ema)[0]
    assert not np.allclose(l0, i0)          # it trained
    assert not np.allclose(e0, l0)          # ema lags
    d_live = float(jnp.abs(l0 - i0).max())
    d_ema = float(jnp.abs(e0 - i0).max())
    assert 0 < d_ema < d_live


def test_freeze_policy_keeps_encoder_fixed(rng):
    cfg = tiny_full_config()
    builder = StepBuilder(cfg)
    params = builder.init_params(jax.random.PRNGKey(0))
    state = builder.init_state(params, steps_per_epoch=10)
    step = builder.jit_train_step()
    batch = _fake_batch(rng, cfg)
    before = jax.device_get(state.params)
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    after = jax.device_get(state.params)

    from flax import traverse_util
    fb = traverse_util.flatten_dict(before["params"], sep="/")
    fa = traverse_util.flatten_dict(after["params"], sep="/")
    changed_frozen, changed_trainable = [], []
    for k in fb:
        delta = np.abs(np.asarray(fb[k]) - np.asarray(fa[k])).max()
        grp = param_group(k, True)
        if grp == "frozen" and delta > 0:
            changed_frozen.append(k)
        if grp != "frozen" and delta > 0:
            changed_trainable.append(k)
    assert not changed_frozen, changed_frozen[:5]
    assert len(changed_trainable) > 10


def test_mesh_sharded_train_step(rng):
    """DP=4 x TP=2 over the virtual 8-CPU mesh."""
    assert len(jax.devices()) == 8
    cfg = tiny_full_config()
    cfg = dataclasses.replace(
        cfg, mesh=dataclasses.replace(cfg.mesh, model_parallel_size=2))
    mesh = mesh_lib.make_mesh(model_parallel=2)
    builder = StepBuilder(cfg, mesh=mesh, use_tp=True)
    params = builder.init_params(jax.random.PRNGKey(0))
    state = builder.init_state(params, steps_per_epoch=10)
    state = builder.place(state)
    step = builder.jit_train_step()
    batch = _fake_batch(rng, cfg, b=4)
    state, m = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    # params with a sharded dim actually live distributed
    qkv = state.params["params"]["image_encoder"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert len(qkv.sharding.device_set) >= 2
    # optimizer moments follow the param shardings (not replicated). The
    # frozen encoder blocks carry no moments (set_to_zero), so check a
    # *trainable* TP-sharded param: hfc_attn's q_proj kernel.
    from jax.sharding import PartitionSpec as P
    qp = state.params["params"]["image_encoder"]["hfc_attn"]["cross_attn"][
        "q_proj"]["kernel"]
    assert qp.sharding.spec == P(None, "model")
    mu_leaves = [l for l in jax.tree.leaves(state.opt_state)
                 if hasattr(l, "shape") and l.shape == qp.shape]
    assert mu_leaves, "no moment leaves mirror the q_proj kernel"
    assert any(l.sharding.spec == P(None, "model") for l in mu_leaves)


def test_mesh_sharded_eval_step_matches_single_device(rng):
    """jit_eval_step with a mesh must use the data axis (VERDICT r3 weak #4:
    per-epoch val on a multi-chip host ran on one device) AND agree with the
    unsharded eval step numerically."""
    assert len(jax.devices()) == 8
    cfg = tiny_full_config()
    params = StepBuilder(cfg).init_params(jax.random.PRNGKey(0))
    batch = _fake_batch(rng, cfg, b=8)
    batch["batch_valid"] = jnp.asarray(np.arange(8) < 7)  # padded final row

    out_1, losses_1 = StepBuilder(cfg).jit_eval_step()(params, batch)

    mesh = mesh_lib.make_mesh(model_parallel=1)  # 8-way DP
    builder = StepBuilder(cfg, mesh=mesh)
    sharded_params = jax.device_put(params, mesh_lib.replicated(mesh))
    out_8, losses_8 = builder.jit_eval_step()(params=sharded_params,
                                              batch=batch)
    # outputs sharded over the data axis, not single-device
    assert len(out_8["pred_logits"].sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out_8["pred_logits"]),
                               np.asarray(out_1["pred_logits"]),
                               rtol=2e-5, atol=2e-5)
    for k in losses_1:
        np.testing.assert_allclose(float(losses_8[k]), float(losses_1[k]),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(not REF_ANN.exists(), reason="reference annotations absent")
def test_full_loop_one_epoch(tmp_path):
    from wildlifemapper_tpu.train.loop import train

    cfg = tiny_full_config()
    stats = train(cfg, workdir=str(tmp_path), epochs=1,
                  max_steps_per_epoch=3, max_eval_batches=4,
                  print_fn=lambda *a, **k: None)
    assert "train/loss" in stats and np.isfinite(stats["train/loss"])
    assert "val/coco/AP" in stats
    # checkpoint written (checkpoint_every=1)
    assert (tmp_path / "checkpoint_epoch_0").exists()

    # resume path restores and continues
    stats2 = train(cfg, workdir=str(tmp_path), epochs=2, resume=True,
                   max_steps_per_epoch=3, max_eval_batches=4,
                   print_fn=lambda *a, **k: None)
    assert "train/loss" in stats2


def test_nan_guard_exits_before_any_checkpoint(tmp_path, monkeypatch):
    """The pipelined metrics fetch trips the NaN guard one step late
    (train/loop.py); this pins the safety property that matters: training
    exits via SystemExit before save_epoch ever sees post-NaN state — no
    checkpoint file is written for the poisoned epoch."""
    from wildlifemapper_tpu.train import loop as loop_mod
    from wildlifemapper_tpu.train.loop import train

    cfg = tiny_full_config()

    orig = StepBuilder.jit_train_step

    def poisoned(self):
        step = orig(self)

        def wrapper(state, batch, rng):
            state2, metrics = step(state, batch, rng)
            # poison from the very first step: with the one-step-delayed
            # consume, the guard trips on step 1
            metrics = dict(metrics, loss=metrics["loss"] * jnp.nan)
            return state2, metrics
        return wrapper

    monkeypatch.setattr(StepBuilder, "jit_train_step", poisoned)
    monkeypatch.setattr(loop_mod, "StepBuilder", StepBuilder)
    with pytest.raises(SystemExit):
        train(cfg, workdir=str(tmp_path), epochs=1, max_steps_per_epoch=3,
              max_eval_batches=1, print_fn=lambda *a, **k: None)
    assert not (tmp_path / "checkpoint_epoch_0").exists()
    assert not (tmp_path / "best_checkpoint").exists()


def test_eval_jit_hoisted_across_calls():
    """evaluate() must not retrace per epoch (reference: train.py:325 calls
    evaluate every epoch with no recompilation): the jit wrapper is memoized
    per step function, so a second call with the same shapes reuses the
    compiled executable."""
    from wildlifemapper_tpu.eval.evaluate import _jit_eval_step

    traces = []

    def step(params, batch):
        traces.append(1)
        return params + batch, {"l": jnp.sum(batch)}

    j1 = _jit_eval_step(step)
    j2 = _jit_eval_step(step)
    assert j1 is j2
    j1(1.0, jnp.ones(3))
    j2(2.0, jnp.ones(3))
    assert len(traces) == 1


def test_eval_every_skips_intermediate_epochs(tmp_path, monkeypatch):
    """eval_every=2 over 2 epochs: epoch 0 skips evaluation, epoch 1 (the
    final epoch) always evaluates."""
    import wildlifemapper_tpu.train.loop as loop_mod

    calls = []
    real_eval = loop_mod.evaluate

    def spy(*a, **k):
        calls.append(k.get("epoch"))
        return real_eval(*a, **k)

    monkeypatch.setattr(loop_mod, "evaluate", spy)
    cfg = tiny_full_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, epochs=2, eval_every=2))
    stats = loop_mod.train(cfg, workdir=str(tmp_path), epochs=2,
                           max_steps_per_epoch=2, max_eval_batches=2,
                           print_fn=lambda *a, **k: None)
    assert calls == [1]
    assert "val/coco/AP" in stats


def test_segmented_run_is_epoch_exact(tmp_path):
    """Two epochs in one process == one epoch per process stitched with
    --resume (scripts/train_segments.sh — the workaround for the remote
    client's per-transfer host leak). Relies on: force_epoch writing
    checkpoint_epoch_{last} on the final epoch regardless of cadence,
    best_loss.json persisting the best tracker across processes, and
    per-epoch loader seeding making data order restart-invariant."""
    from wildlifemapper_tpu.train.checkpoints import CheckpointManager
    from wildlifemapper_tpu.train.loop import train

    cfg = tiny_full_config()
    # cadence 100 => only the final-epoch force write can produce files
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, checkpoint_every=100))

    single = tmp_path / "single"
    train(cfg, workdir=str(single), epochs=2, max_steps_per_epoch=3,
          max_eval_batches=1, print_fn=lambda *a, **k: None)
    assert (single / "checkpoint_epoch_1").exists()  # force_epoch fired

    seg = tmp_path / "seg"
    train(cfg, workdir=str(seg), epochs=1, max_steps_per_epoch=3,
          max_eval_batches=1, print_fn=lambda *a, **k: None)
    assert (seg / "checkpoint_epoch_0").exists()
    assert (seg / "best_loss.json").exists()
    train(cfg, workdir=str(seg), epochs=2, resume=True,
          max_steps_per_epoch=3, max_eval_batches=1,
          print_fn=lambda *a, **k: None)

    builder = StepBuilder(cfg)
    params = builder.init_params(jax.random.PRNGKey(cfg.train.seed))
    ref = CheckpointManager.load_params(str(single / "checkpoint_epoch_1"),
                                        params)
    got = CheckpointManager.load_params(str(seg / "checkpoint_epoch_1"),
                                        params)
    jax.tree.map(np.testing.assert_array_equal, ref, got)


def test_load_params_from_trainstate_and_ema(tmp_path):
    """CheckpointManager.load_params pulls the params subtree (or
    ema_params with use_ema) out of a saved TrainState, re-typed onto the
    target structure; bare-params checkpoints load too."""
    from wildlifemapper_tpu.train.checkpoints import CheckpointManager

    params = {"params": {"w": jnp.ones((2, 2)), "b": jnp.zeros(2)}}
    state = {"params": jax.tree.map(lambda x: x * 2, params),
             "ema_params": jax.tree.map(lambda x: x * 3, params),
             "opt_state": {"count": jnp.zeros(())},
             "step": jnp.asarray(7)}
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save("state", state)
    ckpt.save("bare", params)

    got = CheckpointManager.load_params(str(tmp_path / "state"), params)
    assert float(got["params"]["w"][0, 0]) == 2.0
    got_ema = CheckpointManager.load_params(str(tmp_path / "state"), params,
                                            use_ema=True)
    assert float(got_ema["params"]["w"][0, 0]) == 3.0
    got_bare = CheckpointManager.load_params(str(tmp_path / "bare"), params)
    assert float(got_bare["params"]["w"][0, 0]) == 1.0


def test_config_json_saved_with_checkpoints(tmp_path, rng):
    """train() persists the exact Config beside checkpoints; the JSON
    round-trips back to an equal Config (from-scratch runs are
    reconstructable at eval time)."""
    from wildlifemapper_tpu.config import config_from_json
    from wildlifemapper_tpu.train.loop import train

    cfg = tiny_full_config()
    train(cfg, workdir=str(tmp_path), epochs=1, max_steps_per_epoch=1,
          max_eval_batches=1)
    text = (tmp_path / "config.json").read_text()
    assert config_from_json(text) == cfg


def test_remat_blocks_same_loss_and_grads(rng):
    """remat_blocks must not change the function — loss and grads equal
    (it only changes what the backward stores)."""
    import dataclasses

    from wildlifemapper_tpu.models import WildlifeMapper

    cfg = tiny_full_config()
    m_plain = WildlifeMapper(cfg.model)
    m_remat = WildlifeMapper(
        dataclasses.replace(cfg.model, remat_blocks=True))
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    params = m_plain.init(jax.random.PRNGKey(0), x)

    def loss(mod):
        def f(p):
            o = mod.apply(p, x)
            return jnp.sum(o["pred_boxes"]) + jnp.sum(jnp.tanh(o["pred_logits"]))
        return f

    l0, g0 = jax.value_and_grad(loss(m_plain))(params)
    l1, g1 = jax.value_and_grad(loss(m_remat))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for (k0, v0), (k1, v1) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                                   atol=1e-5, rtol=1e-5, err_msg=str(k0))


def test_device_normalize_matches_host_normalize(rng):
    """uint8 batches + in-step normalization must equal the host-normalized
    f32 path (same f32 math, 4x less transfer)."""
    import dataclasses

    from wildlifemapper_tpu.data.loader import DataLoader, build_dataset

    cfg = tiny_full_config()
    cfg_dev = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, device_normalize=True,
                                      flip_prob=0.0))
    cfg_host = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, flip_prob=0.0))

    def one_eval(c):
        ds = build_dataset("val", c.data)
        loader = DataLoader(ds, 2, shuffle=False, drop_last=True)
        batch = next(iter(loader.epoch(0)))
        builder = StepBuilder(c)
        params = builder.init_params(jax.random.PRNGKey(0))
        builder.init_state(params, steps_per_epoch=1)
        out, losses = builder.eval_step_fn()(params, jax.tree.map(
            jnp.asarray, {k: batch[k] for k in
                          ("image", "labels", "boxes", "valid", "size")}))
        return batch, np.asarray(out["pred_boxes"])

    b_dev, o_dev = one_eval(cfg_dev)
    b_host, o_host = one_eval(cfg_host)
    assert b_dev["image"].dtype == np.uint8
    assert b_host["image"].dtype == np.float32
    np.testing.assert_allclose(o_dev, o_host, atol=1e-5, rtol=1e-5)


def test_val_image_overlays_logged(tmp_path):
    """The epoch loop logs first-val-batch bbox overlays through the logger
    backend (reference: wandb_logger.py:169-270 during training)."""
    from wildlifemapper_tpu.train.logging import JsonlLogger
    from wildlifemapper_tpu.train.loop import train

    cfg = tiny_full_config()
    backend = JsonlLogger(str(tmp_path / "logs"), run_name="t")
    train(cfg, workdir=str(tmp_path), epochs=1, max_steps_per_epoch=1,
          max_eval_batches=1, logger_backend=backend,
          print_fn=lambda *a, **k: None)
    backend.finish()
    import json
    events = [json.loads(l) for l in
              (tmp_path / "logs" / "t.jsonl").read_text().splitlines()]
    img_events = [e for e in events if e.get("event") == "images"]
    assert img_events and img_events[0]["count"] >= 1
    written = list((tmp_path / "logs" / "t_images").glob("epoch_0_*.jpg"))
    assert len(written) == img_events[0]["count"]


def test_best_metric_val_ap_tracks_highest_ap(tmp_path, monkeypatch):
    """best_metric="val_ap": best_checkpoint follows the highest val
    coco/AP (only evaluated epochs count), and the persisted tracker file
    records the metric so resume logic can detect a switch."""
    import json

    from wildlifemapper_tpu.train import loop as loop_mod
    from wildlifemapper_tpu.train.loop import train

    aps = iter([0.2, 0.5, 0.3])

    def fake_evaluate(*a, **k):
        return {"AP": next(aps), "AP50": 1.0}

    # loop reads val_stats["coco/AP"]; evaluate() prefixes with coco/
    monkeypatch.setattr(loop_mod, "evaluate",
                        lambda *a, **k: {f"coco/{x}": v
                                         for x, v in fake_evaluate().items()})
    cfg = tiny_full_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, best_metric="val_ap",
                                       eval_every=1, checkpoint_every=100))
    train(cfg, workdir=str(tmp_path), epochs=3, max_steps_per_epoch=2,
          max_eval_batches=1, print_fn=lambda *a, **k: None)
    best = json.loads((tmp_path / "best_loss.json").read_text())
    assert best["metric"] == "val_ap"
    assert best["epoch"] == 1 and best["value"] == 0.5
    assert (tmp_path / "best_checkpoint").exists()


def test_best_metric_switch_resets_tracker(tmp_path, monkeypatch):
    """Resuming under a different best_metric must not compare a loss
    against an AP: the tracker resets (and the default-metric file format
    stays readable by segmented-run resumes)."""
    import json

    from wildlifemapper_tpu.train import loop as loop_mod
    from wildlifemapper_tpu.train.loop import train

    monkeypatch.setattr(loop_mod, "evaluate",
                        lambda *a, **k: {"coco/AP": 0.1, "coco/AP50": 0.2})
    cfg = tiny_full_config()
    train(cfg, workdir=str(tmp_path), epochs=1, max_steps_per_epoch=2,
          max_eval_batches=1, print_fn=lambda *a, **k: None)
    first = json.loads((tmp_path / "best_loss.json").read_text())
    assert first["metric"] == "train_loss" and "loss" in first

    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, best_metric="val_ap"))
    msgs = []
    train(cfg2, workdir=str(tmp_path), epochs=2, resume=True,
          max_steps_per_epoch=2, max_eval_batches=1,
          print_fn=lambda *a, **k: msgs.append(" ".join(map(str, a))))
    assert any("best tracker reset" in m for m in msgs)
    second = json.loads((tmp_path / "best_loss.json").read_text())
    assert second["metric"] == "val_ap" and second["value"] == 0.1
