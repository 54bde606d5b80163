"""torch->jax converter unit tests (surgery, prefixes, merge semantics)."""

import numpy as np
import pytest

from wildlifemapper_tpu.compat.torch_convert import (apply_sam_surgery,
                                                     map_torch_keys,
                                                     merge_into_params,
                                                     strip_prefixes)


def test_strip_prefixes():
    sd = {"module.image_encoder.pos_embed": 1, "image_encoder.x": 2}
    out = strip_prefixes(sd)
    assert "image_encoder.pos_embed" in out and "image_encoder.x" in out


def test_sam_surgery_drops_decoder_heads():
    sd = {
        "mask_decoder.iou_token.weight": 0,
        "mask_decoder.mask_tokens.weight": 0,
        "mask_decoder.transformer.layers.0.self_attn.q_proj.weight": 0,
        "mask_decoder.output_upscaling.0.weight": 0,
        "image_encoder.pos_embed": 0,
    }
    out = apply_sam_surgery(sd)
    # keep only mask_decoder keys containing 'transformer', plus everything
    # else (build_sam.py:314-320)
    assert "mask_decoder.transformer.layers.0.self_attn.q_proj.weight" in out
    assert "mask_decoder.iou_token.weight" not in out
    assert "mask_decoder.mask_tokens.weight" not in out
    assert "mask_decoder.output_upscaling.0.weight" not in out
    assert "image_encoder.pos_embed" in out


def test_merge_keeps_init_for_missing(rng):
    params = {"params": {"a": {"kernel": np.zeros((2, 3))},
                         "b": {"bias": np.ones(4)}}}
    mapped = {"a/kernel": rng.normal(size=(2, 3)).astype(np.float32)}
    new, rpt = merge_into_params(params, mapped)
    assert rpt["loaded"] == ["a/kernel"]
    assert rpt["missing"] == ["b/bias"]
    np.testing.assert_array_equal(new["params"]["b"]["bias"], np.ones(4))
    np.testing.assert_allclose(new["params"]["a"]["kernel"],
                               mapped["a/kernel"])


def test_merge_rejects_shape_mismatch(rng):
    import pytest

    params = {"params": {"a": {"kernel": np.zeros((2, 3))}}}
    with pytest.raises(ValueError):
        merge_into_params(params, {"a/kernel": np.zeros((3, 2))})


def test_mha_packed_split():
    e = 4
    w = np.arange(3 * e * e, dtype=np.float32).reshape(3 * e, e)
    b = np.arange(3 * e, dtype=np.float32)
    sd = {"image_encoder.hfc_attn.cross_attn.in_proj_weight": w,
          "image_encoder.hfc_attn.cross_attn.in_proj_bias": b,
          "image_encoder.hfc_attn.cross_attn.out_proj.weight": np.eye(e),
          "image_encoder.hfc_attn.cross_attn.out_proj.bias": np.zeros(e)}
    out = map_torch_keys(sd, depth=0)
    np.testing.assert_array_equal(
        out["image_encoder/hfc_attn/cross_attn/q_proj/kernel"], w[:e].T)
    np.testing.assert_array_equal(
        out["image_encoder/hfc_attn/cross_attn/v_proj/bias"], b[2 * e:])


def test_convert_checkpoint_file_roundtrip(tmp_path):
    """torch.save -> convert_checkpoint on disk: DDP prefixes stripped,
    matching keys loaded, missing keys keep init (strict=False semantics),
    trained-checkpoint {model: ...} wrapper unwrapped."""
    torch = pytest.importorskip("torch")

    import jax
    import numpy as np

    from tests.test_model import tiny_config
    from wildlifemapper_tpu.compat.torch_convert import convert_checkpoint
    from wildlifemapper_tpu.models import WildlifeMapper

    cfg = tiny_config()
    m = WildlifeMapper(cfg)
    params = m.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))

    gm = np.random.default_rng(0).normal(size=(2, 16)).astype(np.float32)
    qt = np.random.default_rng(1).normal(
        size=(cfg.decoder.num_queries, cfg.decoder.transformer_dim)
    ).astype(np.float32)
    sd = {
        "module.prompt_encoder.pe_layer.positional_encoding_gaussian_matrix":
            torch.from_numpy(gm),
        "module.mask_decoder.mask_tokens.weight": torch.from_numpy(qt),
        # a key with hfc so surgery auto-detection treats it as trained-WM
        "module.image_encoder.hfc_attn.norm1.weight":
            torch.ones(cfg.hfc.proj_dim),
    }
    path = tmp_path / "ckpt.pth"
    torch.save({"model": sd, "optimizer": {}, "epoch": 3}, path)

    new_params, report = convert_checkpoint(str(path), params, depth=2)
    assert "pos_encoder/gaussian_matrix" in report["loaded"]
    assert "box_decoder/query_tokens" in report["loaded"]
    np.testing.assert_allclose(
        np.asarray(new_params["params"]["pos_encoder"]["gaussian_matrix"]), gm)
    np.testing.assert_allclose(
        np.asarray(new_params["params"]["box_decoder"]["query_tokens"]), qt)
    assert len(report["missing"]) > 10  # everything else kept at init


@pytest.mark.parametrize("depth,dim,heads", [(24, 1024, 16), (32, 1280, 16)])
def test_map_torch_keys_deep_registries(depth, dim, heads):
    """ViT-L (depth 24) and ViT-H (depth 32) key mapping: every block index
    must be visited and emit qkv/proj/rel-pos/mlp/norm paths (VERDICT r1
    item 9 — only depth-12 paths were exercised before)."""
    head_dim = dim // heads
    sd = {}
    for i in range(depth):
        s = f"image_encoder.blocks.{i}"
        sd[f"{s}.norm1.weight"] = np.ones(dim, np.float32)
        sd[f"{s}.norm1.bias"] = np.zeros(dim, np.float32)
        sd[f"{s}.norm2.weight"] = np.ones(dim, np.float32)
        sd[f"{s}.norm2.bias"] = np.zeros(dim, np.float32)
        sd[f"{s}.attn.qkv.weight"] = np.zeros((3 * dim, dim), np.float32)
        sd[f"{s}.attn.qkv.bias"] = np.zeros(3 * dim, np.float32)
        sd[f"{s}.attn.proj.weight"] = np.zeros((dim, dim), np.float32)
        sd[f"{s}.attn.proj.bias"] = np.zeros(dim, np.float32)
        sd[f"{s}.attn.rel_pos_h"] = np.zeros((27, head_dim), np.float32)
        sd[f"{s}.attn.rel_pos_w"] = np.zeros((27, head_dim), np.float32)
        sd[f"{s}.mlp.lin1.weight"] = np.zeros((4 * dim, dim), np.float32)
        sd[f"{s}.mlp.lin1.bias"] = np.zeros(4 * dim, np.float32)
        sd[f"{s}.mlp.lin2.weight"] = np.zeros((dim, 4 * dim), np.float32)
        sd[f"{s}.mlp.lin2.bias"] = np.zeros(dim, np.float32)
    mapped = map_torch_keys(sd, depth=depth)
    for i in range(depth):
        d = f"image_encoder/blocks_{i}"
        for leaf, shape in ((f"{d}/attn/qkv/kernel", (dim, 3 * dim)),
                            (f"{d}/attn/proj/kernel", (dim, dim)),
                            (f"{d}/attn/rel_pos_h", (27, head_dim)),
                            (f"{d}/mlp/lin1/kernel", (dim, 4 * dim)),
                            (f"{d}/norm1/scale", (dim,))):
            assert leaf in mapped, leaf
            assert mapped[leaf].shape == shape, (leaf, mapped[leaf].shape)
    # no block beyond depth leaks in
    assert f"image_encoder/blocks_{depth}/attn/qkv/kernel" not in mapped


def test_rel_pos_center_slice_for_smaller_window():
    """A checkpoint with 27-row windowed rel tables (window 14) loads into a
    window-12 model (23 rows) by center slicing — same rule as content crop."""
    import numpy as np

    from wildlifemapper_tpu.compat.torch_convert import merge_into_params

    init = {"params": {"blocks_0": {"attn": {
        "rel_pos_h": np.zeros((23, 8), np.float32),
        "rel_pos_w": np.zeros((23, 8), np.float32),
    }}}}
    table = np.arange(27 * 8, dtype=np.float32).reshape(27, 8)
    mapped = {"blocks_0/attn/rel_pos_h": table,
              "blocks_0/attn/rel_pos_w": table + 1}
    new, report = merge_into_params(init, mapped)
    got = np.asarray(new["params"]["blocks_0"]["attn"]["rel_pos_h"])
    np.testing.assert_array_equal(got, table[2:25])
    assert sorted(report["loaded"]) == sorted(mapped)
