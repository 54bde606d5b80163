"""Shared layers (reference: segment_anything/modeling/common.py,
box_decoder.py:154-176).

All modules are flax.linen, NHWC / (B, N, C) layouts, params in float32 with a
configurable compute dtype (bf16 on TPU).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def gelu_exact(x):
    """erf-based GELU matching torch.nn.GELU's default (flax's default is the
    tanh approximation, which differs by ~1e-4 — enough to fail parity)."""
    return nn.gelu(x, approximate=False)


class _DenseParams(nn.Module):
    """Parameter-only stand-in for nn.Dense: same name/init/shape tree
    (kernel lecun_normal, bias zeros) so checkpoints are interchangeable
    between the fused and unfused MLP paths."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        return k, b


class MLPBlock(nn.Module):
    """Two-layer MLP: lin1 -> act -> lin2 (reference common.py:13-28).

    Dense layers run through a rank-2 view: the trailing-dim contraction is
    identical, but the explicit (free) reshape stops XLA:TPU from lowering
    4D-input Denses as convolutions with layout-copy epilogues — measurable
    inside the full model where Pallas calls pin row-major layouts nearby.

    use_fused routes through the Pallas fused kernel (ops/fused_mlp.py):
    fc1 -> erf-GELU -> fc2 in one pass, weights VMEM-resident, the (R, F)
    hidden tensor never touches HBM. Only valid for the default erf-GELU
    activation; param tree is identical to the Dense path.
    """

    mlp_dim: int
    out_dim: int
    act: Callable = gelu_exact
    dtype: Dtype = jnp.float32
    use_fused: bool = False

    @nn.compact
    def __call__(self, x):
        shape = x.shape
        x = x.reshape(-1, shape[-1])
        if self.use_fused and self.act is gelu_exact:
            from ..ops.fused_mlp import fused_mlp

            w1, b1 = _DenseParams(self.mlp_dim, name="lin1")(shape[-1])
            w2, b2 = _DenseParams(self.out_dim, name="lin2")(self.mlp_dim)
            x = fused_mlp(x.astype(self.dtype), w1.astype(self.dtype),
                          b1.astype(jnp.float32), w2.astype(self.dtype),
                          b2.astype(jnp.float32))
        else:
            x = nn.Dense(self.mlp_dim, dtype=self.dtype, name="lin1")(x)
            x = self.act(x)
            x = nn.Dense(self.out_dim, dtype=self.dtype, name="lin2")(x)
        return x.reshape(*shape[:-1], self.out_dim)


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the trailing channel axis of NHWC tensors.

    Equivalent to the reference's channel-first LayerNorm2d
    (common.py:31-43, eps 1e-6) in our channels-last layout — which lets XLA
    keep the normalization fused with the surrounding convs instead of paying
    NCHW<->NHWC transposes.
    """

    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32
    # flax's default E[x^2]-E[x]^2 variance cancels catastrophically on
    # very narrow channel axes (e.g. the 2-channel mask-downscaling stage);
    # set False for torch-exact two-pass variance there.
    use_fast_variance: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.epsilon, dtype=self.dtype,
                            use_fast_variance=self.use_fast_variance)(x)


class MLPHead(nn.Module):
    """DETR-style prediction head: (num_layers-1) x [Dense+ReLU] + Dense
    (reference box_decoder.py:154-176)."""

    hidden_dim: int
    out_dim: int
    num_layers: int
    sigmoid_output: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            is_last = i == self.num_layers - 1
            dim = self.out_dim if is_last else self.hidden_dim
            x = nn.Dense(dim, dtype=self.dtype, name=f"layers_{i}")(x)
            if not is_last:
                x = nn.relu(x)
        if self.sigmoid_output:
            x = nn.sigmoid(x)
        return x
