"""Core NN primitives (TPU-native, NHWC).

These are the building blocks every backbone/neck uses, mirroring the
capability surface of the reference's ``vision_toolbox/components.py`` but
designed for XLA on TPU:

  * NHWC layout everywhere (TPU vector layout; the reference's NCHW is a
    GPU-ism; reference Swin/ConvNeXt already run NHWC internally).
  * Explicit symmetric padding ``ceil((k - s)/2)`` matching reference
    components.py:31 — NOT XLA "SAME", which pads asymmetrically.
  * BatchNorm with functional running stats (flax ``batch_stats`` collection).
    Under jit + GSPMD with a batch-sharded input, batch statistics reduce over
    the *global* batch automatically (XLA inserts the cross-replica collective)
    — this is the TPU-native equivalent of the reference's
    ``sync_batchnorm: true`` (configs/base.yaml:22). ``axis_name`` is also
    supported for shard_map/pmap users.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .initializers import kaiming_normal, torch_default_bias, torch_default_kernel

Dtype = Any


def _gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


ACTIVATIONS: dict[str, Callable | None] = {
    "none": None,
    "relu": jax.nn.relu,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.2),
    "swish": jax.nn.silu,
    "silu": jax.nn.silu,
    "gelu": _gelu_exact,  # torch nn.GELU default is exact erf, not tanh approx
    "hardsigmoid": jax.nn.hard_sigmoid,
    "hardswish": jax.nn.hard_swish,
    "relu6": jax.nn.relu6,
}


def torch_pad(kernel_size: int, stride: int = 1) -> int:
    """Symmetric per-side padding used by every reference conv (components.py:31)."""
    return math.ceil((kernel_size - stride) / 2)


class DepthwiseConv(nn.Module):
    """Depthwise k×k conv, stride 1, SAME — param-compatible with the
    ``nn.Conv(feature_group_count=C)`` it replaces (kernel (k, k, 1, C),
    bias (C,), same init RNG stream). Dispatches to the Pallas depthwise
    kernel on TPU (XLA's grouped-conv lowering measured 22-110× off its byte
    floor — ops/depthwise_conv.py); elsewhere uses the lax conv."""

    kernel_size: int
    use_bias: bool = True
    kernel_init: Callable = torch_default_kernel
    bias_init: Callable | None = None
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from flax.linen import dtypes

        from ..ops.depthwise_conv import depthwise_conv2d, use_depthwise_kernel

        k = self.kernel_size
        C = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (k, k, 1, C))
        bias = (
            self.param("bias", self.bias_init or torch_default_bias(k * k), (C,))
            if self.use_bias
            else None
        )
        x, kernel, bias = dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        if use_depthwise_kernel(k, 1, 1, x.shape[1], x.shape[2]):
            y = depthwise_conv2d(x, kernel)
        else:
            p = k // 2
            y = jax.lax.conv_general_dilated(
                x, kernel, (1, 1), [(p, p), (p, p)], feature_group_count=C,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if bias is not None:
            y = y + bias
        return y


class ConvNormAct(nn.Module):
    """Conv → Norm → Act, the primitive of every conv backbone and neck.

    Mirrors reference components.py:13-46: bias only when norm == "none",
    norm ∈ {none, bn}, act ∈ {none, relu, leaky_relu, swish, silu, gelu},
    Kaiming-normal (fan_out) init for relu/leaky_relu convs.
    """

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    norm: str = "bn"
    act: str = "relu"
    norm_eps: float = 1e-5  # torch BN defaults (README.md:122)
    norm_momentum: float = 0.9  # flax convention ≡ torch momentum 0.1
    dtype: Dtype | None = None
    axis_name: str | None = None  # set for pmap/shard_map cross-replica BN

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        k, s = self.kernel_size, self.stride
        pad = torch_pad(k, s)
        use_bias = self.norm == "none"
        if self.act in ("relu", "leaky_relu"):
            kernel_init = kaiming_normal(self.act, a=0.2, mode="fan_out")
        else:
            kernel_init = torch_default_kernel
        fan_in = x.shape[-1] // self.groups * k * k
        if (
            self.groups == x.shape[-1] == self.out_channels
            and s == 1
            and self.dilation == 1
            and k % 2 == 1
        ):
            # depthwise stride-1 case (MBConv k=3/5, etc.): same "conv" param
            # subtree, Pallas kernel on TPU (see DepthwiseConv)
            x = DepthwiseConv(
                k, use_bias=use_bias, kernel_init=kernel_init,
                bias_init=torch_default_bias(fan_in), dtype=self.dtype,
                name="conv",
            )(x)
        else:
            x = nn.Conv(
                features=self.out_channels,
                kernel_size=(k, k),
                strides=(s, s),
                padding=[(pad, pad), (pad, pad)],
                kernel_dilation=(self.dilation, self.dilation),
                feature_group_count=self.groups,
                use_bias=use_bias,
                kernel_init=kernel_init,
                bias_init=torch_default_bias(fan_in),
                dtype=self.dtype,
                name="conv",
            )(x)
        if self.norm == "bn":
            from .norm import BatchNorm

            x = BatchNorm(
                use_running_average=not train,
                momentum=self.norm_momentum,  # flax convention: ra = m*ra + (1-m)*batch
                epsilon=self.norm_eps,
                axis_name=self.axis_name,
                dtype=self.dtype,
                name="norm",
            )(x)
        elif self.norm != "none":
            raise ValueError(f"unsupported norm {self.norm}")
        act_fn = ACTIVATIONS[self.act]
        if act_fn is not None:
            x = act_fn(x)
        return x


class SeparableConv2d(nn.Module):
    """Depthwise + pointwise ConvNormAct (working version of the reference's
    broken components.py:49-72 — see SURVEY.md §2.1)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    norm: str = "bn"
    act: str = "relu6"
    dtype: Dtype | None = None
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_channels = x.shape[-1]
        x = ConvNormAct(
            in_channels,
            kernel_size=self.kernel_size,
            stride=self.stride,
            dilation=self.dilation,
            groups=in_channels,
            norm=self.norm,
            act=self.act,
            dtype=self.dtype,
            axis_name=self.axis_name,
            name="dw",
        )(x, train=train)
        x = ConvNormAct(
            self.out_channels,
            kernel_size=1,
            norm=self.norm,
            act=self.act,
            dtype=self.dtype,
            axis_name=self.axis_name,
            name="pw",
        )(x, train=train)
        return x


def max_pool_torch(x: jax.Array, kernel_size: int, stride: int, padding: int) -> jax.Array:
    """torch.nn.MaxPool2d(k, s, p) on NHWC: -inf padded, symmetric.

    A tap-compare backward (ops/maxpool.py) was built against XLA's
    SelectAndScatter pool-grad (standalone ~4.6× off its byte floor) and
    measured IN-MODEL SLOWER: vovnet57 122.9 vs 90.3 ms/step, resnet50
    73.4 vs 63.7 (A/B/A, v5e) — the k² strided scatter-add passes move more
    HBM bytes than SelectAndScatter's one pass. XLA stays the path; the
    vjp + tests are kept as the negative-result record."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, kernel_size, kernel_size, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def avg_pool_torch(x: jax.Array, kernel_size: int, stride: int, padding: int) -> jax.Array:
    """torch.nn.AvgPool2d(k, s, p) with count_include_pad=True (torch default)."""
    summed = jax.lax.reduce_window(
        x,
        jnp.array(0, x.dtype),
        jax.lax.add,
        window_dimensions=(1, kernel_size, kernel_size, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )
    return summed / (kernel_size * kernel_size)


class SPPBlock(nn.Module):
    """SPPF-style repeated pooling + channel concat (reference components.py:139-152).

    k=5 repeated 3× is equivalent to parallel 5/9/13 pooling.
    """

    kernel_size: int = 5
    repeats: int = 3
    pool: str = "max"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = (self.kernel_size - 1) // 2
        pool_fn = {"max": max_pool_torch, "avg": avg_pool_torch}[self.pool]
        outputs = []
        for _ in range(self.repeats):
            x = pool_fn(x, self.kernel_size, 1, pad)
            outputs.append(x)
        return jnp.concatenate(outputs, axis=-1)


class StochasticDepth(nn.Module):
    """Per-sample drop-path, train only, rescaled by keep prob
    (reference components.py:165-180)."""

    p: float

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if not train or self.p == 0.0:
            return x
        keep_p = 1.0 - self.p
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep_p, shape)
        return x * mask.astype(x.dtype) / keep_p

    def sample_scale(self, batch: int, train: bool = False) -> jax.Array | None:
        """(batch, 1) mask/keep_p scale for fused kernels (ops/block_mlp.py),
        drawn from the SAME rng stream as ``__call__`` (same scope, one
        make_rng either way), or None when this is an identity."""
        if not train or self.p == 0.0:
            return None
        keep_p = 1.0 - self.p
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep_p, (batch, 1))
        return mask.astype(jnp.float32) / keep_p


class LayerScale(nn.Module):
    """Learnable per-channel γ multiplier (reference components.py:183-192)."""

    init: float

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gamma = self.param("gamma", nn.initializers.constant(self.init), (x.shape[-1],))
        return x * gamma.astype(x.dtype)


class ESEBlock(nn.Module):
    """Effective Squeeze-Excitation: GAP → 1×1 conv → hard-sigmoid gate
    (reference vovnet.py:20-28)."""

    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gap = jnp.mean(x, axis=(1, 2), keepdims=True)
        fan_in = x.shape[-1]
        gate = nn.Conv(
            features=x.shape[-1],
            kernel_size=(1, 1),
            kernel_init=torch_default_kernel,
            bias_init=torch_default_bias(fan_in),
            dtype=self.dtype,
            name="linear",
        )(gap)
        return x * jax.nn.hard_sigmoid(gate)


class SqueezeExcitation(nn.Module):
    """torchvision-style SE block (squeeze 1×1 → act → excite 1×1 → gate).
    Defaults (relu/sigmoid) are PatchConvNet's (reference patchconvnet.py:42);
    MobileNetV3 uses relu/hardsigmoid, EfficientNet silu/sigmoid."""

    squeeze_channels: int
    act: str = "relu"
    gate: str = "sigmoid"
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_channels = x.shape[-1]
        gap = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(
            self.squeeze_channels, (1, 1),
            kernel_init=torch_default_kernel,
            bias_init=torch_default_bias(in_channels),
            dtype=self.dtype, name="fc1",
        )(gap)
        s = ACTIVATIONS[self.act](s)
        s = nn.Conv(
            in_channels, (1, 1),
            kernel_init=torch_default_kernel,
            bias_init=torch_default_bias(self.squeeze_channels),
            dtype=self.dtype, name="fc2",
        )(s)
        gate = jax.nn.sigmoid if self.gate == "sigmoid" else jax.nn.hard_sigmoid
        return x * gate(s)


class DeformableConv2d(nn.Module):
    """DCN v1/v2 (reference components.py:77-135): offset conv + optional
    sigmoid mask conv + deformable sampling.

    The sampling core is implemented with bilinear gathers (XLA-friendly) in
    ops.deform_conv — exported-but-unused in the reference, built here as an
    optional op for parity.
    """

    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    bias: bool = True
    v2: bool = True
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..ops.deform_conv import deform_conv2d

        k = self.kernel_size
        num_loc = k * k
        in_channels = x.shape[-1]
        fan_in = in_channels * k * k
        conv_kwargs = dict(
            kernel_size=(k, k),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            kernel_init=torch_default_kernel,
            bias_init=torch_default_bias(fan_in),
            dtype=self.dtype,
        )
        offset = nn.Conv(2 * num_loc, name="conv_offset", **conv_kwargs)(x)
        mask = None
        if self.v2:
            mask = jax.nn.sigmoid(nn.Conv(num_loc, name="conv_mask", **conv_kwargs)(x))
        weight = self.param(
            "kernel", torch_default_kernel, (k, k, in_channels, self.out_channels)
        )
        bias = (
            self.param("bias", torch_default_bias(fan_in), (self.out_channels,))
            if self.bias
            else None
        )
        return deform_conv2d(
            x, weight, offset, mask, bias,
            stride=self.stride, padding=self.padding, dilation=self.dilation,
        )


class Linear(nn.Module):
    """nn.Linear with torch default init. Owns its params directly (no nested
    Dense scope) so checkpoint paths stay flat: <name>/{kernel,bias}."""

    features: int
    use_bias: bool = True
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from flax.linen import dtypes

        fan_in = x.shape[-1]
        kernel = self.param("kernel", torch_default_kernel, (fan_in, self.features))
        bias = (
            self.param("bias", torch_default_bias(fan_in), (self.features,))
            if self.use_bias
            else None
        )
        x, kernel, bias = dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        y = x @ kernel
        if bias is not None:
            y = y + bias
        return y
