"""Shared model building blocks (Flax/NHWC, bf16-on-MXU friendly)."""

from __future__ import annotations

import contextlib
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

# --- int8 serving mode ----------------------------------------------------
# Every conv in every model family flows through `Conv.__call__` below, so
# quantized inference needs exactly one switch point. The mode is a
# TRACE-time flag: step builders (odtpu/parallel/train.py make_eval_step)
# enter `quantized(cfg.TPU.QUANT)` around `model.apply` inside the step
# function itself, so whenever jit traces that step the flag is active and
# baked into the compiled graph; each builder closes over its own mode so
# two steps with different modes can never share a trace.
_QUANT_MODE = ""


@contextlib.contextmanager
def quantized(mode: str):
    """Enable quantized conv compute ("int8") while tracing model.apply."""
    global _QUANT_MODE
    if mode and mode != "int8":
        raise ValueError(f"unknown quant mode {mode!r} (expected 'int8')")
    prev = _QUANT_MODE
    _QUANT_MODE = mode or ""
    try:
        yield
    finally:
        _QUANT_MODE = prev


class _QuantConv(nn.Module):
    """Drop-in conv with int8 MXU compute (odtpu.ops.quant.conv_int8).

    Declares the exact same param tree as `nn.Conv` (scope "conv" with
    f32 "kernel" HWIO and optional "bias"), so checkpoints and converted
    reference weights load identically with quantization on or off —
    weights are (re)quantized in-graph per step, which is negligible VPU
    work next to the 2x MXU saving.
    """
    features: int
    kernel_size: tuple
    strides: tuple
    padding: Any
    kernel_dilation: tuple
    use_bias: bool
    dtype: Any
    kernel_init: Any

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from ..ops.quant import conv_int8
        kh, kw = self.kernel_size
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, x.shape[-1], self.features),
                            jnp.float32)
        y = conv_int8(x, kernel, self.strides, self.padding,
                      self.kernel_dilation, out_dtype=self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def conv2d(x, features, kernel_size, strides, padding, kernel_dilation,
           use_bias, dtype, name, kernel_init=None, quantizable=True):
    """THE quant switch point: every conv in every family routes here
    (via Conv below or rfbnet.BasicConv) so `quantized("int8")` has a
    single dispatch to maintain."""
    if kernel_init is None:
        kernel_init = nn.linear.default_kernel_init
    if _QUANT_MODE == "int8" and quantizable:
        return _QuantConv(features, kernel_size=kernel_size,
                          strides=strides, padding=padding,
                          kernel_dilation=kernel_dilation,
                          use_bias=use_bias, dtype=dtype,
                          kernel_init=kernel_init, name=name)(x)
    return nn.Conv(features, kernel_size, strides=strides, padding=padding,
                   kernel_dilation=kernel_dilation, use_bias=use_bias,
                   dtype=dtype, param_dtype=jnp.float32,
                   kernel_init=kernel_init, name=name)(x)


class L2Norm(nn.Module):
    """Channelwise L2 normalization with a learnable per-channel scale.

    Parity: /root/reference/lib/layers/modules/l2norm.py:6 (applied to the
    conv4_3 source; scale initialized to 20). Norm math runs in f32 for
    stability regardless of the compute dtype.
    """
    scale_init: float = 20.0
    eps: float = 1e-10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.constant(self.scale_init),
                           (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True)) + self.eps
        out = xf / norm * scale
        return out.astype(self.dtype)


def max_pool_ceil(x: Array, window: int = 2, stride: int = 2,
                  padding: int = 0, ceil_mode: bool = False) -> Array:
    """Max pool with torch-style explicit padding and ceil_mode.

    ceil_mode pads bottom/right with -inf so partial windows count
    (reference vgg pool3 uses ceil_mode, lib/models/vgg.py:25: 75 -> 38).
    """
    h, w = x.shape[1], x.shape[2]
    pad_t = pad_l = padding
    pad_b = pad_r = padding
    if ceil_mode:
        def extra(dim):
            eff = dim + 2 * padding
            rem = (eff - window) % stride
            return 0 if rem == 0 else stride - rem
        pad_b += extra(h)
        pad_r += extra(w)
    neg = jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating) \
        else jnp.iinfo(x.dtype).min
    if pad_t or pad_b or pad_l or pad_r:
        x = jnp.pad(x, ((0, 0), (pad_t, pad_b), (pad_l, pad_r), (0, 0)),
                    constant_values=neg)
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding="VALID")


class Conv(nn.Module):
    """Conv2D + optional BatchNorm + optional ReLU, NHWC.

    Weight layout is HWIO; init mirrors the reference's head init
    (xavier for heads, default elsewhere — callers override kernel_init).
    """
    features: int
    kernel: int | Sequence[int] = 3
    stride: int = 1
    padding: int | str = 0
    dilation: int = 1
    relu: bool = True
    batch_norm: bool = False
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    kernel_init: Any = nn.initializers.he_normal()
    # opt-out for layers that must stay full-precision under
    # `quantized("int8")`: the loc/conf heads set output precision
    # directly and are a few % of FLOPs, so they opt out (ssd.py,
    # refinedet.py); the backbone/extras carry the 2x MXU win
    quantizable: bool = True

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        k = (self.kernel, self.kernel) if isinstance(self.kernel, int) \
            else tuple(self.kernel)
        if isinstance(self.padding, str):
            pad = self.padding
        else:
            pad = ((self.padding, self.padding), (self.padding, self.padding))
        x = conv2d(x, self.features, k, (self.stride, self.stride), pad,
                   (self.dilation, self.dilation),
                   use_bias=self.use_bias and not self.batch_norm,
                   dtype=self.dtype, name="conv",
                   kernel_init=self.kernel_init,
                   quantizable=self.quantizable)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             axis_name=None, name="bn")(x.astype(jnp.float32))
            x = x.astype(self.dtype)
        if self.relu:
            x = nn.relu(x)
        return x


def xavier_uniform():
    """matches torch nn.init.xavier_uniform_ used on the reference heads
    (train.py:227-234)."""
    return nn.initializers.xavier_uniform()
