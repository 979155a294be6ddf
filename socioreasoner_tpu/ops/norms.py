"""Normalization / activation primitives (fused by XLA; float32 statistics)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * weight.astype(jnp.float32)).astype(dtype)


def swiglu(x: jnp.ndarray, gate_w: jnp.ndarray, up_w: jnp.ndarray, down_w: jnp.ndarray,
           gate_b=None, up_b=None, down_b=None) -> jnp.ndarray:
    g = x @ gate_w
    u = x @ up_w
    if gate_b is not None:
        g = g + gate_b
    if up_b is not None:
        u = u + up_b
    h = jax.nn.silu(g) * u
    out = h @ down_w
    if down_b is not None:
        out = out + down_b
    return out


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-6) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (out * weight.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(dtype)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(1.702 x) — the qwen2_vl ViT activation."""
    return x * jax.nn.sigmoid(1.702 * x)
