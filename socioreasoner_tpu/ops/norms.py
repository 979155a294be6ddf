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
