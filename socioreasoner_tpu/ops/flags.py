"""Kernel-selection flags: use Pallas kernels on TPU, XLA reference elsewhere."""

from __future__ import annotations

import functools
import os


@functools.lru_cache(None)
def on_tpu() -> bool:
    import jax
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def use_flash_attention(explicit=None) -> bool:
    if explicit is not None:
        return bool(explicit)
    if os.environ.get("SOCIO_DISABLE_FLASH", "0") == "1":
        return False
    return on_tpu()
