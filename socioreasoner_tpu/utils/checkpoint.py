"""Checkpoint save/load via orbax (ref megatron dist-ckpt + CheckpointManager,
`roll/distributed/strategy/megatron_strategy.py:478-598`, `roll/utils/
checkpoint_manager.py:33-80`).

TPU-native: orbax handles sharded arrays natively (each host writes its shards);
async save keeps the train loop running (the reference's async-upload role).
Layout: <output_dir>/<name>/checkpoint-<step>/{params,opt_state,meta}.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


class CheckpointManager:
    """Step-indexed checkpoints with retention (keep_last_n) + async save."""

    def __init__(self, directory: str, keep_last_n: int = 3, use_async: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.keep_last_n = keep_last_n
        ocp = _ocp()
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep_last_n, enable_async_checkpointing=use_async,
            step_prefix="checkpoint")
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, pytree: Any, meta: Optional[Dict] = None, wait: bool = False):
        ocp = _ocp()
        args = {"state": ocp.args.StandardSave(pytree)}
        if meta is not None:
            args["meta"] = ocp.args.JsonSave(meta)
        self._mgr.save(step, args=ocp.args.Composite(**args))
        if wait:
            self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None, like: Optional[Any] = None):
        ocp = _ocp()
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None, None
        if like is not None:
            template = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
            args = ocp.args.Composite(state=ocp.args.StandardRestore(template))
        else:
            args = ocp.args.Composite(state=ocp.args.StandardRestore())
        out = self._mgr.restore(step, args=args)
        meta = None
        meta_path = os.path.join(self.directory, f"checkpoint_{step}", "meta")
        try:
            out_meta = self._mgr.restore(step, args=ocp.args.Composite(
                meta=ocp.args.JsonRestore()))
            meta = out_meta.get("meta")
        except Exception:
            pass
        return out["state"], meta

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
