"""Convert CLI round trip: HF dir -> native orbax -> HF dir, params identical.

Parity target: the reference ships `mcore_adapter/tools/convert.py` as the
user-facing HF<->dist-ckpt tool; ours is `socioreasoner_tpu.tools.convert`
(VERDICT r3 Missing #4).
"""

import json
import os

import jax
import jax.numpy as jnp
import pytest

from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
from socioreasoner_tpu.models.qwen2_5_vl.export import save_pretrained
from socioreasoner_tpu.models.qwen2_5_vl.loader import load_pretrained
from socioreasoner_tpu.tools.convert import main as convert_main


def test_hf_native_hf_roundtrip(tmp_path):
    config = Qwen25VLConfig.tiny(256)
    params = qmodel.init_params(config, jax.random.key(3), jnp.float32)
    hf_in = str(tmp_path / "hf_in")
    native = str(tmp_path / "native")
    hf_out = str(tmp_path / "hf_out")
    save_pretrained(config, params, hf_in)

    # HF -> native (auto-detected)
    convert_main(["--checkpoint_path", hf_in, "--output_path", native])
    assert os.path.isdir(native)

    # native -> HF (auto-detected; config comes from the stored meta)
    convert_main(["--checkpoint_path", native, "--output_path", hf_out])
    assert os.path.isfile(os.path.join(hf_out, "config.json"))

    config2, params2 = load_pretrained(hf_out, dtype=jnp.float32)
    assert config2.text.hidden_size == config.text.hidden_size
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         params, params2)
    assert max(jax.tree.leaves(diffs)) < 1e-6


def test_native_to_hf_needs_config_for_bare_ckpt(tmp_path):
    """A train checkpoint without hf_config meta demands --hf_config."""
    from socioreasoner_tpu.utils.checkpoint import CheckpointManager

    config = Qwen25VLConfig.tiny(256)
    params = qmodel.init_params(config, jax.random.key(4), jnp.float32)
    native = str(tmp_path / "bare")
    mgr = CheckpointManager(native, use_async=False)
    mgr.save(0, {"params": params}, wait=True)
    mgr.close()

    hf_out = str(tmp_path / "hf_out")
    with pytest.raises(SystemExit, match="hf_config"):
        convert_main(["--checkpoint_path", native, "--output_path", hf_out])

    # with an explicit config.json it succeeds
    from socioreasoner_tpu.models.qwen2_5_vl.export import config_to_hf_dict
    cfg_path = str(tmp_path / "config.json")
    with open(cfg_path, "w") as f:
        json.dump(config_to_hf_dict(config), f)
    convert_main(["--checkpoint_path", native, "--output_path", hf_out,
                  "--hf_config", cfg_path])
    _, params2 = load_pretrained(hf_out, dtype=jnp.float32)
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         params, params2)
    assert max(jax.tree.leaves(diffs)) < 1e-6
