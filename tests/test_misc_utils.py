"""General rewards, checkpoint manager, orbax checkpoint roundtrip, context mgrs."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestGeneralRules:
    def test_mcq(self):
        from socioreasoner_tpu.pipeline.rlvr.rewards.general_rules import (
            crossthink_accuracy, extract_choice)
        assert extract_choice("<answer>The answer is B</answer>") == "B"
        assert crossthink_accuracy("<answer>B</answer>", "B") == 1.0
        assert crossthink_accuracy("<answer>C</answer>", "B") == 0.0

    def test_text_match(self):
        from socioreasoner_tpu.pipeline.rlvr.rewards.general_rules import (
            crossthink_accuracy)
        assert crossthink_accuracy("<answer>The Eiffel Tower!</answer>",
                                   "eiffel tower") == 1.0
        assert crossthink_accuracy("<answer>Berlin</answer>", "Paris") == 0.0

    def test_numeric_fallback(self):
        from socioreasoner_tpu.pipeline.rlvr.rewards.general_rules import (
            crossthink_accuracy)
        assert crossthink_accuracy(r"so \boxed{1/2}", "0.5") == 1.0

    def test_general_val_dispatch(self):
        from socioreasoner_tpu.pipeline.rlvr.rewards.general_rules import (
            compute_general_val_scores)
        out = compute_general_val_scores(
            [r"\boxed{4}", "<answer>A</answer>"], ["4", "A"], ["math", "mcq"])
        np.testing.assert_array_equal(out["scores"], [1, 1])
        assert out["metrics"]["val/accuracy"] == 1.0
        assert out["metrics"]["val/math/accuracy"] == 1.0


class TestCheckpointManager:
    def test_download_model_resolution(self, tmp_path, monkeypatch):
        from socioreasoner_tpu.utils.checkpoint_manager import download_model
        model_dir = tmp_path / "Qwen" / "Qwen2.5-VL-3B"
        model_dir.mkdir(parents=True)
        monkeypatch.setenv("SOCIO_MODEL_ROOTS", str(tmp_path))
        assert download_model("Qwen/Qwen2.5-VL-3B") == str(model_dir)
        assert download_model(str(model_dir)) == str(model_dir)
        with pytest.raises(FileNotFoundError, match="no network egress"):
            download_model("not/areal-model")

    def test_uploader_retention(self, tmp_path):
        from socioreasoner_tpu.utils.checkpoint_manager import CheckpointUploader
        src = tmp_path / "src"
        dst = tmp_path / "dst"
        up = CheckpointUploader(str(dst), keep_last_n=2)
        for i in (1, 2, 3):
            d = src / f"checkpoint-{i}"
            d.mkdir(parents=True)
            (d / "f.txt").write_text(str(i))
            up.upload(str(d), blocking=True)
        kept = sorted(os.listdir(dst))
        assert kept == ["checkpoint-2", "checkpoint-3"]
        assert (dst / "checkpoint-3" / "f.txt").read_text() == "3"


def test_orbax_checkpoint_roundtrip(tmp_path):
    from socioreasoner_tpu.utils.checkpoint import CheckpointManager
    params = {"w": jnp.arange(12.0).reshape(3, 4), "b": jnp.ones(4)}
    mgr = CheckpointManager(str(tmp_path / "ckpt"), use_async=False)
    mgr.save(5, params, meta={"step": 5}, wait=True)
    restored, meta = mgr.restore(like=params)
    np.testing.assert_array_equal(np.array(restored["w"]), np.array(params["w"]))
    assert mgr.latest_step() == 5
    mgr.close()


def test_context_managers():
    from socioreasoner_tpu.utils.context_managers import (device_memory_stats,
                                                          state_timing_manager)
    metrics = {}
    with state_timing_manager(metrics, "op"):
        x = jnp.ones((10, 10)) @ jnp.ones((10, 10))
        x.block_until_ready()
    assert "time/op/total" in metrics and metrics["time/op/total"] > 0


def test_socioseg_hf_builder(tmp_path):
    """HF-hub dataset builder parity (ref roll/datasets/dataset.py:49-120):
    features schema, split dirs, incomplete tiles skipped."""
    import json
    import numpy as np
    from PIL import Image

    for split in ("train", "val"):
        for tid in ("t1", "t2"):
            d = tmp_path / split / f"{split}_{tid}"
            d.mkdir(parents=True)
            for k in ("map", "sat", "mask"):
                Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(
                    str(d / f"{k}.png"))
            (d / "question.json").write_text(
                json.dumps({"problem": f"find {tid}"}))
    (tmp_path / "train" / "broken").mkdir()      # must be skipped

    from socioreasoner_tpu.datasets.socioseg import load_socioseg
    ds = load_socioseg(str(tmp_path), split="train")
    assert len(ds) == 2
    row = ds[0]
    assert set(row) == {"id", "problem", "map_image", "sat_image", "mask_label"}
    assert row["problem"].startswith("find")
    assert row["map_image"].size == (32, 32)
    assert len(load_socioseg(str(tmp_path), split="val")) == 2


def test_dataset_type_registry(tmp_path):
    """ref dataset.py:13-37 REGISTERED_DATASETS dispatch."""
    import json
    import pytest
    from socioreasoner_tpu.datasets.loader import get_dataset

    p = tmp_path / "rows.jsonl"
    p.write_text("\n".join(json.dumps({"prompt": f"q{i}"}) for i in range(3)))

    class Args:
        dataset_type = "json"
        file_name = str(p)

    rows = get_dataset(Args())
    assert len(rows) == 3 and rows[0]["prompt"] == "q0"

    class Bad:
        dataset_type = "nope"
        file_name = None

    with pytest.raises(ValueError):
        get_dataset(Bad())
