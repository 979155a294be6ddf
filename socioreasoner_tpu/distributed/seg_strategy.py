"""SAM2 mask-decode strategy (reference seg_infer, seg_strategy.py:26-80).

Behavior parity: per sample — resize image to 756×756, encode once, decode every
parsed visual prompt, OR the best-scoring masks, emit a 768×768 uint8 mask.
TPU-shaped: all K prompts of a sample decode in one device call
(Sam2Predictor.predict_objects_mask)."""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from ..models.sam2.config import Sam2Config
from ..models.sam2.model import Sam2Predictor
from ..protocol import BatchProto
from .strategy import InferenceStrategy

SEG_INPUT_SIZE = (756, 756)    # ref seg_strategy.py:38
SEG_OUTPUT_SIZE = (768, 768)   # ref seg_strategy.py:43,65


class SegStrategy(InferenceStrategy):
    strategy_name = "seg_infer"

    def initialize(self, sam_config: Sam2Config, params):
        self.sam_config = sam_config
        self.predictor = Sam2Predictor(sam_config, params)

    def segment(self, batch: BatchProto) -> List[Dict[str, np.ndarray]]:
        """batch columns: seg_image (PIL), visual_prompt (list of per-object
        dicts with box/points/labels). Returns [{"mask": (768,768) uint8}].

        Batched: the image encoder runs once over every tile with prompts and
        the mask decoder once over all tiles×objects (the reference loops
        set_image/predict per sample+object, seg_strategy.py:47-63)."""
        n = len(batch)
        results: List[Dict[str, np.ndarray]] = [None] * n
        to_run, images, prompt_lists = [], [], []
        for i in range(n):
            prompts = batch.non_tensor["visual_prompt"][i]
            if prompts is None or len(prompts) == 0:
                results[i] = {"mask": np.zeros(SEG_OUTPUT_SIZE, np.uint8)}
                continue
            image = batch.non_tensor["seg_image"][i]
            img = image.resize(SEG_INPUT_SIZE) if isinstance(image, Image.Image) \
                else Image.fromarray(np.asarray(image)).resize(SEG_INPUT_SIZE)
            to_run.append(i)
            images.append(img)
            prompt_lists.append(list(prompts))
        # sub-batches of strategy_config.seg_encode_batch (default
        # min(infer_batch_size, 8)): Hiera-large encoder activations at 1024²
        # scale with batch — an uncapped batch-24 encode exceeds v5e HBM
        # alongside the resident 3B decode weights. infer_batch_size alone is
        # NOT the cap: the reference yamls use it for requests-per-RPC (32),
        # which would reintroduce the OOM (ADVICE r2 medium).
        mb = self._encode_batch()
        for start in range(0, len(to_run), mb):
            idx = to_run[start:start + mb]
            self.predictor.set_images(images[start:start + mb])
            masks = self.predictor.predict_objects_mask_batch(
                prompt_lists[start:start + mb], SEG_OUTPUT_SIZE)
            for i, m in zip(idx, masks):
                results[i] = {"mask": m}
        return results

    def _encode_batch(self) -> int:
        wc = self.worker_config
        sc = (wc.strategy_args.config if wc is not None else {}) or {}
        if sc.get("seg_encode_batch"):
            return int(sc["seg_encode_batch"])
        ibs = getattr(wc, "infer_batch_size", 0) or 8
        return min(int(ibs), 8)
