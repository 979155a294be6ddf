"""Evaluation harnesses: validation mIoU + zero-shot generalization grouping.

Parity targets:
  val_multi (`rlvr_socioseg_vlm_pipeline.py:1165` → `val_iou/mean` every
  eval_steps) and the zero-shot city-split eval ladder (BASELINE.md config 4:
  held-out city tiles across hierarchy levels — giou grouped by tile tag).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np
from PIL import Image

from .rewards.socioseg import mask_iou


def compute_giou(pred_mask: np.ndarray, gt_mask: np.ndarray) -> float:
    """Eval-convention IoU: both-empty → 1.0 (ref infer pipeline :45-58)."""
    return mask_iou(np.asarray(pred_mask), np.asarray(gt_mask) > 0,
                    empty_value=1.0)


def grouped_giou(gious: Sequence[float], tags: Sequence[str],
                 prefix: str = "val_iou") -> Dict[str, float]:
    """Mean giou overall + per tag (city / hierarchy level)."""
    out = {f"{prefix}/mean": float(np.mean(gious)) if len(gious) else 0.0}
    by_tag: Dict[str, List[float]] = defaultdict(list)
    for g, t in zip(gious, tags):
        if t:
            by_tag[str(t)].append(g)
    for tag, vals in sorted(by_tag.items()):
        out[f"{prefix}/{tag}"] = float(np.mean(vals))
        out[f"{prefix}/{tag}/count"] = float(len(vals))
    return out


def run_validation(pipeline, rows: List[Dict], max_tiles: Optional[int] = None
                   ) -> Dict[str, float]:
    """Two-stage eval of `rows` through an infer-capable pipeline (one that
    exposes the same generate/segment helpers as SocioSegInferPipeline);
    returns val_iou metrics (overall + per tag)."""
    rows = rows[:max_tiles] if max_tiles else rows
    gious, tags = [], []
    batch_size = pipeline.pipeline_config.rollout_batch_size
    for start in range(0, len(rows), batch_size):
        chunk = rows[start:start + batch_size]
        chunk_gious = pipeline.evaluate_batch(chunk)
        gious.extend(chunk_gious)
        tags.extend(str(r.get("tag", "")) for r in chunk)
    return grouped_giou(gious, tags)


def compute_data_metrics(post: Dict[str, np.ndarray], rewards: np.ndarray,
                         advantages: Optional[np.ndarray] = None,
                         prefix: str = "") -> Dict[str, float]:
    """Batch statistics (ref compute_data_metrics :1385): response lengths,
    reward/advantage stats, token counts."""
    resp_mask = np.asarray(post["response_mask"])
    attn = np.asarray(post["attention_mask"])
    resp_len = resp_mask.sum(-1).astype(np.float64)
    prompt_len = (attn - resp_mask).sum(-1).astype(np.float64)
    out = {
        f"{prefix}tokens/response_length/mean": float(resp_len.mean()),
        f"{prefix}tokens/response_length/max": float(resp_len.max()),
        f"{prefix}tokens/response_length/min": float(resp_len.min()),
        f"{prefix}tokens/prompt_length/mean": float(prompt_len.mean()),
        f"{prefix}tokens/total": float(attn.sum()),
        f"{prefix}critic/score/mean": float(np.mean(rewards)),
        f"{prefix}critic/score/max": float(np.max(rewards)),
        f"{prefix}critic/score/min": float(np.min(rewards)),
    }
    if advantages is not None:
        adv = np.asarray(advantages)
        m = resp_mask[:, 1:] > 0
        vals = adv[m] if m.any() else np.zeros(1)
        out[f"{prefix}critic/advantages/mean"] = float(vals.mean())
        out[f"{prefix}critic/advantages/max"] = float(vals.max())
        out[f"{prefix}critic/advantages/min"] = float(vals.min())
    return out
