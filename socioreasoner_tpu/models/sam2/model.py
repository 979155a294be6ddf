"""SAM2 full model + predictor surface.

`set_image` / `predict` parity with the torch SAM2ImagePredictor as the
reference drives it (`roll/distributed/strategy/seg_strategy.py:26-72`), but
TPU-shaped: one jitted encoder call per image, one jitted decoder call covering
ALL K object prompts of a tile (the reference loops objects on host), fused
best-mask selection + OR-reduction + resize on device.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import Sam2Config
from .decoder import (encode_prompts, image_wide_positional_embedding,
                      mask_decoder_forward)
from .encoder import conv2d, hiera_pos_embed, image_encoder_forward

# ImageNet normalization used by the SAM2 processor
IMAGE_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGE_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess_image_device(image: np.ndarray, image_size: int,
                            dtype=jnp.float32) -> jnp.ndarray:
    """uint8 HWC (any size) → normalized (1, S, S, 3) DEVICE array.

    Uploads the raw uint8 (1 byte/px) and does convert/resize/normalize on
    device — the f32 round-trip version moved ~25 MB host↔device per tile
    (dominant in the seg stage through the axon relay)."""
    x = jnp.asarray(np.ascontiguousarray(image))          # uint8 upload
    x = x.astype(jnp.float32) / 255.0
    x = jax.image.resize(x, (image_size, image_size, 3), method="linear")
    x = (x - IMAGE_MEAN) / IMAGE_STD
    return x[None].astype(dtype)


def preprocess_image(image: np.ndarray, image_size: int) -> np.ndarray:
    """Host-array variant of preprocess_image_device (compat/tests)."""
    return np.asarray(preprocess_image_device(image, image_size))


def encode_image(config: Sam2Config, params: Dict, pixel_values: jnp.ndarray,
                 pos_embed: jnp.ndarray) -> List[jnp.ndarray]:
    """Returns [feat_s0 (proj), feat_s1 (proj), low_res + no_mem] high→low res,
    matching HF Sam2Model.get_image_embeddings (conv_s0/s1 pre-applied)."""
    feats = image_encoder_forward(config, params["encoder"], pixel_values, pos_embed)
    # feats: high→low. project s0/s1 (ref get_image_features)
    s0 = conv2d(feats[0], params["conv_s0_w"], params["conv_s0_b"])
    s1 = conv2d(feats[1], params["conv_s1_w"], params["conv_s1_b"])
    low = feats[2] + params["no_memory_embedding"][None, None]
    return [s0, s1, low]


def predict_masks(
    config: Sam2Config, params: Dict,
    image_embeddings: List[jnp.ndarray],
    image_pe: jnp.ndarray,
    points: Optional[jnp.ndarray],        # (B, K, N, 2) in model-input pixel coords
    labels: Optional[jnp.ndarray],        # (B, K, N)
    boxes: Optional[jnp.ndarray],         # (B, K, 4)
    multimask_output: bool = True,
    input_masks: Optional[jnp.ndarray] = None,   # (B, Hm, Wm, 1) mask prompt
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (low-res mask logits (B, K, M, h4, w4), iou scores (B, K, M))."""
    s0, s1, low = image_embeddings
    B = low.shape[0]
    sparse, dense = encode_prompts(
        config.prompt, params["prompt"], points, labels, boxes, B,
        (low.shape[1], low.shape[2]), input_masks=input_masks)
    img = low + dense
    masks, iou, _ = mask_decoder_forward(
        config.decoder, params["decoder"], img, image_pe, sparse,
        [s0, s1], multimask_output)
    return masks, iou


class Sam2Predictor:
    """The `set_image` / `predict` surface (ref SAM2ImagePredictor usage)."""

    def __init__(self, config: Sam2Config, params: Dict):
        self.config = config
        self.params = params
        self.pos_embed = None
        self._embeddings = None
        self._orig_size: Tuple[int, int] = (0, 0)
        self._encode = jax.jit(functools.partial(encode_image, config))
        # jitted decoder; prompt shapes bucketed (K, N powers of two) to bound
        # recompiles — each (K, N, multimask) signature compiles once
        self._predict = jax.jit(functools.partial(predict_masks, config),
                                static_argnames=("multimask_output",))
        self.image_pe = jnp.asarray(
            image_wide_positional_embedding(config.prompt, params["prompt"]))

    @staticmethod
    def _bucket(n: int) -> int:
        b = 1
        while b < n:
            b *= 2
        return b

    # ------------------------------------------------------------------- image
    def set_image(self, image) -> None:
        """image: PIL.Image or uint8 HWC array."""
        arr = np.asarray(image)
        self._orig_size = arr.shape[:2]
        if self.pos_embed is None:
            S = self.config.image_size
            grid = (S // self.config.hiera.patch_stride[0],) * 2
            self.pos_embed = jnp.asarray(hiera_pos_embed(
                self.params["encoder"]["hiera"], self.config.hiera, *grid))
        dtype = self.params["conv_s0_w"].dtype
        pixels = preprocess_image_device(arr, self.config.image_size, dtype)
        self._embeddings = self._encode(self.params, pixels, self.pos_embed)

    # ----------------------------------------------------------------- predict
    def predict(self, point_coords=None, point_labels=None, box=None,
                multimask_output: bool = True, mask_input=None):
        """Single-object predict (reference-compatible): coords in ORIGINAL image
        pixels; mask_input an (Hm, Wm) / (1, Hm, Wm) low-res logit mask at
        mask_input_size (a prior predict's low-res output). Returns
        (masks (M, H, W) bool at original size, scores (M,), low-res)."""
        assert self._embeddings is not None, "call set_image first"
        S = self.config.image_size
        oh, ow = self._orig_size
        sx, sy = S / ow, S / oh
        pts = lbls = boxes = None
        in_masks = None
        if mask_input is not None:
            m = np.asarray(mask_input, np.float32)
            hm, wm = self.config.prompt.mask_input_size
            in_masks = jnp.asarray(m.reshape(1, hm, wm, 1))
        if point_coords is not None:
            p = np.asarray(point_coords, np.float32).reshape(1, 1, -1, 2).copy()
            p[..., 0] *= sx
            p[..., 1] *= sy
            pts = jnp.asarray(p)
            lbls = jnp.asarray(np.asarray(point_labels, np.int32).reshape(1, 1, -1))
        if box is not None:
            b = np.asarray(box, np.float32).reshape(1, 1, 4).copy()
            b[..., 0] *= sx
            b[..., 1] *= sy
            b[..., 2] *= sx
            b[..., 3] *= sy
            boxes = jnp.asarray(b)
        masks, iou = self._predict(self.params, self._embeddings,
                                   self.image_pe, pts, lbls, boxes,
                                   input_masks=in_masks,
                                   multimask_output=multimask_output)
        logits = masks[0, 0]                              # (M, h4, w4)
        up = jax.image.resize(logits, (logits.shape[0], oh, ow), method="linear")
        return np.asarray(up > 0), np.asarray(iou[0, 0]), np.asarray(logits)

    # ----------------------------------------------- batched multi-tile decode
    def set_images(self, images: List) -> None:
        """Encode a BATCH of images in one device call (the seg worker's
        per-batch path; the reference encodes per sample, seg_strategy.py:47)."""
        arrs = [np.asarray(im) for im in images]
        self._orig_size = arrs[0].shape[:2]
        if self.pos_embed is None:
            S = self.config.image_size
            grid = (S // self.config.hiera.patch_stride[0],) * 2
            self.pos_embed = jnp.asarray(hiera_pos_embed(
                self.params["encoder"]["hiera"], self.config.hiera, *grid))
        dtype = self.params["conv_s0_w"].dtype
        pixels = jnp.concatenate(
            [preprocess_image_device(a, self.config.image_size, dtype)
             for a in arrs], axis=0)
        self._embeddings = self._encode(self.params, pixels, self.pos_embed)

    def predict_objects_mask_batch(self, prompts_list: List[List[Dict]],
                                   out_size: Tuple[int, int],
                                   max_objects: int = 16,
                                   embeddings=None) -> List[np.ndarray]:
        """All tiles × all objects in one decoder call. prompts_list[b] holds
        tile b's object prompts (box and/or points); empty lists allowed.
        embeddings: optional (s0, s1, low) batch to decode from (a cached
        encode) instead of the last set_images state."""
        if embeddings is None:
            embeddings = self._embeddings
        B = len(prompts_list)
        K = self._bucket(max([min(len(p), max_objects) for p in prompts_list] + [1]))
        S = self.config.image_size
        oh, ow = self._orig_size
        sx, sy = S / ow, S / oh
        max_pts = self._bucket(max([len(o.get("points", [])) for ps in prompts_list
                                    for o in ps] + [1]))
        boxes = np.zeros((B, K, 4), np.float32)
        pts = np.zeros((B, K, max_pts, 2), np.float32)
        lbl = np.full((B, K, max_pts), -10, np.int32)
        valid = np.zeros((B, K), bool)
        has_boxes = has_points = False
        for b, prompts in enumerate(prompts_list):
            for i, p in enumerate(prompts[:max_objects]):
                valid[b, i] = True
                if p.get("box") is not None:
                    has_boxes = True
                    bb = np.asarray(p["box"], np.float32)
                    boxes[b, i] = [bb[0] * sx, bb[1] * sy, bb[2] * sx, bb[3] * sy]
                if p.get("points"):
                    has_points = True
                    n = len(p["points"])
                    arr = np.asarray(p["points"], np.float32)
                    pts[b, i, :n, 0] = arr[:, 0] * sx
                    pts[b, i, :n, 1] = arr[:, 1] * sy
                    lbl[b, i, :n] = p.get("labels", [1] * n)
        masks, iou = self._predict(
            self.params, embeddings, self.image_pe,
            jnp.asarray(pts) if has_points else None,
            jnp.asarray(lbl) if has_points else None,
            jnp.asarray(boxes) if has_boxes else None,
            multimask_output=True)
        best = jnp.argmax(iou, axis=-1)
        best_masks = jnp.take_along_axis(
            masks, best[:, :, None, None, None], axis=2)[:, :, 0]  # (B, K, h, w)
        vm = jnp.asarray(valid)[:, :, None, None]
        union = jnp.any((best_masks > 0) & vm, axis=1)              # (B, h, w)
        up = jax.image.resize(union.astype(jnp.float32), (B, *out_size),
                              method="nearest")
        out = np.asarray(up > 0.5).astype(np.uint8)
        return [out[b] for b in range(B)]

    # ------------------------------------------------- SocioSeg batched decode
    def predict_objects_mask(self, prompts: List[Dict], out_size: Tuple[int, int],
                             max_objects: int = 16) -> np.ndarray:
        """All K object prompts of the current tile in ONE decoder call; best mask
        per object (argmax iou), OR-reduce, resize to out_size nearest.

        prompts: [{"box": [x1,y1,x2,y2] (orig px), "points": [[x,y]...],
                   "labels": [...]}]  (box and/or points per object).
        Replaces the reference per-object loop (seg_strategy.py:50-63).
        """
        if len(prompts) == 0:
            return np.zeros(out_size, np.uint8)
        K = min(len(prompts), max_objects)
        prompts = prompts[:K]
        S = self.config.image_size
        oh, ow = self._orig_size
        sx, sy = S / ow, S / oh
        max_pts = max([len(p.get("points", [])) for p in prompts] + [1])

        has_boxes = any("box" in p for p in prompts)
        boxes = np.zeros((1, K, 4), np.float32)
        pts = np.zeros((1, K, max_pts, 2), np.float32)
        lbl = np.full((1, K, max_pts), -10, np.int32)     # -10 = padding point
        has_points = False
        for i, p in enumerate(prompts):
            if "box" in p and p["box"] is not None:
                b = np.asarray(p["box"], np.float32)
                boxes[0, i] = [b[0] * sx, b[1] * sy, b[2] * sx, b[3] * sy]
            if p.get("points"):
                has_points = True
                n = len(p["points"])
                arr = np.asarray(p["points"], np.float32)
                pts[0, i, :n, 0] = arr[:, 0] * sx
                pts[0, i, :n, 1] = arr[:, 1] * sy
                labels = p.get("labels", [1] * n)
                lbl[0, i, :n] = labels
        masks, iou = self._predict(
            self.params, self._embeddings, self.image_pe,
            jnp.asarray(pts) if has_points else None,
            jnp.asarray(lbl) if has_points else None,
            jnp.asarray(boxes) if has_boxes else None,
            multimask_output=True)
        best = jnp.argmax(iou, axis=-1)                   # (1, K)
        best_masks = jnp.take_along_axis(
            masks, best[:, :, None, None, None], axis=2)[:, :, 0]  # (1, K, h4, w4)
        union = jnp.any(best_masks > 0, axis=1)[0]        # (h4, w4)
        up = jax.image.resize(union.astype(jnp.float32), out_size, method="nearest")
        return np.asarray(up > 0.5).astype(np.uint8)


def init_params(config: Sam2Config, key: jax.Array, dtype=jnp.float32) -> Dict:
    """Random init with checkpoint-compatible shapes (tests)."""
    hc, pc, dc = config.hiera, config.prompt, config.decoder
    keys = iter(jax.random.split(key, 512))

    def dense(shape, scale=0.02):
        return (jax.random.normal(next(keys), shape) * scale).astype(dtype)

    def zeros(shape):
        return jnp.zeros(shape, dtype)

    def ones(shape):
        return jnp.ones(shape, dtype)

    def ffn2(d_in, d_hidden, d_out):
        return {"fc1_w": dense((d_in, d_hidden)), "fc1_b": zeros((d_hidden,)),
                "fc2_w": dense((d_hidden, d_out)), "fc2_b": zeros((d_out,))}

    def ffn_n(d_in, d_hidden, d_out, depth):
        return {"fc_in_w": dense((d_in, d_hidden)), "fc_in_b": zeros((d_hidden,)),
                "hidden": [{"w": dense((d_hidden, d_hidden)), "b": zeros((d_hidden,))}
                           for _ in range(depth - 2)],
                "fc_out_w": dense((d_hidden, d_out)), "fc_out_b": zeros((d_out,))}

    def attn(hidden, internal):
        return {"q_w": dense((hidden, internal)), "q_b": zeros((internal,)),
                "k_w": dense((hidden, internal)), "k_b": zeros((internal,)),
                "v_w": dense((hidden, internal)), "v_b": zeros((internal,)),
                "o_w": dense((internal, hidden)), "o_b": zeros((hidden,))}

    blocks = []
    block_idx = 0
    for stage_idx, n_blocks in enumerate(hc.blocks_per_stage):
        for bi in range(n_blocks):
            first = stage_idx > 0 and bi == 0
            dim = hc.embed_dim_per_stage[stage_idx - 1] if first else hc.embed_dim_per_stage[stage_idx]
            dim_out = hc.embed_dim_per_stage[stage_idx]
            b = {"ln1_w": ones((dim,)), "ln1_b": zeros((dim,)),
                 "ln2_w": ones((dim_out,)), "ln2_b": zeros((dim_out,)),
                 "qkv_w": dense((dim, 3 * dim_out)), "qkv_b": zeros((3 * dim_out,)),
                 "o_w": dense((dim_out, dim_out)), "o_b": zeros((dim_out,)),
                 "mlp": ffn2(dim_out, int(dim_out * hc.mlp_ratio), dim_out)}
            if dim != dim_out:
                b["proj_w"] = dense((dim, dim_out))
                b["proj_b"] = zeros((dim_out,))
            blocks.append(b)
            block_idx += 1

    grid0 = config.image_size // hc.patch_stride[0]
    encoder = {
        "hiera": {
            "patch_w": dense((*hc.patch_kernel, hc.num_channels, hc.hidden_size)),
            "patch_b": zeros((hc.hidden_size,)),
            "pos_embed": zeros((1, hc.hidden_size, *hc.window_pos_bg_size)),
            "pos_embed_window": zeros((1, hc.hidden_size,
                                       hc.window_size_per_stage[0],
                                       hc.window_size_per_stage[0])),
            "blocks": blocks,
        },
        "neck": {"convs": [{"w": dense((1, 1, c, config.fpn_hidden_size)),
                            "b": zeros((config.fpn_hidden_size,))}
                           for c in config.backbone_channel_list]},
    }
    C = dc.hidden_size
    decoder = {
        "obj_score_token": dense((1, C)), "iou_token": dense((1, C)),
        "mask_tokens": dense((dc.num_mask_tokens, C)),
        "transformer": {
            "layers": [{
                "self_attn": attn(C, C),
                "cross_t2i": attn(C, C // dc.attention_downsample_rate),
                "cross_i2t": attn(C, C // dc.attention_downsample_rate),
                "mlp": ffn2(C, dc.mlp_dim, C),
                "ln1": {"w": ones((C,)), "b": zeros((C,))},
                "ln2": {"w": ones((C,)), "b": zeros((C,))},
                "ln3": {"w": ones((C,)), "b": zeros((C,))},
                "ln4": {"w": ones((C,)), "b": zeros((C,))},
            } for _ in range(dc.num_hidden_layers)],
            "final_attn": attn(C, C // dc.attention_downsample_rate),
            "ln_final": {"w": ones((C,)), "b": zeros((C,))},
        },
        "upscale1_w": dense((2, 2, C // 4, C)), "upscale1_b": zeros((C // 4,)),
        "upscale2_w": dense((2, 2, C // 8, C // 4)), "upscale2_b": zeros((C // 8,)),
        "upscale_ln_w": ones((C // 4,)), "upscale_ln_b": zeros((C // 4,)),
        "hyper_mlps": [ffn_n(C, C, C // 8, 3) for _ in range(dc.num_mask_tokens)],
        "iou_head": ffn_n(C, dc.iou_head_hidden_dim, dc.num_mask_tokens,
                          dc.iou_head_depth),
        "obj_head": ffn_n(C, C, 1, 3),
    }
    mic = pc.mask_input_channels
    prompt = {
        "pe_matrix": dense((2, pc.hidden_size // 2), scale=1.0),
        "point_embed": dense((pc.num_point_embeddings, pc.hidden_size)),
        "not_a_point": dense((pc.hidden_size,)),
        "no_mask": dense((pc.hidden_size,)),
        # mask-prompt downscaler (ref Sam2MaskEmbedding)
        "mask_conv1_w": dense((2, 2, 1, mic // 4)), "mask_conv1_b": zeros((mic // 4,)),
        "mask_ln1_w": ones((mic // 4,)), "mask_ln1_b": zeros((mic // 4,)),
        "mask_conv2_w": dense((2, 2, mic // 4, mic)), "mask_conv2_b": zeros((mic,)),
        "mask_ln2_w": ones((mic,)), "mask_ln2_b": zeros((mic,)),
        "mask_conv3_w": dense((1, 1, mic, pc.hidden_size)),
        "mask_conv3_b": zeros((pc.hidden_size,)),
    }
    return {
        "encoder": encoder, "decoder": decoder, "prompt": prompt,
        "conv_s0_w": dense((1, 1, config.fpn_hidden_size, C // 8)),
        "conv_s0_b": zeros((C // 8,)),
        "conv_s1_w": dense((1, 1, config.fpn_hidden_size, C // 4)),
        "conv_s1_b": zeros((C // 4,)),
        "no_memory_embedding": zeros((1, config.fpn_hidden_size)),
    }
