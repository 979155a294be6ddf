"""SocioSegInferPipeline — the two-stage recognize→reason→segment evaluation loop.

North-star API parity with the reference
(`roll/pipeline/rlvr/rlvr_socioseg_vlm_pipeline_infer.py:511-919`,
`examples/start_rlvr_socioseg_pipeline_infer.py`):

  per batch: stage-1 generate (map+sat tile pair → bboxes) → SAM stage-1 masks
  → render bboxes+mask onto both images → stage-2 generate (point prompts)
  → SAM stage-2 masks → per-tile giou (both-empty → 1.0) → dump masks/renders/
  responses under output/infer/result/{stage1,stage2,render1,render2} → mean
  giou_acc → iou_acc.txt.

TPU-shaped: one resident model serves both stages; image embeddings are computed
once per stage per sample; the host render/re-tokenize restage overlaps with
device decode via the continuous-batching engine.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from ...configs.rlvr_config import SocioSegConfig
from ...datasets.collator import SocioSegCollator, collate_restage
from ...datasets.processor import SocioProcessor
from ...datasets.socioseg import format_stage2_prompt, render_visual_prompt
from ...distributed.jax_strategies import (JaxDecodeStrategy, batch_image_embeds)
from ...distributed.seg_strategy import SegStrategy
from ...distributed.strategy import ParamStore
from ...models.qwen2_5_vl.config import Qwen25VLConfig
from ...models.sam2.config import Sam2Config
from ...protocol import BatchProto
from ...utils.metrics import MetricsManager
from ..base_pipeline import BasePipeline
from .parsing import parse_bboxes, strip_special_tokens
from .rewards.socioseg import mask_iou


class SocioSegInferPipeline(BasePipeline):
    def __init__(self, pipeline_config: SocioSegConfig, *,
                 model_config: Qwen25VLConfig, policy_params,
                 sam_config: Sam2Config, sam_params,
                 processor: SocioProcessor, dataset: List[Dict],
                 engine_kwargs: Optional[Dict] = None):
        super().__init__(pipeline_config)
        from ...configs.validation import validate_config
        validate_config(pipeline_config)
        self.model_config = model_config
        self.processor = processor
        self.dataset = dataset

        self.param_store = ParamStore()
        self.param_store.put("rollout", policy_params)
        from .socioseg_pipeline import _build_decode_replicas
        from ...runtime.generate_scheduler import LocalGenerateGroup
        self.decode_replicas = _build_decode_replicas(
            pipeline_config, model_config, self.param_store, engine_kwargs)
        self.actor_infer = self.decode_replicas[0]
        self.decode_group = LocalGenerateGroup(self.decode_replicas)
        self.seg_infer = SegStrategy(worker_config=pipeline_config.seg_infer)
        self.seg_infer.initialize(sam_config, sam_params)

        self.collator = SocioSegCollator(processor, model_config,
                                         prompt_length=pipeline_config.prompt_length)
        self.result_dir = os.path.join(pipeline_config.output_dir, "infer", "result")

    # ---------------------------------------------------------------- eval API
    def evaluate_batch(self, rows) -> list:
        """Two-stage decode+segment over `rows`, returning per-tile giou
        (validation entry — ref val_multi :1165; no artifact dumps)."""
        from .evaluation import compute_giou
        out = self._two_stage(rows)
        gious = []
        for i, row in enumerate(rows):
            gt = np.asarray(row["gt_mask"].convert("L")
                            if hasattr(row["gt_mask"], "convert") else row["gt_mask"])
            gt = np.asarray(Image.fromarray(gt).resize((768, 768),
                                                       Image.Resampling.NEAREST))
            gious.append(compute_giou(out["s2_masks"][i], gt))
        return gious

    def _two_stage(self, rows):
        """Two-stage decode+segment. Default path OVERLAPS the host restage
        (SAM → render → re-tokenize → ViT) with device decode by streaming
        requests through the engine's waiting queue (SURVEY §7 hard part (e),
        ref rlvr_socioseg_vlm_pipeline_infer.py:714-825); the sequential path
        remains for parity tests (overlap_restage: false)."""
        if getattr(self.pipeline_config, "overlap_restage", True) and len(rows) > 1:
            return self._two_stage_overlapped(rows)
        return self._two_stage_sequential(rows)

    def _two_stage_sequential(self, rows):
        """Stage-1 generate → SAM → render restage → stage-2 generate → SAM."""
        cfg = self.pipeline_config
        batch = self.collator(rows)
        rollout = self.param_store.get("rollout")
        embeds = batch_image_embeds(self.model_config, rollout, batch, prefix="map_", image_config=self.processor.image_config)
        gen_batch = BatchProto.from_dict(tensors={
            "input_ids": batch.batch["map_input_ids"],
            "attention_mask": batch.batch["map_attention_mask"],
            "position_ids": batch.batch["map_position_ids"],
        }, meta={"image_embeds_list": embeds})
        seqs = self.decode_group.generate(gen_batch, cfg.actor_infer.generating_args)
        map_texts = self._decode_responses(seqs, batch.batch["map_input_ids"])
        s1_masks = self._segment(batch, map_texts, stage=1)
        s2_prompts, s2_images, bbox_texts = [], [], []
        for i, row in enumerate(rows):
            bboxes = parse_bboxes(map_texts[i])
            btxt = json.dumps([{"bbox_2d": b} for b in bboxes])
            bbox_texts.append(btxt)
            rendered = render_visual_prompt(
                btxt, [row["image_map"], row["image_sat"]], s1_masks[i])
            s2_prompts.append(format_stage2_prompt(row["question"], btxt))
            s2_images.append(rendered)
        s2_batch = collate_restage(self.processor, self.model_config,
                                   s2_prompts, s2_images, cfg.prompt_length)
        embeds2 = batch_image_embeds(self.model_config, rollout, s2_batch, prefix="", image_config=self.processor.image_config)
        gen2 = BatchProto.from_dict(tensors={
            "input_ids": s2_batch.batch["input_ids"],
            "attention_mask": s2_batch.batch["attention_mask"],
            "position_ids": s2_batch.batch["position_ids"],
        }, meta={"image_embeds_list": embeds2})
        seqs2 = self.decode_group.generate(gen2, cfg.actor_infer.generating_args)
        sat_texts = self._decode_responses(seqs2, s2_batch.batch["input_ids"])
        s2_masks = self._segment(batch, sat_texts, stage=2)
        return {"map_texts": map_texts, "sat_texts": sat_texts,
                "s1_masks": s1_masks, "s2_masks": s2_masks,
                "s2_images": s2_images, "bbox_texts": bbox_texts}

    # ------------------------------------------- overlapped two-stage pipeline
    def _two_stage_overlapped(self, rows, group_size: int = None):
        """Request-streaming two-stage loop.

        All stage-1 requests enter the decode servers up front; as each
        finishes, its host restage (parse → SAM s1 → render → re-tokenize →
        ViT embeds) runs in GROUPS on the main thread while the engine keeps
        decoding the remaining stage-1 slots, and the group's stage-2 requests
        go straight into the waiting queue — freed slots refill immediately.
        Stage-2 SAM likewise consumes completions in groups while later tiles
        still decode. Device decode therefore never waits on the host between
        stages (the reference's serial restage throttles its GPUs exactly
        here, ref :714-825)."""
        import queue as _q

        import os as _os
        import sys as _sys
        import time as _time
        _t0 = _time.perf_counter()
        if _os.environ.get("SOCIO_TRACE") == "1":
            def _ev(tag):   # timestamped phase events for host-gap hunting
                print(f"    [trace +{_time.perf_counter() - _t0:6.2f}s] {tag}",
                      file=_sys.stderr, flush=True)
        else:
            def _ev(tag):
                pass
        self._trace_ev = _ev

        cfg = self.pipeline_config
        n = len(rows)
        if group_size is None:
            # restage granularity: smaller groups start the host restage
            # sooner (less batching of SAM/ViT work), larger ones batch
            # better but leave freed slots idle while waiting. Sweepable via
            # config (restage_group_size) or env for on-chip tuning.
            group_size = (int(_os.environ.get("SOCIO_GROUP_SIZE", "0"))
                          or getattr(cfg, "restage_group_size", 0)
                          or max(2, min(8, n // 2)))
        batch = self.collator(rows)
        rollout = self.param_store.get("rollout")
        ga = cfg.actor_infer.generating_args
        from ...generation.sampling import SamplingParams
        sp = SamplingParams.from_generating_args(ga)
        pad = self.model_config.pad_token_id

        map_texts: List = [None] * n
        sat_texts: List = [None] * n
        s1_masks: List = [None] * n
        s2_masks: List = [None] * n
        s2_images: List = [None] * n
        bbox_texts: List = [None] * n

        workers = self.decode_replicas
        loads = [0] * len(workers)
        s1_q: "_q.Queue" = _q.Queue()
        s2_q: "_q.Queue" = _q.Queue()

        for w in workers:
            w.start_server()
        try:
            from ...utils.functionals import GenerateRequestType as GRT

            # ---- submit every stage-1 request (ViT embeds computed per
            # sample just-in-time; the engine starts prefilling immediately)
            ids_all = np.asarray(batch.batch["map_input_ids"])
            attn_all = np.asarray(batch.batch["map_attention_mask"])
            pos_all = np.asarray(batch.batch["map_position_ids"])
            _ev("s1 embeds start")
            embeds = batch_image_embeds(
                self.model_config, rollout, batch, prefix="map_",
                image_config=self.processor.image_config)
            _ev("s1 embeds done; submitting s1 requests")
            for i in range(n):
                valid = attn_all[i] == 1
                w = int(np.argmin(loads))
                loads[w] += 1
                workers[w].add_request(GRT.ADD, {
                    "request_id": ("s1", i, w),
                    "prompt_ids": ids_all[i][valid].tolist(),
                    "sampling": sp,
                    "position_ids": pos_all[i][:, valid],
                    "image_embeds": embeds[i],
                    "callback": s1_q.put})

            # ---- phase A: restage stage-1 completions in groups while the
            # engine decodes the rest
            done = 0
            buf = []
            while done < n:
                out = s1_q.get()
                done += 1
                loads[out.request_id[2]] -= 1
                buf.append(out)
                if len(buf) >= group_size or done == n:
                    group, buf = buf, []
                    _ev(f"restage group ({len(group)} tiles, {done}/{n} s1 done)")
                    self._restage_group(group, rows, batch, rollout, sp,
                                        workers, loads, s2_q,
                                        map_texts, s1_masks, s2_images,
                                        bbox_texts)
                    _ev("restage group done (s2 submitted)")

            # ---- phase B: stage-2 SAM in groups while later tiles decode
            done = 0
            buf = []
            while done < n:
                out = s2_q.get()
                done += 1
                loads[out.request_id[2]] -= 1
                buf.append(out)
                if len(buf) >= group_size or done == n:
                    group, buf = buf, []
                    idxs = [o.request_id[1] for o in group]
                    _ev(f"s2 SAM group ({len(group)} tiles, {done}/{n} s2 done)")
                    for o in group:
                        i = o.request_id[1]
                        resp = np.asarray(o.output_ids, np.int64)
                        sat_texts[i] = strip_special_tokens(
                            self.processor.decode(resp[resp != pad]))
                    masks = self._segment_idxs(batch, idxs,
                                               [sat_texts[i] for i in idxs],
                                               stage=2)
                    for i, m in zip(idxs, masks):
                        s2_masks[i] = m
                    _ev("s2 SAM group done")
        finally:
            for w in workers:
                w.stop_server()
        for k, w in enumerate(workers):
            e = getattr(w, "engine", None)
            if e is not None:
                _ev(f"engine[{k}] stats: decode_steps={e.steps_executed} "
                    f"prefills={e.prefill_rows} forks={e.forked_requests} "
                    f"admit_s={e.admit_time:.2f} decode_s={e.decode_time:.2f} "
                    f"prefill_dev_s={e.prefill_device_time:.2f} "
                    f"prefill_hist={sorted(e.prefill_hist.items())}")

        return {"map_texts": map_texts, "sat_texts": sat_texts,
                "s1_masks": s1_masks, "s2_masks": s2_masks,
                "s2_images": s2_images, "bbox_texts": bbox_texts}

    def _restage_group(self, group, rows, batch, rollout, sp, workers, loads,
                       s2_q, map_texts, s1_masks, s2_images, bbox_texts):
        """One group's host restage: decode text → SAM s1 → render → stage-2
        prompts → re-tokenize → ViT embeds → submit stage-2 requests."""
        from ...utils.functionals import GenerateRequestType as GRT
        cfg = self.pipeline_config
        pad = self.model_config.pad_token_id
        _ev = getattr(self, "_trace_ev", lambda tag: None)
        idxs = [o.request_id[1] for o in group]
        for o in group:
            i = o.request_id[1]
            resp = np.asarray(o.output_ids, np.int64)
            map_texts[i] = strip_special_tokens(
                self.processor.decode(resp[resp != pad]))
        _ev("  restage: s1 SAM start")
        masks = self._segment_idxs(batch, idxs, [map_texts[i] for i in idxs],
                                   stage=1)
        _ev("  restage: s1 SAM done, render start")
        s2_prompts, imgs = [], []
        for i, m in zip(idxs, masks):
            s1_masks[i] = m
            bboxes = parse_bboxes(map_texts[i])
            btxt = json.dumps([{"bbox_2d": b} for b in bboxes])
            bbox_texts[i] = btxt
            rendered = render_visual_prompt(
                btxt, [rows[i]["image_map"], rows[i]["image_sat"]], m)
            s2_images[i] = rendered
            s2_prompts.append(format_stage2_prompt(rows[i]["question"], btxt))
            imgs.append(rendered)
        _ev("  restage: render done, collate start")
        s2_batch = collate_restage(self.processor, self.model_config,
                                   s2_prompts, imgs, cfg.prompt_length)
        _ev("  restage: collate done, s2 embeds start")
        embeds2 = batch_image_embeds(self.model_config, rollout, s2_batch,
                                     prefix="",
                                     image_config=self.processor.image_config)
        _ev("  restage: s2 embeds done")
        ids2 = np.asarray(s2_batch.batch["input_ids"])
        attn2 = np.asarray(s2_batch.batch["attention_mask"])
        pos2 = np.asarray(s2_batch.batch["position_ids"])
        for j, i in enumerate(idxs):
            valid = attn2[j] == 1
            w = int(np.argmin(loads))
            loads[w] += 1
            workers[w].add_request(GRT.ADD, {
                "request_id": ("s2", i, w),
                "prompt_ids": ids2[j][valid].tolist(),
                "sampling": sp,
                "position_ids": pos2[j][:, valid],
                "image_embeds": embeds2[j],
                "callback": s2_q.put})

    def _segment_idxs(self, batch: BatchProto, idxs: List[int],
                      texts: List[str], stage: int) -> List[np.ndarray]:
        """_segment over a subset of tiles (the overlapped path's group)."""
        from .parsing import parse_visual_prompts_s1, parse_visual_prompts_s2
        parser = parse_visual_prompts_s1 if stage == 1 else parse_visual_prompts_s2
        prompts = np.empty(len(idxs), object)
        prompts[:] = [parser(t) for t in texts]
        images = np.empty(len(idxs), object)
        for j, i in enumerate(idxs):
            images[j] = batch.non_tensor["seg_image"][i]
        seg_batch = BatchProto.from_dict(non_tensors={
            "seg_image": images, "visual_prompt": prompts})
        return [r["mask"] for r in self.seg_infer.segment(seg_batch)]

    # ------------------------------------------------------------------- run
    def run(self) -> float:
        cfg = self.pipeline_config
        for sub in ("stage1", "stage2", "render1", "render2"):
            os.makedirs(os.path.join(self.result_dir, sub), exist_ok=True)
        gious: List[float] = []
        mm = self.metrics

        # result dumps (4 PNGs + 2 txt per tile, ref :870-913) run on a writer
        # thread so the device starts the next chunk's two-stage immediately;
        # giou is computed inline (cheap) to keep `gious` ordered
        import queue as _q
        import threading

        dump_q: "_q.Queue" = _q.Queue()
        dump_err: List[BaseException] = []

        def _writer():
            while True:
                job = dump_q.get()
                if job is None:
                    return
                try:
                    job()
                except BaseException as e:  # noqa: BLE001 — surfaced at join
                    dump_err.append(e)

        writer = threading.Thread(target=_writer, daemon=True)
        writer.start()

        def _dump_tile(tile, s1m, s2m, renders, mtxt, stxt):
            def job():
                Image.fromarray(s1m * 255).save(
                    os.path.join(self.result_dir, "stage1", f"{tile}.png"))
                Image.fromarray(s2m * 255).save(
                    os.path.join(self.result_dir, "stage2", f"{tile}.png"))
                renders[0].save(
                    os.path.join(self.result_dir, "render1", f"{tile}.png"))
                renders[1].save(
                    os.path.join(self.result_dir, "render2", f"{tile}.png"))
                with open(os.path.join(self.result_dir, "stage1",
                                       f"{tile}.txt"), "w") as f:
                    f.write(mtxt)
                with open(os.path.join(self.result_dir, "stage2",
                                       f"{tile}.txt"), "w") as f:
                    f.write(stxt)
            dump_q.put(job)

        bs = cfg.rollout_batch_size
        try:
            for start in range(0, len(self.dataset), bs):
                rows = self.dataset[start:start + bs]
                with mm.timer("two_stage"):
                    out = self._two_stage(rows)
                map_texts, sat_texts = out["map_texts"], out["sat_texts"]
                s1_masks, s2_masks = out["s1_masks"], out["s2_masks"]
                s2_images = out["s2_images"]

                # ---------------- metrics + dumps (ref :870-913)
                for i, row in enumerate(rows):
                    gt = np.asarray(row["gt_mask"].convert("L")
                                    if hasattr(row["gt_mask"], "convert")
                                    else row["gt_mask"])
                    gt = np.asarray(Image.fromarray(gt).resize(
                        (768, 768), Image.Resampling.NEAREST))
                    giou = mask_iou(s2_masks[i], gt > 0, empty_value=1.0)
                    gious.append(giou)
                    _dump_tile(str(row.get("id", start + i)), s1_masks[i],
                               s2_masks[i], s2_images[i], map_texts[i],
                               sat_texts[i])
                self.log_metrics(mm.reduce(), start // bs)
        finally:
            dump_q.put(None)
            writer.join()
        if dump_err:
            raise dump_err[0]

        giou_acc = float(np.mean(gious)) if gious else 0.0
        with open(os.path.join(self.result_dir, "iou_acc.txt"), "w") as f:
            f.write(f"{giou_acc}\n")
        print(f"giou_acc: {giou_acc}")
        return giou_acc

    # ---------------------------------------------------------------- helpers
    def _decode_responses(self, seqs: np.ndarray, prompt_ids: np.ndarray) -> List[str]:
        """Full sequences → response text (strip prompt + pads)."""
        pad = self.model_config.pad_token_id
        texts = []
        prompt_lens = (np.asarray(prompt_ids) != pad).sum(-1)
        for i in range(len(seqs)):
            seq = seqs[i]
            valid = seq[seq != pad]
            resp = valid[int(prompt_lens[i]):]
            texts.append(strip_special_tokens(self.processor.decode(resp)))
        return texts

    def _segment(self, batch: BatchProto, texts: List[str], stage: int
                 ) -> List[np.ndarray]:
        """Batched SegStrategy path: one encoder call over every tile with
        prompts, one decoder call for all tiles×objects (seg_strategy.py)."""
        from .parsing import parse_visual_prompts_s1, parse_visual_prompts_s2
        parser = parse_visual_prompts_s1 if stage == 1 else parse_visual_prompts_s2
        prompts = np.empty(len(batch), object)
        prompts[:] = [parser(t) for t in texts]
        seg_batch = BatchProto.from_dict(non_tensors={
            "seg_image": batch.non_tensor["seg_image"],
            "visual_prompt": prompts,
        })
        return [r["mask"] for r in self.seg_infer.segment(seg_batch)]
