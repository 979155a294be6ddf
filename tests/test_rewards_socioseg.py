"""Golden-value tests for the SocioSeg rule rewards (formula parity with the
reference reward worker — SURVEY.md §4 demands we design these ourselves)."""

import json

import numpy as np
import pytest

from socioreasoner_tpu.pipeline.rlvr.rewards import socioseg as rw
from socioreasoner_tpu.pipeline.rlvr import parsing


def wrap(answer, think="because"):
    return f"<think>{think}</think><answer>{answer}</answer>"


class TestS1Format:
    def test_perfect(self):
        text = wrap('[{"bbox_2d": [1, 2, 3, 4]}, {"bbox_2d": [5, 6, 7, 8]}]')
        assert rw.s1_format_reward(text) == 2.0

    def test_no_think(self):
        text = '<answer>[{"bbox_2d": [1,2,3,4]}]</answer>'
        assert rw.s1_format_reward(text) == 1.0  # schema ok, structure missing

    def test_extra_keys_penalized(self):
        text = wrap('[{"bbox_2d": [1,2,3,4], "label": "x"}, {"bbox_2d": [1,2,3,4]}]')
        assert rw.s1_format_reward(text) == pytest.approx(1.5)

    def test_bad_json(self):
        assert rw.s1_format_reward(wrap("not json")) == 1.0
        assert rw.s1_format_reward("gibberish") == 0.0

    def test_empty_list(self):
        assert rw.s1_format_reward(wrap("[]")) == 1.0


class TestS1Length:
    def test_exact(self):
        gt = json.dumps([{"bbox_2d": [0, 0, 1, 1]}] * 3)
        pred = wrap(json.dumps([{"bbox_2d": [0, 0, 1, 1]}] * 3))
        assert rw.s1_length_reward(pred, gt) == pytest.approx(1.0)

    def test_formula(self):
        gt = json.dumps([{"bbox_2d": [0, 0, 1, 1]}] * 4)
        pred = wrap(json.dumps([{"bbox_2d": [0, 0, 1, 1]}] * 6))
        assert rw.s1_length_reward(pred, gt) == pytest.approx(np.exp(-2 * 2 / 4))

    def test_gt_empty(self):
        gt = "[]"
        assert rw.s1_length_reward(wrap("[]"), gt) == 1.0
        assert rw.s1_length_reward(wrap('[{"bbox_2d": [0,0,1,1]}]'), gt) == 0.0


class TestS1Accuracy:
    def test_perfect_match(self):
        boxes = [{"bbox_2d": [10, 10, 50, 50]}, {"bbox_2d": [100, 100, 160, 170]}]
        gt = str(boxes).replace("'", '"')
        pred = wrap(json.dumps(boxes))
        # each pair: IoU=1>0.5 and L1=0<10 → cost 0 → total=2, /2 = 1... but
        # reward per match is 1 - cost = 1 each → mean 1.0
        assert rw.s1_accuracy_reward(pred, gt) == pytest.approx(1.0)

    def test_count_mismatch_normalization(self):
        gt = json.dumps([{"bbox_2d": [10, 10, 50, 50]}] * 1)
        pred = wrap(json.dumps([{"bbox_2d": [10, 10, 50, 50]},
                                {"bbox_2d": [500, 500, 600, 600]}]))
        # 1 perfect match out of max(2,1)=2
        assert rw.s1_accuracy_reward(pred, gt) == pytest.approx(0.5)

    def test_near_match_l1_only(self):
        gt = json.dumps([{"bbox_2d": [10, 10, 50, 50]}])
        pred = wrap(json.dumps([{"bbox_2d": [15, 15, 55, 55]}]))
        # L1 = 5 < 10 → +1; IoU < 0.5? IoU of offset boxes = overlap 36x36=1296
        # vs union 2*41*41-1296 → ~0.63 > 0.5 → +1 as well → reward 1.0
        iou = rw.batch_iou(np.array([[15, 15, 55, 55]]), np.array([[10, 10, 50, 50]]))[0, 0]
        want = (iou > 0.5) * 1.0 + 1.0 - 1.0  # 1[IoU] + 1[L1] - 1 = reward per match
        assert rw.s1_accuracy_reward(pred, gt) == pytest.approx(want)

    def test_empty_pred(self):
        gt = json.dumps([{"bbox_2d": [0, 0, 1, 1]}])
        assert rw.s1_accuracy_reward(wrap("[]"), gt) == 0.0


class TestS2Format:
    def test_perfect(self):
        s1 = '[{"bbox_2d": [10, 10, 50, 50]}]'
        pred = wrap(json.dumps([{"bbox_2d": [10, 10, 50, 50], "points": [[20, 20], [30, 30]]}]))
        assert rw.s2_format_reward(pred, s1) == 2.0

    def test_point_outside_box(self):
        s1 = '[{"bbox_2d": [10, 10, 50, 50]}]'
        pred = wrap(json.dumps([{"bbox_2d": [10, 10, 50, 50], "points": [[5, 20]]}]))
        assert rw.s2_format_reward(pred, s1) == 1.0

    def test_point_on_edge_rejected(self):
        s1 = '[{"bbox_2d": [10, 10, 50, 50]}]'
        pred = wrap(json.dumps([{"bbox_2d": [10, 10, 50, 50], "points": [[10, 20]]}]))
        assert rw.s2_format_reward(pred, s1) == 1.0  # strict inequality

    def test_bbox_not_echoed(self):
        s1 = '[{"bbox_2d": [10, 10, 50, 50]}]'
        pred = wrap(json.dumps([{"bbox_2d": [11, 10, 50, 50], "points": [[20, 20]]}]))
        assert rw.s2_format_reward(pred, s1) == 1.0

    def test_count_mismatch(self):
        s1 = '[{"bbox_2d": [10,10,50,50]}, {"bbox_2d": [60,60,80,80]}]'
        pred = wrap(json.dumps([{"bbox_2d": [10, 10, 50, 50], "points": [[20, 20]]}]))
        assert rw.s2_format_reward(pred, s1) == 1.0


class TestS2Length:
    def test_ideal_two_points(self):
        pred = wrap(json.dumps([{"bbox_2d": [0, 0, 9, 9], "points": [[1, 1], [2, 2]]}]))
        assert rw.s2_length_reward(pred) == pytest.approx(1.0)

    def test_gaussian(self):
        pred = wrap(json.dumps([{"points": [[1, 1]] * 4}]))
        assert rw.s2_length_reward(pred) == pytest.approx(np.exp(-4 / 8))

    def test_empty(self):
        assert rw.s2_length_reward(wrap("[]")) == 0.0


class TestMaskIoU:
    def test_iou(self):
        a = np.zeros((8, 8), np.uint8); a[:4] = 1
        b = np.zeros((8, 8), np.uint8); b[2:6] = 1
        assert rw.mask_iou(a, b) == pytest.approx(16 / 48)

    def test_both_empty_reward_vs_eval(self):
        z = np.zeros((4, 4))
        assert rw.mask_iou(z, z, empty_value=0.0) == 0.0   # reward convention
        assert rw.mask_iou(z, z, empty_value=1.0) == 1.0   # eval giou convention

    def test_shape_mismatch(self):
        assert rw.mask_iou(np.zeros((2, 2)), np.zeros((3, 3))) == 0.0


def test_compute_socioseg_rewards_batch():
    gt_mask = np.zeros((16, 16), np.uint8); gt_mask[4:12, 4:12] = 1
    good_mask = gt_mask.copy()
    bad_mask = np.zeros_like(gt_mask)
    boxes = [{"bbox_2d": [4, 4, 12, 12]}]
    gt_bbox = str(boxes).replace("'", '"')
    s1_resp = wrap(json.dumps(boxes))
    s2_resp = wrap(json.dumps([{"bbox_2d": [4, 4, 12, 12], "points": [[6, 6], [8, 8]]}]))

    out = rw.compute_socioseg_rewards(
        map_responses=[s1_resp, "garbage"],
        sat_responses=[s2_resp, "garbage"],
        map_masks=[good_mask, bad_mask],
        sat_masks=[good_mask, bad_mask],
        gt_masks=[gt_mask, gt_mask],
        gt_bbox_texts=[gt_bbox, gt_bbox],
        stage1_bbox_texts=[gt_bbox, gt_bbox],
    )
    # sample 0: map = 2 (format) + 1 (length) + 1 (acc) = 4; sat = 2 + 1 + 1 = 4
    np.testing.assert_allclose(out["map_response_level_rewards"][0], 4.0, atol=1e-5)
    np.testing.assert_allclose(out["sat_response_level_rewards"][0], 4.0, atol=1e-5)
    assert out["seg_iou_rewards"][0] == pytest.approx(1.0)
    # sample 1: everything 0
    assert out["map_response_level_rewards"][1] == 0.0
    assert out["seg_iou_rewards"][1] == 0.0
    assert out["metrics"]["map_format_reward_mean"] == pytest.approx(1.0)


class TestParsing:
    def test_s1(self):
        text = wrap('[{"bbox_2d": [1,2,3,4]}, {"bbox_2d": [1,2]}, "junk"]')
        out = parsing.parse_visual_prompts_s1(text)
        assert out == [{"box": [1, 2, 3, 4]}]

    def test_s2(self):
        text = wrap('[{"bbox_2d": [1,2,3,4], "points": [[5,6],[7,8]]}]')
        out = parsing.parse_visual_prompts_s2(text)
        assert out == [{"box": [1, 2, 3, 4], "points": [[5, 6], [7, 8]], "labels": [1, 1]}]

    def test_no_answer(self):
        assert parsing.parse_visual_prompts_s1("no tags") == []
        assert parsing.parse_answer_text("<answer> x </answer>") == "x"

    def test_strip_special(self):
        assert parsing.strip_special_tokens("a<|im_end|>b<pad>") == "ab"
