"""Native host library (csrc/socio_host.cpp) vs cv2/scipy/numpy references."""

import numpy as np
import pytest

from socioreasoner_tpu.utils import native


@pytest.fixture(scope="module", autouse=True)
def built():
    assert native.available(), "native lib failed to build"


def test_resize_nearest_matches_cv2():
    import cv2
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (37, 53, 3), dtype=np.uint8)
    got = native.resize_u8(img, (64, 80), "nearest")
    want = cv2.resize(img, (80, 64), interpolation=cv2.INTER_NEAREST)
    assert (got == want).mean() > 0.99   # boundary rounding may differ on a few px


def test_resize_bilinear_close_to_cv2():
    import cv2
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (50, 60, 3), dtype=np.uint8)
    got = native.resize_u8(img, (100, 120), "bilinear").astype(int)
    want = cv2.resize(img, (120, 100), interpolation=cv2.INTER_LINEAR).astype(int)
    assert np.abs(got - want).mean() < 1.0


def test_patchify_matches_python():
    from socioreasoner_tpu.datasets.processor import (ImageProcessorConfig,
                                                      patchify_image)
    from PIL import Image
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (56, 84, 3), dtype=np.uint8)
    cfg = ImageProcessorConfig()
    want, grid = patchify_image(Image.fromarray(img), cfg, pre_resized=True)
    got = native.patchify_normalize(img, cfg.image_mean, cfg.image_std)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_connected_components_matches_cv2():
    import cv2
    rng = np.random.default_rng(3)
    mask = (rng.random((64, 64)) > 0.7).astype(np.uint8)
    got = native.connected_components_count(mask)
    want, *_ = cv2.connectedComponentsWithStats(mask * 255, connectivity=8)
    assert got == want - 1


def test_component_boxes_vs_cv2():
    mask = np.zeros((64, 64), np.uint8)
    mask[5:20, 5:25] = 1           # area 300
    mask[40:60, 30:55] = 1         # area 500
    mask[0:2, 60:62] = 1           # area 4 < min_area → dropped
    got = sorted(native.component_boxes(mask, min_area=10))
    assert got == [[5, 5, 25, 20], [30, 40, 55, 60]]


def test_hungarian_matches_scipy():
    from scipy.optimize import linear_sum_assignment
    rng = np.random.default_rng(4)
    for shape in [(5, 5), (3, 7), (7, 3)]:
        cost = rng.random(shape)
        ri, ci = native.hungarian(cost)
        sri, sci = linear_sum_assignment(cost)
        assert np.isclose(cost[ri, ci].sum(), cost[sri, sci].sum())


def test_mask_iou_native():
    a = np.zeros((8, 8), np.uint8); a[:4] = 1
    b = np.zeros((8, 8), np.uint8); b[2:6] = 1
    assert native.mask_iou_native(a, b) == pytest.approx(16 / 48)
    z = np.zeros((4, 4), np.uint8)
    assert native.mask_iou_native(z, z, empty_value=1.0) == 1.0


def test_render_overlay():
    img = np.full((32, 32, 3), 100, np.uint8)
    mask = np.zeros((32, 32), np.uint8); mask[10:20, 10:20] = 1
    out = native.render_overlay(img, [[2, 2, 29, 29]], mask)
    assert out.shape == (32, 32, 3)
    # box outline drawn in blue
    assert tuple(out[2, 10]) == (0, 0, 255)
    # masked area blended toward red: R rose, G fell
    assert out[15, 15, 0] > 100 and out[15, 15, 1] < 100
    # untouched pixel unchanged
    assert tuple(out[5, 5]) == (100, 100, 100)
