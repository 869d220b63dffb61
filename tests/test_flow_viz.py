"""Flow visualization parity vs the OpenCV-based reference formula."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from bde2vid_tpu.utils.flow_viz import flow2rgb


def _reference_flow2rgb(disp_x, disp_y, max_magnitude=None):
    """The reference implementation (utils_func/training_utils.py:6-37)
    re-expressed with cv2 as the oracle."""
    h, w = disp_x.shape
    X, Y = np.meshgrid(np.linspace(-1, 1, w), np.linspace(-1, 1, h))
    fx = (X - disp_x) * float(w) / 2
    fy = (Y - disp_y) * float(h) / 2
    magnitude, angle = cv2.cartToPolar(fx, fy)
    if max_magnitude is None:
        v = np.zeros(magnitude.shape, dtype=np.uint8)
        cv2.normalize(src=magnitude, dst=v, alpha=0, beta=255,
                      norm_type=cv2.NORM_MINMAX, dtype=cv2.CV_8U)
    else:
        v = (255.0 * magnitude / max_magnitude).astype(np.uint8)
    hsv = np.zeros((h, w, 3), dtype=np.uint8)
    hsv[..., 1] = 255
    hsv[..., 0] = 0.5 * angle * 180 / np.pi
    hsv[..., 2] = v
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)


@pytest.mark.parametrize("max_mag", [None, 50.0])
def test_flow2rgb_matches_cv2_reference(rng, max_mag):
    dx = rng.normal(0, 0.3, (32, 40))
    dy = rng.normal(0, 0.3, (32, 40))
    got = flow2rgb(dx, dy, max_mag).astype(np.int32)
    want = _reference_flow2rgb(dx, dy, max_mag).astype(np.int32)
    # uint8 rounding in hue/value quantization allows off-by-a-few
    close = np.abs(got - want) <= 6
    assert close.mean() > 0.99, f"{(~close).mean():.3%} pixels differ by >6"
