"""Recorded-keypoints fixture tests: the real-data keypoint path.

The fake-backend tests in test_host.py exercise the plumbing; these drive
the actual Holistic-shaped data (468-point face mesh, 33-point pose,
21-point hands — the extract_kps.py pkl schema) through mask_frames /
chin_lines / check_visible_gestures / upper_body_crop WITHOUT mediapipe
installed (reference inference_embs.py:155-286,
preprocess/inference_preprocess.py:170-238, preprocess/extract_kps.py:74-117).

The fixture is committed at tests/fixtures/keypoints_sample.pkl; its
generator (make_keypoints_fixture.py, same dir) documents the geometry.
"""

import os

import numpy as np
import pytest

from jegal_tpu.host.keypoints import load_keypoints
from jegal_tpu.host.masking import (
    FACE_OVAL_IDX,
    check_visible_gestures,
    face_bbox_bottom,
    mask_frames,
)
from jegal_tpu.host.preprocess import upper_body_crop
from jegal_tpu.ops.video import FALLBACK_ROWS, chin_lines

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "keypoints_sample.pkl")


@pytest.fixture(scope="module")
def recorded():
    kps, resolution = load_keypoints(FIXTURE)
    return kps, resolution


def test_fixture_schema(recorded):
    """Exact extract_kps.py landmark topology."""
    kps, resolution = recorded
    assert resolution == (480, 640, 3)
    assert len(kps) == 30
    for frame in kps:
        assert set(frame) == {"pose", "left_hand", "right_hand", "face"}
        assert len(frame["pose"]) == 33
        if frame["face"] is not None:
            assert len(frame["face"]) == 468
        for hand in (frame["left_hand"], frame["right_hand"]):
            if hand is not None:
                assert len(hand) == 21
        for part in frame.values():
            if part is not None:
                assert set(part[0]) == {"x", "y", "z", "visibility"}


def test_visibility_gate_accepts_fixture(recorded):
    kps, _ = recorded
    assert check_visible_gestures(kps)


def test_visibility_gate_rejects_handless():
    """>70% of frames with pose but no hands -> reject
    (reference inference_embs.py:229-231)."""
    kps, _ = load_keypoints(FIXTURE)
    for frame in kps:
        frame["left_hand"] = frame["right_hand"] = None
    assert not check_visible_gestures(kps)


def test_chin_lines_match_face_oval(recorded):
    kps, resolution = recorded
    rows = chin_lines(kps, resolution)
    assert rows.shape == (len(kps),)
    for i, frame in enumerate(kps):
        if frame["face"] is None:
            assert rows[i] == FALLBACK_ROWS  # mid-clip face dropout
        else:
            y2 = face_bbox_bottom(frame["face"], resolution)
            expected = int((y2 + 16) * 270 / resolution[0])
            assert rows[i] == expected
            # a talking head's chin sits in the upper half of the frame
            assert 0 < rows[i] < 270 // 2


def test_mask_frames_blacks_out_face(recorded):
    """Host masking path on real-shaped keypoints: everything above the
    chin line is zeroed, content below survives."""
    kps, resolution = recorded
    t = len(kps)
    frames = np.full((t, resolution[0], resolution[1], 3), 200, np.uint8)
    out = mask_frames(frames, kps)
    assert out.shape == (t + 24, 270, 480, 3)
    rows = chin_lines(kps, resolution)
    for i in range(t):
        r = rows[i]
        # masked rows are exactly zero; a row safely below the (resize-
        # interpolated) boundary keeps the original gray level
        assert out[12 + i, : max(r - 2, 1)].max() == 0.0
        assert out[12 + i, min(r + 3, 269):].min() > 0.5


def test_upper_body_crop_from_recorded_pose(recorded):
    """Pixel-space pose keypoints drive the gesture-arm / waistline crop
    (reference adjust_bbox_kps, inference_preprocess.py:170-238)."""
    kps, resolution = recorded
    h, w = resolution[:2]
    pose_px = np.array([
        [[p["x"] * w, p["y"] * h, p["visibility"]] for p in frame["pose"]]
        for frame in kps])
    frames = [np.full((h, w, 3), 127, np.uint8) for _ in kps]
    crops = upper_body_crop(frames, pose_px)
    ch, cw = crops[0].shape[:2]
    # the waistline (hips at y=0.78) minus 15px padding cuts the bottom
    assert ch == int(0.78 * h) - 15
    # arm extents plus 25px padding cut both sides, but keep the torso
    assert cw < w
    assert cw > 0.3 * w
    for c in crops:
        assert c.shape == crops[0].shape


def test_fixture_needs_no_mediapipe():
    """The whole path above must run without the external wheel."""
    try:
        import mediapipe  # noqa: F401
        pytest.skip("mediapipe unexpectedly installed")
    except ImportError:
        pass
