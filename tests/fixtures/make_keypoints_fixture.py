"""Generate tests/fixtures/keypoints_sample.pkl — a recorded-keypoints
fixture in the reference extract_kps.py pkl schema ({"kps": [...],
"resolution": (H, W, C)}, reference preprocess/extract_kps.py:74-117).

MediaPipe is absent from this image (external pretrained C++ graph), so the
fixture is synthesized deterministically with the exact landmark topology a
Holistic capture produces: 33-point pose, 21-point hands, 468-point face
mesh with a geometrically plausible face oval. It regression-locks the
*real-data* keypoint code path (mask_frames / chin_lines /
check_visible_gestures / upper_body_crop — reference
inference_embs.py:155-286, preprocess/inference_preprocess.py:170-238)
that the fake-backend tests in test_host.py do not exercise.

Run from the repo root:  python tests/fixtures/make_keypoints_fixture.py
"""

import math
import pickle
import os

import numpy as np

H, W = 480, 640
T = 30
FACE_N, POSE_N, HAND_N = 468, 33, 21

# MediaPipe pose topology indices used by the crop logic
L_ARM = [12, 14, 16, 18, 20, 22, 24]
R_ARM = [11, 13, 15, 17, 19, 21, 23]
L_HIP, R_HIP = 23, 24


def lm(x, y, z=0.0, visibility=0.95):
    return {"x": float(x), "y": float(y), "z": float(z),
            "visibility": float(visibility)}


def make_face(rng, t):
    """468 landmarks; the oval indices lie on an ellipse whose bottom (the
    chin) bobs a little frame to frame, like a talking head."""
    cx, cy = 0.5 + 0.01 * math.sin(t / 5.0), 0.22
    rx, ry = 0.08, 0.12 + 0.004 * math.sin(t / 3.0)
    pts = []
    for i in range(FACE_N):
        ang = 2 * math.pi * (i % 36) / 36.0
        jitter = 0.002 * float(rng.standard_normal())
        pts.append(lm(cx + (rx + jitter) * math.cos(ang),
                      cy + (ry + jitter) * math.sin(ang)))
    return pts


def make_pose(rng, t):
    """33 landmarks; arms swing horizontally (gesturing), hips fixed."""
    pts = [lm(0.5, 0.5, visibility=0.2) for _ in range(POSE_N)]
    swing = 0.10 * math.sin(t / 4.0)
    # MediaPipe image coords mirror a camera-facing subject: the RIGHT-body
    # landmarks (even indices 12..22) sit at LOW image x, the LEFT-body ones
    # (odd 11..21) at HIGH x — the convention adjust_bbox_kps assumes
    # (reference inference_preprocess.py:178-201)
    for i, base_x in zip([12, 14, 16, 18, 20, 22], [0.38, 0.32, 0.26, 0.24, 0.23, 0.25]):
        pts[i] = lm(base_x - swing, 0.42 + 0.05 * (i - 12) / 10.0)
    for i, base_x in zip([11, 13, 15, 17, 19, 21], [0.62, 0.68, 0.74, 0.76, 0.77, 0.75]):
        pts[i] = lm(base_x + swing, 0.42 + 0.05 * (i - 11) / 10.0)
    pts[L_HIP] = lm(0.44, 0.78)
    pts[R_HIP] = lm(0.56, 0.78)
    return pts


def make_hand(rng, cx, cy):
    return [lm(cx + 0.01 * float(rng.standard_normal()),
               cy + 0.01 * float(rng.standard_normal()))
            for _ in range(HAND_N)]


def main():
    rng = np.random.default_rng(20260816)
    kps = []
    for t in range(T):
        frame = {
            "pose": make_pose(rng, t),
            # hands drop out for the first 8 frames (tracker warm-up), as
            # real captures do — 8/30 < the 70% handless rejection threshold
            "left_hand": None if t < 8 else make_hand(rng, 0.75, 0.55),
            "right_hand": None if t < 8 else make_hand(rng, 0.25, 0.55),
            # one mid-clip face dropout exercises the fallback mask row
            "face": None if t == 15 else make_face(rng, t),
        }
        kps.append(frame)
    out = os.path.join(os.path.dirname(__file__), "keypoints_sample.pkl")
    with open(out, "wb") as f:
        pickle.dump({"kps": kps, "resolution": (H, W, 3)}, f)
    print(f"wrote {out} ({os.path.getsize(out)} bytes, {T} frames)")


if __name__ == "__main__":
    main()
