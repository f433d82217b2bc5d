"""Capture golden fixtures from REAL torchvision (round-4 VERDICT item 8).

torchvision is not installed in the build environment, so the oracle tests
for the ops the reference actually calls —

  * ``torchvision.ops.roi_align(..., output_size=(7,7), aligned=True)``
    (upt_tip...py:1028-1029)
  * ``torchvision.ops.boxes.batched_nms(bx, sc, lb, 0.5)`` (:1366)
  * ``torchvision.transforms.ColorJitter(.4,.4,.4)``'s functional kernels
    (adjust_brightness/contrast/saturation, utils_tip...py:95)

— run against builder-authored implementations of the DOCUMENTED semantics
(tests/ref_upt.py, tests/test_ops.py). This script grounds them in the real
binary: run it ONCE in any environment with torchvision installed,

    python tools/capture_torchvision_fixtures.py tests/fixtures

check in the resulting ``torchvision_golden.npz``, and the oracle tests in
tests/test_torchvision_golden.py switch from skip to verifying BOTH our
production JAX ops AND the in-repo torch oracles against the captured
outputs. Inputs are generated here (shared with the test via
``make_inputs``) so capture and verification see identical bytes.
"""
import os
import sys

import numpy as np


def make_inputs():
    """Deterministic inputs covering the semantics corners: fractional
    boxes, boxes at/over the feature border, degenerate (empty) boxes,
    exact score ties, IoU exactly at the NMS threshold, duplicate boxes in
    different classes."""
    rng = np.random.default_rng(20260819)
    feats = rng.normal(0, 1, (2, 8, 14, 14)).astype(np.float32)

    boxes0 = np.array([
        [0.0, 0.0, 223.0, 223.0],       # full frame
        [16.5, 32.25, 180.75, 200.5],   # fractional
        [-10.0, -10.0, 50.0, 60.0],     # past the top-left border
        [200.0, 200.0, 260.0, 260.0],   # past the bottom-right border
        [100.0, 100.0, 100.0, 100.0],   # degenerate (zero area)
        [40.0, 8.0, 47.0, 15.0],        # exactly 7x7 px
    ], np.float32)
    boxes1 = boxes0[::-1].copy() * 0.75
    spatial_scale = 14.0 / 224.0        # the reference's CLIP-grid scale

    n = 24
    nms_boxes = rng.uniform(0, 180, (n, 2)).astype(np.float32)
    nms_boxes = np.concatenate(
        [nms_boxes, nms_boxes + rng.uniform(20, 60, (n, 2)).astype(np.float32)],
        axis=1)
    nms_boxes[1] = nms_boxes[0]                       # duplicate box
    nms_boxes[2] = nms_boxes[0] + [0.0, 0.0, 0.0, 0.0]
    # a pair with IoU exactly 0.5: [0,0,2w,h] vs [0,0,w,h] has IoU 0.5
    nms_boxes[3] = [0.0, 0.0, 100.0, 50.0]
    nms_boxes[4] = [0.0, 0.0, 50.0, 50.0]
    # near-ties, but unique: torchvision's CPU nms sorts scores with a
    # NON-stable sort, so exact-tie keep order is unspecified and must not
    # be baked into a fixture
    scores = (np.round(rng.uniform(0, 1, n), 1)
              + np.arange(n) * 1e-4).astype(np.float32)
    idxs = rng.integers(0, 3, n).astype(np.int64)
    idxs[1] = idxs[0]                                  # same class dup
    idxs[2] = (idxs[0] + 1) % 3                        # cross-class dup

    image = rng.integers(0, 256, (3, 32, 48)).astype(np.uint8)
    jitter_factors = np.array([0.72, 1.31, 0.88, 1.4], np.float32)
    return dict(feats=feats, boxes0=boxes0, boxes1=boxes1,
                spatial_scale=np.float32(spatial_scale),
                nms_boxes=nms_boxes, nms_scores=scores, nms_idxs=idxs,
                image=image, jitter_factors=jitter_factors)


def capture(out_dir):
    import torch
    import torchvision
    import torchvision.transforms.functional as F
    from torchvision.ops.boxes import batched_nms, nms

    x = make_inputs()
    feats = torch.from_numpy(x["feats"])
    out = dict(x)

    # roi_align exactly as the reference calls it (upt_tip...py:1028-1029):
    # one image at a time, box list per image, aligned=True, 7x7
    for b, key in ((0, "boxes0"), (1, "boxes1")):
        pooled = torchvision.ops.roi_align(
            feats[b:b + 1], [torch.from_numpy(x[key])], output_size=(7, 7),
            spatial_scale=float(x["spatial_scale"]), aligned=True)
        out[f"roi_align_{b}"] = pooled.numpy()

    out["nms_keep"] = nms(torch.from_numpy(x["nms_boxes"]),
                          torch.from_numpy(x["nms_scores"]),
                          0.5).numpy()
    out["batched_nms_keep"] = batched_nms(
        torch.from_numpy(x["nms_boxes"]), torch.from_numpy(x["nms_scores"]),
        torch.from_numpy(x["nms_idxs"]), 0.5).numpy()

    img = torch.from_numpy(x["image"])
    bf, cf, sf, bf2 = [float(v) for v in x["jitter_factors"]]
    out["jitter_brightness"] = F.adjust_brightness(img, bf).numpy()
    out["jitter_contrast"] = F.adjust_contrast(img, cf).numpy()
    out["jitter_saturation"] = F.adjust_saturation(img, sf).numpy()
    out["jitter_brightness_up"] = F.adjust_brightness(img, bf2).numpy()
    out["torchvision_version"] = np.bytes_(torchvision.__version__)

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "torchvision_golden.npz")
    np.savez_compressed(path, **out)
    print(f"captured -> {path} (torchvision {torchvision.__version__})")


if __name__ == "__main__":
    capture(sys.argv[1] if len(sys.argv) > 1 else "tests/fixtures")
