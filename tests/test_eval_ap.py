"""AP meter & association tests.

1. Statistical invariant (from the reference's own test idiom,
   /root/reference/pocket/test/ap.py:11-40): a class whose detections are
   p-fraction random positives with random scores has E[AP] ~= p.
2. Golden parity against the reference implementations, loaded standalone
   with stubbed package internals (torch CPU as oracle).
"""
import importlib.util
import sys
import types

import numpy as np
import pytest

from hoigen_tpu.eval import (BoxPairAssociation, DetectionAPMeter,
                             ap_11_point, ap_auc, ap_interpolated)
from hoigen_tpu.eval.ap import _pr_curve
from hoigen_tpu.eval.association import box_iou

REF = "/root/reference"


def _load_ref_module(relpath, name, stubs):
    for mod_name, mod in stubs.items():
        sys.modules[mod_name] = mod
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_meters():
    torch = pytest.importorskip("torch")
    ops_stub = types.ModuleType("pocket.ops")
    ops_stub.to_tensor = lambda x, **kw: x
    pocket_stub = types.ModuleType("pocket")
    pocket_stub.__path__ = []
    utils_stub = types.ModuleType("pocket.utils")
    utils_stub.__path__ = []
    return _load_ref_module(
        "pocket/pocket/utils/meters.py", "pocket.utils.meters",
        {"pocket": pocket_stub, "pocket.ops": ops_stub,
         "pocket.utils": utils_stub})


@pytest.fixture(scope="module")
def ref_association():
    torch = pytest.importorskip("torch")

    def torch_box_iou(a, b, encoding="coord"):
        return torch.from_numpy(box_iou(a.numpy(), b.numpy(), encoding))

    ops_stub = types.ModuleType("pocket.ops")
    ops_stub.to_tensor = lambda x, **kw: x
    ops_stub.box_iou = torch_box_iou
    pocket_stub = types.ModuleType("pocket")
    pocket_stub.__path__ = []
    utils_stub = types.ModuleType("pocket.utils")
    utils_stub.__path__ = []
    return _load_ref_module(
        "pocket/pocket/utils/association.py", "pocket.utils.association",
        {"pocket": pocket_stub, "pocket.ops": ops_stub,
         "pocket.utils": utils_stub})


def test_statistical_invariant():
    rng = np.random.default_rng(0)
    for p in (0.2, 0.5, 0.8):
        aps = {"11P": [], "AUC": [], "INT": []}
        for _ in range(20):
            n = 2000
            labels = (rng.random(n) < p).astype(np.float64)
            scores = rng.random(n)
            prec, rec = _pr_curve(scores, labels, None)
            aps["11P"].append(ap_11_point(prec, rec))
            aps["AUC"].append(ap_auc(prec, rec))
            aps["INT"].append(ap_interpolated(prec, rec))
        for alg, vals in aps.items():
            # 11P is upward-biased by construction (max-precision envelope)
            tol = 0.06 if alg == "11P" else 0.03
            assert abs(np.mean(vals) - p) < tol, (alg, p, np.mean(vals))


def test_meter_parity_with_reference(ref_meters):
    import torch
    rng = np.random.default_rng(1)
    num_cls = 13
    meter = DetectionAPMeter(num_cls, algorithm="11P")
    ref = ref_meters.DetectionAPMeter(num_cls, nproc=1, algorithm="11P")
    for _ in range(5):
        n = 300
        scores = rng.random(n)
        classes = rng.integers(0, num_cls, n)
        labels = (rng.random(n) < 0.4).astype(np.float64)
        meter.append(scores, classes, labels)
        ref.append(torch.from_numpy(scores), torch.from_numpy(classes),
                   torch.from_numpy(labels))
    ours = meter.eval()
    theirs = ref.eval().numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-10)


@pytest.mark.parametrize("alg", ["11P", "AUC", "INT"])
def test_meter_parity_with_num_gt(ref_meters, alg):
    import torch
    rng = np.random.default_rng(2)
    num_cls = 7
    num_gt = rng.integers(50, 100, num_cls).astype(np.float64)
    meter = DetectionAPMeter(num_cls, num_gt=num_gt, algorithm=alg)
    # reference expects num_gt as a plain list (0-dim tensors break its div())
    ref = ref_meters.DetectionAPMeter(
        num_cls, num_gt=num_gt.tolist(), nproc=1, algorithm=alg)
    n = 500
    scores = rng.random(n)
    classes = rng.integers(0, num_cls, n)
    labels = (rng.random(n) < 0.3).astype(np.float64)
    meter.append(scores, classes, labels)
    ref.append(torch.from_numpy(scores), torch.from_numpy(classes),
               torch.from_numpy(labels))
    np.testing.assert_allclose(meter.eval(), ref.eval().numpy(), atol=1e-10)


def test_association_parity(ref_association):
    import torch
    rng = np.random.default_rng(3)
    assoc = BoxPairAssociation(min_iou=0.5)
    ref = ref_association.BoxPairAssociation(min_iou=0.5)
    for _ in range(10):
        g, d = rng.integers(1, 6), rng.integers(1, 30)

        def rand_boxes(n):
            xy = rng.random((n, 2)) * 50
            wh = rng.random((n, 2)) * 60 + 5
            return np.concatenate([xy, xy + wh], 1)

        gt_h, gt_o = rand_boxes(g), rand_boxes(g)
        # half the detections jitter a GT pair to create plausible matches
        det_h, det_o = rand_boxes(d), rand_boxes(d)
        for k in range(d // 2):
            j = rng.integers(0, g)
            det_h[k] = gt_h[j] + rng.normal(0, 3, 4)
            det_o[k] = gt_o[j] + rng.normal(0, 3, 4)
        scores = rng.random(d)
        ours = assoc((gt_h, gt_o), (det_h, det_o), scores)
        theirs = ref(
            (torch.from_numpy(gt_h), torch.from_numpy(gt_o)),
            (torch.from_numpy(det_h), torch.from_numpy(det_o)),
            torch.from_numpy(scores)).numpy()
        np.testing.assert_array_equal(ours, theirs)


def test_box_iou_pixel_encoding():
    a = np.array([[0, 0, 9, 9]], np.float64)   # 10x10 in pixel encoding
    assert box_iou(a, a, "pixel")[0, 0] == 1.0
    b = np.array([[0, 0, 4, 9]], np.float64)   # 5x10
    assert abs(box_iou(a, b, "pixel")[0, 0] - 0.5) < 1e-12


def test_classification_ap_parity(ref_meters):
    # NB: the reference meter's eval() spins a multiprocessing spawn pool
    # (meters.py:314) which hangs under pytest on this 1-core box, so the
    # oracle calls its per-class static methods directly.
    import torch
    from hoigen_tpu.eval.ap import classification_ap
    rng = np.random.default_rng(9)
    n, k = 400, 6
    output = rng.random((n, k))
    labels = (rng.random((n, k)) < 0.3).astype(np.float64)
    M = ref_meters.AveragePrecisionMeter
    handles = {"AUC": M.compute_per_class_ap_as_auc,
               "11P": M.compute_per_class_ap_with_11_point_interpolation,
               "INT": M.compute_per_class_ap_with_interpolation}
    prec, rec = M.compute_precision_and_recall(
        torch.from_numpy(output), torch.from_numpy(labels))
    for alg, h in handles.items():
        ours = classification_ap(output, labels, algorithm=alg)
        ref = np.asarray([float(h((prec[:, c], rec[:, c])))
                          for c in range(k)])
        np.testing.assert_allclose(ours, ref, atol=1e-10)


def test_detection_ap_meter_process_pool():
    """eval(num_workers>1) fans classes over a process pool and matches
    the in-process result (reference: meters.py:535-541 spawn Pool)."""
    from hoigen_tpu.eval import DetectionAPMeter
    rng = np.random.default_rng(0)
    n = 400
    scores = rng.random(n)
    classes = rng.integers(0, 6, n)
    labels = (rng.random(n) < 0.4).astype(np.float64)
    m1 = DetectionAPMeter(6, algorithm="11P")
    m2 = DetectionAPMeter(6, algorithm="11P")
    for m in (m1, m2):
        m.append(scores, classes, labels)
    np.testing.assert_allclose(m2.eval(num_workers=2), m1.eval())
