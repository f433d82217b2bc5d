"""Loader for the reference UPT module as a torch-CPU oracle.

torchvision is not installed in this environment, so the ops the reference
uses (box_iou / nms / batched_nms / roi_align) are provided here as
independent pure-torch implementations of the public torchvision semantics.
All reference imports that aren't needed at module level (detr.models,
clip.load machinery) are stubbed; label tables and detr.util.box_ops load
from the real files.
"""
import importlib.util
import math
import sys
import types

import torch

REF = "/root/reference"


# --------------------------------------------------------------------------
# pure-torch torchvision-ops oracle
# --------------------------------------------------------------------------
def box_area(b):
    return (b[:, 2] - b[:, 0]).clamp(min=0) * (b[:, 3] - b[:, 1]).clamp(min=0)


def box_iou(a, b):
    area_a, area_b = box_area(a), box_area(b)
    lt = torch.max(a[:, None, :2], b[None, :, :2])
    rb = torch.min(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def nms(boxes, scores, iou_threshold):
    order = torch.argsort(scores, descending=True, stable=True)
    keep = []
    suppressed = torch.zeros(len(boxes), dtype=torch.bool)
    iou = box_iou(boxes, boxes)
    for i in order.tolist():
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > iou_threshold
    return torch.as_tensor(keep, dtype=torch.long)


def batched_nms(boxes, scores, idxs, iou_threshold):
    if boxes.numel() == 0:
        return torch.empty(0, dtype=torch.long)
    # class-offset trick (torchvision's documented implementation)
    max_coord = boxes.max()
    offsets = idxs.to(boxes) * (max_coord + 1)
    return nms(boxes + offsets[:, None], scores, iou_threshold)


def _bilinear(feat, y, x):
    """feat (C, H, W); y/x flat sample coords with torchvision roi_align
    border semantics: points below -1 or above H/W contribute zero."""
    c, h, w = feat.shape
    invalid = (y < -1.0) | (y > h) | (x < -1.0) | (x > w)
    y = y.clamp(min=0.0)
    x = x.clamp(min=0.0)
    y_low = y.floor().long().clamp(max=h - 1)
    x_low = x.floor().long().clamp(max=w - 1)
    y_high = (y_low + 1).clamp(max=h - 1)
    x_high = (x_low + 1).clamp(max=w - 1)
    ly = (y - y_low.to(y)).clamp(0, 1)
    lx = (x - x_low.to(x)).clamp(0, 1)
    hy, hx = 1.0 - ly, 1.0 - lx
    f = feat.reshape(c, -1)

    def g(yy, xx):
        return f[:, (yy * w + xx).reshape(-1)]

    val = (g(y_low, x_low) * (hy * hx) + g(y_low, x_high) * (hy * lx)
           + g(y_high, x_low) * (ly * hx) + g(y_high, x_high) * (ly * lx))
    return val.masked_fill(invalid[None, :], 0.0)


def roi_align(input, boxes, output_size, spatial_scale=1.0,
              sampling_ratio=-1, aligned=False):
    """torchvision.ops.roi_align semantics, list-of-per-image-boxes form."""
    if isinstance(boxes, (list, tuple)):
        rois = torch.cat([
            torch.cat([torch.full((len(b), 1), i, dtype=b.dtype), b], dim=1)
            for i, b in enumerate(boxes)]) if len(boxes) else \
            torch.zeros(0, 5)
    else:
        rois = boxes
    ph, pw = output_size
    n = rois.shape[0]
    c = input.shape[1]
    out = torch.zeros(n, c, ph, pw, dtype=input.dtype)
    offset = 0.5 if aligned else 0.0
    for r in range(n):
        b_idx = int(rois[r, 0])
        x1, y1, x2, y2 = (rois[r, 1:] * spatial_scale).tolist()
        x1, y1, x2, y2 = x1 - offset, y1 - offset, x2 - offset, y2 - offset
        roi_w, roi_h = x2 - x1, y2 - y1
        if not aligned:
            roi_w, roi_h = max(roi_w, 1.0), max(roi_h, 1.0)
        bin_h, bin_w = roi_h / ph, roi_w / pw
        gy = sampling_ratio if sampling_ratio > 0 else \
            max(int(math.ceil(roi_h / ph)), 1)
        gx = sampling_ratio if sampling_ratio > 0 else \
            max(int(math.ceil(roi_w / pw)), 1)
        iy = torch.arange(ph).repeat_interleave(gy)
        sy = y1 + iy * bin_h + (torch.arange(gy).repeat(ph) + 0.5) \
            * bin_h / gy
        ix = torch.arange(pw).repeat_interleave(gx)
        sx = x1 + ix * bin_w + (torch.arange(gx).repeat(pw) + 0.5) \
            * bin_w / gx
        yy = sy[:, None].expand(ph * gy, pw * gx).reshape(-1)
        xx = sx[None, :].expand(ph * gy, pw * gx).reshape(-1)
        vals = _bilinear(input[b_idx], yy, xx)          # (C, ph*gy*pw*gx)
        vals = vals.reshape(c, ph, gy, pw, gx)
        out[r] = vals.mean(dim=(2, 4))
    return out


# --------------------------------------------------------------------------
# module loading
# --------------------------------------------------------------------------
def _file_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _install_stubs():
    from hoigen_tpu.models.clip.tokenizer import SimpleTokenizer, tokenize

    # no GPU in this environment: the reference sprinkles .cuda() on
    # tensors/modules along the paths under test — make them identity
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    tv = types.ModuleType("torchvision")
    tv_ops = types.ModuleType("torchvision.ops")
    tv_boxes = types.ModuleType("torchvision.ops.boxes")
    for m in (tv_ops, tv_boxes):
        m.box_area = box_area
        m.box_iou = box_iou
        m.nms = nms
        m.batched_nms = batched_nms
    tv_ops.boxes = tv_boxes
    tv_ops.roi_align = roi_align
    tv.ops = tv_ops

    clip_stub = types.ModuleType("clip")
    clip_stub.tokenize = lambda texts, context_length=77: torch.as_tensor(
        tokenize(texts, context_length)).long()

    clip_pkg = types.ModuleType("CLIP")
    clip_pkg.__path__ = []
    clip_clip = types.ModuleType("CLIP.clip")
    clip_clip.__path__ = []
    st = types.ModuleType("CLIP.clip.simple_tokenizer")
    st.SimpleTokenizer = SimpleTokenizer   # parity-tested vs the reference

    tm = types.ModuleType("transformer_module")
    tm.TransformerDecoderLayer = object
    tm.TransformerDecoderLayer_womhsa = object
    pkg_res = types.ModuleType("pkg_resources")
    import packaging
    import packaging.version  # noqa: F401
    pkg_res.packaging = packaging

    detr_pkg = types.ModuleType("detr")
    detr_pkg.__path__ = []
    detr_models = types.ModuleType("detr.models")
    detr_models.build_model = None          # only used by build_detector
    detr_util = types.ModuleType("detr.util")
    detr_util.__path__ = []
    detr_misc = types.ModuleType("detr.util.misc")

    class NestedTensor:
        def __init__(self, tensors, mask):
            self.tensors, self.mask = tensors, mask

        def decompose(self):
            return self.tensors, self.mask

    def nested_tensor_from_tensor_list(tensor_list):
        hs = [t.shape[-2] for t in tensor_list]
        ws = [t.shape[-1] for t in tensor_list]
        h, w = max(hs), max(ws)
        b = len(tensor_list)
        c = tensor_list[0].shape[0]
        out = torch.zeros(b, c, h, w, dtype=tensor_list[0].dtype)
        mask = torch.ones(b, h, w, dtype=torch.bool)
        for i, t in enumerate(tensor_list):
            out[i, :, :t.shape[1], :t.shape[2]] = t
            mask[i, :t.shape[1], :t.shape[2]] = False
        return NestedTensor(out, mask)

    detr_misc.NestedTensor = NestedTensor
    detr_misc.nested_tensor_from_tensor_list = nested_tensor_from_tensor_list

    stubs = {
        "torchvision": tv, "torchvision.ops": tv_ops,
        "torchvision.ops.boxes": tv_boxes,
        "clip": clip_stub, "CLIP": clip_pkg, "CLIP.clip": clip_clip,
        "CLIP.clip.simple_tokenizer": st,
        "transformer_module": tm, "pkg_resources": pkg_res,
        "detr": detr_pkg, "detr.models": detr_models,
        "detr.util": detr_util, "detr.util.misc": detr_misc,
    }
    sys.modules.update(stubs)

    box_ops = _file_module("detr.util.box_ops", f"{REF}/detr/util/box_ops.py")
    detr_util.box_ops = box_ops
    util_pkg = types.ModuleType("util")
    util_pkg.__path__ = []
    util_pkg.box_ops = box_ops
    sys.modules["util"] = util_pkg
    sys.modules["util.box_ops"] = box_ops

    for name in ("hico_list", "vcoco_list", "hico_text_label"):
        if name not in sys.modules:
            _file_module(name, f"{REF}/{name}.py")
    if "ops" not in sys.modules or not hasattr(
            sys.modules.get("ops"), "binary_focal_loss_with_logits"):
        _file_module("ops", f"{REF}/ops.py")
    if "CLIP_models_adapter_prior2" not in sys.modules:
        _file_module("CLIP_models_adapter_prior2",
                     f"{REF}/CLIP_models_adapter_prior2.py")


_CACHE = {}


def load_ref_upt():
    """Returns the reference upt_tip_cache_model_free_finetune_distill3
    module, loading it (and its stub environment) once per process."""
    if "mod" not in _CACHE:
        _install_stubs()
        _CACHE["mod"] = _file_module(
            "ref_upt_module",
            f"{REF}/upt_tip_cache_model_free_finetune_distill3.py")
    return _CACHE["mod"]
