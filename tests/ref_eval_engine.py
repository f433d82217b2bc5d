"""Loader for the reference EVAL pipeline as a torch-CPU oracle.

Loads the REAL reference composition — ``DataFactory`` + ``CustomisedDLE``
(``/root/reference/utils_tip_cache_and_union_finetune.py``) over the real
``pocket`` meters/association/engine files, the real ``hicodet``/``vcoco``
dataset classes and the real ``detr.datasets.transforms_clip`` transform
chain — with only environment shims:

  * ``torchvision.transforms[.functional]``: PIL-backed resize/crop/hflip/
    pad/to_tensor/normalize with torchvision's public semantics (the only
    functions the eval transform chain touches);
  * ``clip.load``: returns a null preprocess (unused on the eval path);
  * a single-process gloo ``torch.distributed`` group plus no-op
    ``torch.cuda.set_device`` and a pass-through DDP wrapper so
    ``DistributedLearningEngine.__init__`` runs on CPU.

Everything on the measured path (``__getitem__`` transforms, ``test_hico``,
``BoxPairAssociation``, ``DetectionAPMeter``) is reference code, untouched.
"""
import os
import sys
import types

import numpy as np
import torch
from PIL import Image

from ref_upt import REF, _file_module, load_ref_upt


# --------------------------------------------------------------------------
# torchvision.transforms[.functional] shim (public torchvision semantics)
# --------------------------------------------------------------------------
def _tv_functional():
    F = types.ModuleType("torchvision.transforms.functional")

    def to_tensor(pic):
        arr = np.asarray(pic)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        t = torch.from_numpy(arr.transpose(2, 0, 1).copy())
        return t.float().div(255.0) if t.dtype == torch.uint8 else t.float()

    def resize(img, size, interpolation=Image.BILINEAR):
        if isinstance(size, int):
            w, h = img.size
            if w < h:
                ow, oh = size, max(int(round(size * h / w)), 1)
            else:
                oh, ow = size, max(int(round(size * w / h)), 1)
        else:
            oh, ow = size
        return img.resize((int(ow), int(oh)), interpolation)

    def crop(img, top, left, height, width):
        return img.crop((left, top, left + width, top + height))

    def hflip(img):
        return img.transpose(Image.FLIP_LEFT_RIGHT)

    def pad(img, padding):
        left, top, right, bottom = padding
        w, h = img.size
        out = Image.new(img.mode, (w + left + right, h + top + bottom))
        out.paste(img, (left, top))
        return out

    def normalize(tensor, mean, std, inplace=False):
        mean = torch.as_tensor(mean, dtype=tensor.dtype)[:, None, None]
        std = torch.as_tensor(std, dtype=tensor.dtype)[:, None, None]
        return (tensor - mean) / std

    F.to_tensor, F.resize, F.crop = to_tensor, resize, crop
    F.hflip, F.pad, F.normalize = hflip, pad, normalize
    return F


def _pkg(name):
    m = types.ModuleType(name)
    m.__path__ = []
    sys.modules[name] = m
    return m


def _sub(name, path, into, attrs):
    mod = _file_module(name, path)
    setattr(into, name.rsplit(".", 1)[1], mod)
    for a in attrs:
        setattr(into, a, getattr(mod, a))
    return mod


def load_ref_pipeline():
    """Returns the reference utils_tip_cache_and_union_finetune module,
    installing its (real-file) dependency tree once per process."""
    if "ref_pipeline" in sys.modules:
        return sys.modules["ref_pipeline"]
    load_ref_upt()    # base stubs: torchvision.ops, clip.tokenize, labels

    tv = sys.modules["torchvision"]
    tvt = types.ModuleType("torchvision.transforms")
    F = _tv_functional()
    tvt.functional = F

    class _Null:
        def __init__(self, *a, **k):
            pass

    class RandomCrop:
        @staticmethod
        def get_params(img, output_size):
            import random as _r
            h, w = output_size
            iw, ih = img.size
            top = _r.randint(0, ih - h)
            left = _r.randint(0, iw - w)
            return top, left, h, w

    tvt.Resize, tvt.CenterCrop, tvt.RandomCrop = _Null, _Null, RandomCrop
    tv.transforms = tvt
    sys.modules["torchvision.transforms"] = tvt
    sys.modules["torchvision.transforms.functional"] = F

    um = types.ModuleType("util.misc")
    um.interpolate = torch.nn.functional.interpolate
    sys.modules["util.misc"] = um
    sys.modules["util"].misc = um

    dd = _pkg("detr.datasets")
    sys.modules["detr"].datasets = dd
    _sub("detr.datasets.transforms_clip",
         f"{REF}/detr/datasets/transforms_clip.py", dd, [])

    pocket = _pkg("pocket")
    p_ops, p_utils = _pkg("pocket.ops"), _pkg("pocket.utils")
    p_data, p_core = _pkg("pocket.data"), _pkg("pocket.core")
    pocket.ops, pocket.utils = p_ops, p_utils
    pocket.data, pocket.core = p_data, p_core
    P = f"{REF}/pocket/pocket"
    _sub("pocket.ops.relocate", f"{P}/ops/relocate.py", p_ops,
         ["relocate_to_cuda", "relocate_to_cpu", "relocate_to_device"])
    _sub("pocket.ops.transforms", f"{P}/ops/transforms.py", p_ops,
         ["to_tensor", "ToTensor"])
    _sub("pocket.ops.boxes", f"{P}/ops/boxes.py", p_ops, ["box_iou"])
    _sub("pocket.data.base", f"{P}/data/base.py", p_data,
         ["ImageDataset", "DataSubset", "DataDict"])
    _sub("pocket.utils.meters", f"{P}/utils/meters.py", p_utils,
         ["NumericalMeter", "AveragePrecisionMeter", "DetectionAPMeter"])
    _sub("pocket.utils.association", f"{P}/utils/association.py", p_utils,
         ["BoxPairAssociation"])
    _sub("pocket.utils.distributed", f"{P}/utils/distributed.py", p_utils,
         ["SyncedNumericalMeter"])
    _sub("pocket.core.engines", f"{P}/core/engines.py", p_core, ["State"])
    _sub("pocket.core.distributed", f"{P}/core/distributed.py", p_core,
         ["DistributedLearningEngine"])

    hic = _pkg("hicodet")
    _sub("hicodet.hicodet", f"{REF}/hicodet/hicodet.py", hic, ["HICODet"])
    vc = _pkg("vcoco")
    _sub("vcoco.vcoco", f"{REF}/vcoco/vcoco.py", vc, ["VCOCO"])

    sys.modules["clip"].load = lambda *a, **k: (None, None)

    return _file_module("ref_pipeline",
                        f"{REF}/utils_tip_cache_and_union_finetune.py")


# --------------------------------------------------------------------------
# engine construction on CPU
# --------------------------------------------------------------------------
class _CpuDDP(torch.nn.Module):
    """Pass-through stand-in for DistributedDataParallel: test_hico only
    needs ``net.module`` and a forwarding ``__call__``."""

    def __init__(self, module, **kwargs):
        super().__init__()
        self.module = module

    def forward(self, *args, **kwargs):
        return self.module(*args, **kwargs)


def make_engine(ref_pipe, net, dataloader, tmp_dir, **kwargs):
    """Build the real CustomisedDLE on CPU (single-process gloo group,
    no-op cuda set_device, pass-through DDP)."""
    import torch.distributed as dist
    if not dist.is_initialized():
        dist.init_process_group(
            "gloo", init_method=f"file://{tmp_dir}/dist_init",
            rank=0, world_size=1)
    orig_set_device = torch.cuda.set_device
    orig_ddp = torch.nn.parallel.DistributedDataParallel
    torch.cuda.set_device = lambda *a, **k: None
    torch.nn.parallel.DistributedDataParallel = _CpuDDP
    try:
        return ref_pipe.CustomisedDLE(
            net, dataloader, use_amp=False, device="cpu",
            cache_dir=os.path.join(tmp_dir, "engine_ckpt"), **kwargs)
    finally:
        torch.cuda.set_device = orig_set_device
        torch.nn.parallel.DistributedDataParallel = orig_ddp
