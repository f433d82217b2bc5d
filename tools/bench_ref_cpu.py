"""Measure the PyTorch reference's eval-step cost on THIS host's CPU.

bench.py's ``vs_baseline`` divides our TPU throughput by an assumed
reference speed (the repo publishes none — BASELINE.md). VERDICT r2 asked
for a measured anchor instead of a bare assumption, so this times the
reference's own components at the real eval dims, batch 1 (the reference
evaluates with ``batch_size=1``, /root/reference/main_tip_finetune.py:383-385):

  * DETR-R50: torchvision resnet50 (the reference backbone,
    detr/models/backbone.py) at 800x1344 + the reference detr Transformer
    (6+6, d=256) over the 25x42 memory with 100 queries
  * adapter-CLIP ViT-B/16 visual at 224 (CLIP_models_adapter_prior2.py
    build path) — fabricated full-size weights, same architecture
  * DINO resnet50 at 224

Prints one JSON line with per-component seconds/img and the implied
single-stream images/sec on this host. Run it alone (1-core box).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, reps=3):
    fn()                      # warm-up / lazy init
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def main():
    import numpy as np
    import torch
    torch.set_grad_enabled(False)
    torch.set_num_threads(max(1, torch.get_num_threads()))

    out = {}

    # ---- DETR-R50 backbone + transformer ---------------------------------
    # (torchvision is absent in this image; _resnet50() below is the
    # standard architecture the reference backbone wraps)
    r50 = _resnet50()
    r50.eval()
    x = torch.randn(1, 3, 800, 1344)
    out["detr_r50_s"] = timeit(lambda: r50(x))

    import importlib.util as ilu
    spec = ilu.spec_from_file_location(
        "ref_detr_transformer", "/root/reference/detr/models/transformer.py")
    trmod = ilu.module_from_spec(spec)
    spec.loader.exec_module(trmod)
    tr = trmod.Transformer(d_model=256, nhead=8, num_encoder_layers=6,
                           num_decoder_layers=6, dim_feedforward=2048,
                           return_intermediate_dec=True).eval()
    src = torch.randn(1, 256, 25, 42)
    mask = torch.zeros(1, 25, 42, dtype=torch.bool)
    query = torch.randn(100, 256)
    pos = torch.randn(1, 256, 25, 42)
    out["detr_transformer_s"] = timeit(lambda: tr(src, mask, query, pos))

    # ---- adapter-CLIP ViT-B/16 visual at 224 -----------------------------
    sys.path.insert(0, "/root/repo/tests")
    from ref_upt import load_ref_upt
    load_ref_upt()                      # installs CLIP stubs
    import CLIP_models_adapter_prior2 as ref_clip
    sd = _vit_b16_state_dict()
    clip_model = ref_clip.build_model(sd, use_adapter=True,
                                      adapter_pos="all",
                                      adapter_num_layers=1).float().eval()
    img = torch.randn(1, 3, 224, 224)
    prior = (torch.randn(1, 18, 64), torch.zeros(1, 18, dtype=torch.bool))
    out["clip_vit_s"] = timeit(lambda: clip_model.visual(img, prior))

    # ---- DINO R50 at 224 -------------------------------------------------
    dino = _resnet50()
    dino.eval()
    img224 = torch.randn(1, 3, 224, 224)
    out["dino_r50_s"] = timeit(lambda: dino(img224))

    total = sum(out.values())
    out = {k: round(v, 4) for k, v in out.items()}
    out["total_s_per_img"] = round(total, 4)
    out["ref_cpu_images_per_sec"] = round(1.0 / total, 4)
    out["threads"] = torch.get_num_threads()
    print(json.dumps(out))


def _resnet50():
    """Standard torch ResNet-50 trunk (stem + 4 bottleneck stages +
    avgpool), matching the compute of the reference's torchvision
    backbone for timing purposes."""
    import torch
    from torch import nn

    class Bottleneck(nn.Module):
        def __init__(self, cin, mid, stride):
            super().__init__()
            cout = mid * 4
            self.c1 = nn.Conv2d(cin, mid, 1, bias=False)
            self.b1 = nn.BatchNorm2d(mid)
            self.c2 = nn.Conv2d(mid, mid, 3, stride, 1, bias=False)
            self.b2 = nn.BatchNorm2d(mid)
            self.c3 = nn.Conv2d(mid, cout, 1, bias=False)
            self.b3 = nn.BatchNorm2d(cout)
            self.down = None
            if stride != 1 or cin != cout:
                self.down = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout))
            self.relu = nn.ReLU(inplace=True)

        def forward(self, x):
            idt = x if self.down is None else self.down(x)
            y = self.relu(self.b1(self.c1(x)))
            y = self.relu(self.b2(self.c2(y)))
            return self.relu(self.b3(self.c3(y)) + idt)

    layers = []
    cin = 64
    for li, (mid, n) in enumerate(((64, 3), (128, 4), (256, 6), (512, 3))):
        for bi in range(n):
            stride = 2 if (li > 0 and bi == 0) else 1
            layers.append(Bottleneck(cin, mid, stride))
            cin = mid * 4
    import torch.nn as nn
    return nn.Sequential(
        nn.Conv2d(3, 64, 7, 2, 3, bias=False), nn.BatchNorm2d(64),
        nn.ReLU(inplace=True), nn.MaxPool2d(3, 2, 1), *layers,
        nn.AdaptiveAvgPool2d(1))


def _vit_b16_state_dict():
    """Random ViT-B/16 CLIP state dict (architecture metadata only —
    throughput does not depend on values)."""
    import torch
    width, layers, heads, out_dim, res, patch = 768, 12, 12, 512, 224, 16
    sd = {
        "visual.conv1.weight": torch.randn(width, 3, patch, patch),
        "visual.class_embedding": torch.randn(width),
        "visual.positional_embedding": torch.randn(
            (res // patch) ** 2 + 1, width),
        "visual.ln_pre.weight": torch.ones(width),
        "visual.ln_pre.bias": torch.zeros(width),
        "visual.ln_post.weight": torch.ones(width),
        "visual.ln_post.bias": torch.zeros(width),
        "visual.proj": torch.randn(width, out_dim),
        "text_projection": torch.randn(512, out_dim),
        "logit_scale": torch.ones(()),
        "token_embedding.weight": torch.randn(49408, 512),
        "positional_embedding": torch.randn(77, 512),
        "ln_final.weight": torch.ones(512),
        "ln_final.bias": torch.zeros(512),
    }
    for pre, w, n in (("visual.transformer", width, layers),
                      ("transformer", 512, 12)):
        for i in range(n):
            p = f"{pre}.resblocks.{i}"
            sd.update({
                f"{p}.attn.in_proj_weight": torch.randn(3 * w, w),
                f"{p}.attn.in_proj_bias": torch.zeros(3 * w),
                f"{p}.attn.out_proj.weight": torch.randn(w, w),
                f"{p}.attn.out_proj.bias": torch.zeros(w),
                f"{p}.ln_1.weight": torch.ones(w),
                f"{p}.ln_1.bias": torch.zeros(w),
                f"{p}.ln_2.weight": torch.ones(w),
                f"{p}.ln_2.bias": torch.zeros(w),
                f"{p}.mlp.c_fc.weight": torch.randn(4 * w, w),
                f"{p}.mlp.c_fc.bias": torch.zeros(4 * w),
                f"{p}.mlp.c_proj.weight": torch.randn(w, 4 * w),
                f"{p}.mlp.c_proj.bias": torch.zeros(w),
            })
    return sd


if __name__ == "__main__":
    main()
