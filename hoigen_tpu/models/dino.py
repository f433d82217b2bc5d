"""DINO ResNet-50 global image features.

The reference loads dino_resnet50_pretrain.pth into a torchvision resnet50
with fc=Identity, eval mode (/root/reference/main_tip_finetune.py:404-411),
producing 2048-d global features of the CLIP-stream images. Architecture is
identical to the DETR backbone, so we reuse it (BN folded with running
stats) and add the global average pool.
"""
import jax.numpy as jnp
import numpy as np

from .detr.resnet import (LAYER_BLOCKS, fold_bn, init_resnet50_params,
                          resnet50_forward_nhwc)


def dino_forward(params, images, fused_tail=(), nchw=False):
    """images (B, 3, H, W) -> (B, 2048) global features.

    ``fused_tail`` opts layer tails into the Pallas bottleneck-chain kernel
    (ops/fused_resnet.py) like the DETR tower; stays OFF — the DETR-tail
    full-graph A/B showed the custom call is a net loss even at the 4x
    larger plane (models/detr/config.py). ``nchw`` runs the round-2 layout
    (perf-experiment knob, math-identical)."""
    import jax.numpy as jnp
    if nchw:
        from .detr.resnet import resnet50_forward
        return resnet50_forward(params, images).mean(axis=(2, 3))
    feat = resnet50_forward_nhwc(params, jnp.transpose(images, (0, 2, 3, 1)),
                                 fused_tail=fused_tail)
    return feat.mean(axis=(1, 2))


init_dino_params = init_resnet50_params


def torch_dino_state_dict_to_params(sd):
    """torchvision resnet50 state dict (keys conv1/bn1/layerX.Y...) ->
    folded params. Accepts DINO checkpoints after the reference's
    load_pretrained_weights key cleanup (dino/utils.py:53)."""
    def _np(t):
        return t if isinstance(t, np.ndarray) \
            else t.detach().cpu().float().numpy()

    def conv_bn(conv, bn):
        return fold_bn(_np(sd[conv + ".weight"]), _np(sd[bn + ".weight"]),
                       _np(sd[bn + ".bias"]), _np(sd[bn + ".running_mean"]),
                       _np(sd[bn + ".running_var"]))

    params = {"stem": conv_bn("conv1", "bn1"), "layers": []}
    for li, n in enumerate(LAYER_BLOCKS):
        blocks = []
        for bi in range(n):
            p = f"layer{li + 1}.{bi}"
            blk = {f"conv{k}": conv_bn(f"{p}.conv{k}", f"{p}.bn{k}")
                   for k in (1, 2, 3)}
            if f"{p}.downsample.0.weight" in sd:
                blk["down"] = conv_bn(f"{p}.downsample.0", f"{p}.downsample.1")
            blocks.append(blk)
        params["layers"].append(blocks)
    return params
