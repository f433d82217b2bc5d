"""DETR architecture configuration (defaults = DETR-R50 as used by the HOI
pipeline: /root/reference/main_tip_finetune.py argparse detr flags)."""
import dataclasses


@dataclasses.dataclass(frozen=True)
class DETRConfig:
    num_classes: int = 81        # 80 + no-object for the HICO-DET checkpoint
    hidden_dim: int = 256
    nheads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 2048
    num_queries: int = 100
    backbone_dim: int = 2048     # ResNet-50 C5
    dropout: float = 0.1
    # fuse encoder self-attention into a Pallas kernel (scores never touch
    # HBM); auto-falls back to XLA off-TPU. Inference-only (no VJP) — the
    # offline DETR finetune (cli/train_detr.py) keeps it off to
    # differentiate. Measured on v5e at the eval bucket (B16,H8,L1050,D32):
    # 1.8ms/layer vs 2.7ms for XLA's fusion, after blocking over all heads
    # at once to keep DMAs contiguous (see ops/attention.py docstring).
    fused_encoder_attention: bool = True
    # residual layers whose stride-1 tail blocks run the Pallas fused
    # bottleneck-chain kernel (ops/fused_resnet.py). Layer1's wide
    # (C=256 at stride 4) activation makes XLA's 3-passes-per-block
    # pattern most expensive there: measured 16.8 -> 11.4 ms STANDALONE at
    # the eval bucket; layer2 is at parity, layers 3-4 MXU-bound. In the
    # FULL eval graph the round-3 A/B measured a net loss (255.7 vs 262.3
    # img/s b16), but the round-5 re-measure at HEAD flipped it: (0,) WINS
    # 281.1 vs 279.3 img/s at b32 and 275.6 vs 271.5 at b16
    # (tools/bench_ab_fused.py --mode tail, medians of 4-5 chains), while
    # (0, 1) loses (276.3 b32) — layer2 stays unfused. Production default
    # is therefore (0,). Inference/frozen-backbone only (no VJP) — gated
    # on TPU + bf16 + not remat_backbone (detr/model.py:165-167), and
    # cli/train_detr.py (which differentiates the backbone) clears it.
    fused_resnet_tail: tuple = (0,)
    # run the ResNet towers in NCHW (the round-2 layout) instead of NHWC —
    # a perf-experiment knob for full-graph layout A/Bs
    # (tools/bench_ab_fused.py --mode layout); math-identical.
    nchw_backbone: bool = False
    # rematerialize backbone blocks in backward (jax.checkpoint) — the
    # offline DETR finetune needs it to fit full-backbone training in HBM
    # at the large buckets; the HOI pipeline runs the backbone frozen and
    # leaves it off
    remat_backbone: bool = False
