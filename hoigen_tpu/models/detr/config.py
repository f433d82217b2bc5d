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
