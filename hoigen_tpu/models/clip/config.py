"""CLIP architecture configuration."""
import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    image_resolution: int = 224
    vision_layers: int = 12
    vision_width: int = 768
    vision_patch_size: int = 16
    # ModifiedResNet visual tower: per-stage block counts; None = ViT
    # (build_model dispatches on `visual.proj` presence,
    # CLIP_models_adapter_prior2.py:934-945). For RN variants
    # vision_width is the stem width (64 for RN50) and vision_patch_size
    # is fixed at 32 (the tower's total stride) so grid_size holds.
    rn_layers: Optional[Tuple[int, int, int, int]] = None
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12
    # instance-adapter settings (CLIP_models_adapter_prior2.py:423-459,934-967)
    use_adapter: bool = True
    adapter_layers: Tuple[int, ...] = tuple(range(12))
    adapter_num_layers: int = 1
    adapter_bottleneck: int = 64
    adapter_heads: int = 2
    adapter_dropout: float = 0.1
    # route the ViT blocks' self-attention through the Pallas fused kernel
    # (ops/attention.py — differentiable, so the trained-adapter path may
    # use it too); falls back to identical XLA math off-TPU
    fused_attention: bool = True

    @property
    def is_resnet(self) -> bool:
        return self.rn_layers is not None

    @property
    def vision_heads(self) -> int:
        # RN: heads over the attnpool embed dim = width*32 (:693-694)
        if self.is_resnet:
            return self.vision_width * 32 // 64
        return self.vision_width // 64

    @property
    def grid_size(self) -> int:
        return self.image_resolution // self.vision_patch_size

    @staticmethod
    def adapter_layer_ids(adapter_pos: str, vision_layers: int, rng=None):
        """'all' | 'front' | 'end' | 'last' | 'random' -> layer index tuple
        (CLIP_models_adapter_prior2.py:958-967)."""
        if adapter_pos == "all":
            return tuple(range(vision_layers))
        if adapter_pos == "front":
            return tuple(range(vision_layers // 2))
        if adapter_pos == "end":
            return tuple(range(vision_layers // 2, vision_layers))
        if adapter_pos == "last":
            return (vision_layers - 1,)
        if adapter_pos == "random":
            import random as _random
            r = rng or _random
            return tuple(r.randint(0, vision_layers - 1)
                         for _ in range(vision_layers // 2))
        raise ValueError(adapter_pos)


VIT_B16 = CLIPConfig()
