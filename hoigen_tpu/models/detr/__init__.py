from .config import DETRConfig  # noqa: F401
from .resnet import resnet50_forward, init_resnet50_params  # noqa: F401
from .model import (detr_forward, init_detr_params, sine_position_embedding,
                    postprocess, downsample_mask)  # noqa: F401
from .convert import torch_detr_state_dict_to_params  # noqa: F401
