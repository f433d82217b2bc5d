from .tokenizer import SimpleTokenizer, tokenize  # noqa: F401
from .config import CLIPConfig, VIT_B16  # noqa: F401
from .model import (init_clip_params, encode_image, encode_text,
                    text_encoder_forward)  # noqa: F401
from .convert import torch_state_dict_to_params  # noqa: F401
from .resnet import (init_modified_resnet_params,
                     modified_resnet_forward)  # noqa: F401
