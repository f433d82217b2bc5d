from .hoi_model import HOIModelConfig, init_hoi_model, make_eval_step, \
    make_train_step  # noqa: F401
from .partition import split_params, merge_params, clip_trainable  # noqa: F401
