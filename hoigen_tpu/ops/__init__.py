from .boxes import (box_cxcywh_to_xyxy, box_xyxy_to_cxcywh, box_iou,
                    box_area, union_boxes, recover_boxes)  # noqa: F401
from .focal import binary_focal_loss_with_logits, prior_modulated_logits  # noqa: F401
from .spatial import compute_spatial_encodings  # noqa: F401
from .masks import generate_masks  # noqa: F401
from .nms import batched_nms_mask  # noqa: F401
from .roi_align import roi_align, roi_align_mean  # noqa: F401
