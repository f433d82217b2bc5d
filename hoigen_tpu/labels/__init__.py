"""Label & metadata tables for HICO-DET and V-COCO.

Tables are stored as JSON under ``hoigen_tpu/labels/data`` (extracted once by
``tools/extract_labels.py`` from the reference's data modules:
/root/reference/hico_list.py, hico_text_label.py, hico_label.py,
vcoco_list.py, HICO_utils.py) and exposed here as plain Python objects plus
derived lookup tables as numpy arrays.
"""
from .hico import HICO  # noqa: F401
from .vcoco import VCOCO_LABELS  # noqa: F401
