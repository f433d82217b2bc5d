"""V-COCO dataset reader over instances_vcoco_{partition}.json
(schema as /root/reference/vcoco/vcoco.py:33-204: annotations/classes/
objects/images/action_to_object; images without pairs are dropped)."""
import json
import os
from typing import List, Optional

import numpy as np


class VCOCODataset:
    num_action_cls = 24

    def __init__(self, anno_file: str, root: Optional[str] = None):
        self.root = root
        self.anno_file = anno_file
        with open(anno_file) as f:
            f_ = json.load(f)
        self._anno = f_["annotations"]
        self._actions = f_["classes"]
        self._objects = f_["objects"]
        self._image_ids = f_["images"]
        self._action_to_object = f_["action_to_object"]
        keep, num_instances = [], [0] * len(self._actions)
        for i, anno in enumerate(self._anno):
            if len(anno["actions"]) == 0:
                continue
            keep.append(i)
            for act in anno["actions"]:
                num_instances[act] += 1
        self._keep = keep
        self._num_instances = num_instances

    def __len__(self):
        return len(self._keep)

    def filename(self, i: int) -> str:
        return self._anno[self._keep[i]]["file_name"]

    def image_id(self, i: int) -> int:
        return self._image_ids[self._keep[i]]

    def target(self, i: int) -> dict:
        anno = self._anno[self._keep[i]]
        return {
            "boxes_h": np.asarray(anno["boxes_h"], np.float32),
            "boxes_o": np.asarray(anno["boxes_o"], np.float32),
            "actions": np.asarray(anno["actions"], np.int32),
            "objects": np.asarray(anno["objects"], np.int32),
        }

    def load_image(self, i: int):
        from PIL import Image
        return Image.open(os.path.join(self.root,
                                       self.filename(i))).convert("RGB")

    @property
    def actions(self) -> List[str]:
        return list(self._actions)

    @property
    def objects(self) -> List[str]:
        return list(self._objects)

    @property
    def num_object_cls(self) -> int:
        return len(self._objects)

    @property
    def action_to_object(self):
        return [list(x) for x in self._action_to_object]

    @property
    def num_instances(self) -> List[int]:
        return list(self._num_instances)
