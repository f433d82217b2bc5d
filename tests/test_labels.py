"""Label-table sanity: cross-check derived lookups against the HICO-DET
annotation file's own correspondence table and internal invariants."""
import json
import os

import numpy as np
import pytest

from hoigen_tpu.labels import HICO, VCOCO_LABELS

REF_TEST_ANNO = "/root/reference/hicodet/instances_test2015.json"


def test_shapes():
    assert len(HICO.verb_object_list) == 600
    assert len(HICO.verbs) == 117
    assert len(HICO.objects) == 80
    assert len(HICO.verbs_sentence) == 117
    assert len(HICO.hoi_prompts) == 600
    assert HICO.hoi_to_object.shape == (600,)
    assert HICO.hoi_to_verb.shape == (600,)
    assert HICO.object_n_verb_to_interaction.shape == (80, 117)
    assert len(HICO.no_interaction_indexes) == 80


def test_zero_shot_splits():
    ui = HICO.unseen_index
    for k in ["rare_first", "non_rare_first", "unseen_verb", "unseen_object",
              "uc0", "uc1", "uc2", "uc3", "uc4"]:
        assert k in ui
    assert len(ui["rare_first"]) == 120
    assert len(ui["non_rare_first"]) == 120
    for k in ["uc0", "uc1", "uc2", "uc3", "uc4"]:
        assert len(ui[k]) == 120
    # unseen_verb classes must map to exactly 20 verbs
    uv_verbs = {int(HICO.hoi_to_verb[i]) for i in ui["unseen_verb"]}
    assert len(uv_verbs) == 20
    # unseen_object classes must cover whole objects
    uo_objs = {int(HICO.hoi_to_object[i]) for i in ui["unseen_object"]}
    for o in uo_objs:
        hois_of_o = {i for i in range(600) if HICO.hoi_to_object[i] == o}
        assert hois_of_o <= set(ui["unseen_object"])


@pytest.mark.skipif(not os.path.exists(REF_TEST_ANNO), reason="no reference anno")
def test_class_corr_matches_annotation_file():
    with open(REF_TEST_ANNO) as f:
        anno = json.load(f)
    corr = anno["correspondence"]  # [hoi, obj, verb]
    assert len(corr) == 600
    for i, j, k in corr:
        assert HICO.hoi_to_object[i] == j
        assert HICO.hoi_to_verb[i] == k
    assert anno["objects"] == HICO.objects
    # annotation file uses underscores in verb names; hico_list uses spaces
    assert [v.replace("_", " ") for v in anno["verbs"]] == \
        [v.replace("_", " ") for v in HICO.verbs]


def test_verb_object_list_consistent_with_hoi_maps():
    for i, (verb, obj) in enumerate(HICO.verb_object_list):
        assert HICO.verbs[HICO.hoi_to_verb[i]] == verb.replace("_", " ") or \
            HICO.verbs[HICO.hoi_to_verb[i]] == verb


def test_multihot_matrix():
    m = HICO.object_class_multihot(117)
    assert m.shape == (80, 117)
    # row sums equal number of valid verbs per object
    for o in range(80):
        assert m[o].sum() == len(HICO.object_to_verb[o])
    m600 = HICO.object_class_multihot(600)
    assert m600.sum() == 600


def test_obj_to_no_interaction():
    for o in range(80):
        hoi = int(HICO.obj_to_no_interaction[o])
        assert HICO.hoi_to_object[hoi] == o
        assert HICO.verb_object_list[hoi][0] in ("no_interaction", "no interaction")


def test_vcoco_tables():
    assert len(VCOCO_LABELS.keys) == 236
    assert len(VCOCO_LABELS.verbs_sentence) == 24
    assert VCOCO_LABELS.object_n_verb_to_interaction().shape == (81, 24)
    assert len(VCOCO_LABELS.hoi_text_label) == 236
    lut = VCOCO_LABELS.object_n_verb_to_interaction()
    for i, (v, o) in enumerate(VCOCO_LABELS.keys):
        assert lut[o, v] == i
    m = VCOCO_LABELS.object_class_multihot(24)
    assert m.sum() == 236


def test_detr_reserve_indices_matches_reference():
    """The 92->81 logit gather for COCO-pretrained V-COCO detectors must
    use exactly the reference's reserve_indices (upt_tip...py:575-581):
    the 91-slot COCO table's non-N/A entries + the no-object logit."""
    import ast
    import re
    src = open("/root/reference/"
               "upt_tip_cache_model_free_finetune_distill3.py").read()
    m = re.search(r"self\.COCO_CLASSES = (\[[^\]]*\])", src)
    names = ast.literal_eval(m.group(1))
    expected = [i for i, n in enumerate(names) if n != "N/A"] + [91]
    got = VCOCO_LABELS.detr_reserve_indices
    assert got == expected
    assert len(got) == 81 and got[0] == 1 and got[-1] == 91
