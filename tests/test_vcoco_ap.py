"""In-repo V-COCO role/agent AP (eval/vcoco_ap.py) — semantics of the
official vsrl_eval algorithm the reference defers to
(main_tip_finetune.py:912 raises; we evaluate)."""
import numpy as np

from hoigen_tpu.eval.vcoco_ap import agent_ap, role_ap

ACTIONS = ["hold obj", "cut instr", "cut obj"]


def _entry(image_id, person, key, role_box, score, agent=None):
    r = {"image_id": image_id, "person_box": list(person), key:
         list(role_box) + [score]}
    r[key.split("_")[0] + "_agent"] = score if agent is None else agent
    return r


def _gt(boxes_h, boxes_o, actions):
    return {"boxes_h": np.asarray(boxes_h, np.float64),
            "boxes_o": np.asarray(boxes_o, np.float64),
            "actions": np.asarray(actions, np.int64)}


def test_perfect_detections_ap_one():
    gt = {7: _gt([[0, 0, 10, 10], [20, 20, 40, 40]],
                 [[5, 5, 15, 15], [30, 30, 50, 50]], [0, 2])}
    results = [
        _entry(7, [0, 0, 10, 10], "hold_obj", [5, 5, 15, 15], 0.9),
        _entry(7, [20, 20, 40, 40], "cut_obj", [30, 30, 50, 50], 0.8),
    ]
    for s in (1, 2):
        r = role_ap(results, gt, ACTIONS, scenario=s)
        assert r["hold obj"] == 1.0 and r["cut obj"] == 1.0
        assert r["mean"] == 1.0          # classes with npos=0 excluded
    a = agent_ap(results, gt, ACTIONS)
    assert a["hold obj"] == 1.0 and a["cut obj"] == 1.0 and a["mean"] == 1.0


def test_wrong_role_box_fails_role_but_not_agent():
    gt = {3: _gt([[0, 0, 10, 10]], [[50, 50, 60, 60]], [0])}
    results = [_entry(3, [0, 0, 10, 10], "hold_obj", [0, 0, 5, 5], 0.9)]
    assert role_ap(results, gt, ACTIONS, 1)["hold obj"] == 0.0
    assert agent_ap(results, gt, ACTIONS)["hold obj"] == 1.0


def test_nan_gt_role_scenarios():
    nan4 = [np.nan] * 4
    gt = {3: _gt([[0, 0, 10, 10]], [nan4], [0])}
    zero_role = [_entry(3, [0, 0, 10, 10], "hold_obj", [0, 0, 0, 0], 0.9)]
    some_role = [_entry(3, [0, 0, 10, 10], "hold_obj", [1, 1, 5, 5], 0.9)]
    # scenario 1: agent must report "no object" (all-zero box)
    assert role_ap(zero_role, gt, ACTIONS, 1)["hold obj"] == 1.0
    assert role_ap(some_role, gt, ACTIONS, 1)["hold obj"] == 0.0
    # scenario 2: role prediction ignored when GT role is absent
    assert role_ap(zero_role, gt, ACTIONS, 2)["hold obj"] == 1.0
    assert role_ap(some_role, gt, ACTIONS, 2)["hold obj"] == 1.0


def test_greedy_coverage_and_ranking():
    gt = {1: _gt([[0, 0, 10, 10]], [[5, 5, 15, 15]], [0])}
    # higher-scored detection misses (person IoU < 0.5), lower one hits:
    # ranked P/R = [0, 1/2] -> AP 0.5
    results = [
        _entry(1, [100, 100, 110, 110], "hold_obj", [5, 5, 15, 15], 0.9),
        _entry(1, [0, 0, 10, 10], "hold_obj", [5, 5, 15, 15], 0.8),
    ]
    assert role_ap(results, gt, ACTIONS, 1)["hold obj"] == 0.5
    # duplicate on an already-covered GT is a false positive but after the
    # TP: recall hits 1 at rank 1 -> AP stays 1
    dup = [
        _entry(1, [0, 0, 10, 10], "hold_obj", [5, 5, 15, 15], 0.9),
        _entry(1, [0, 0, 10, 10], "hold_obj", [5, 5, 15, 15], 0.8),
    ]
    assert role_ap(dup, gt, ACTIONS, 1)["hold obj"] == 1.0


def test_agent_key_disambiguation():
    # cut_instr and cut_obj share cut_agent; each entry carries its own
    # class's role key, which scopes the agent evaluation per class
    gt = {2: _gt([[0, 0, 10, 10], [20, 20, 30, 30]],
                 [[5, 5, 15, 15], [25, 25, 35, 35]], [1, 2])}
    results = [
        _entry(2, [0, 0, 10, 10], "cut_instr", [5, 5, 15, 15], 0.9),
        _entry(2, [20, 20, 30, 30], "cut_obj", [25, 25, 35, 35], 0.8),
    ]
    a = agent_ap(results, gt, ACTIONS)
    assert a["cut instr"] == 1.0 and a["cut obj"] == 1.0


def test_evaluate_vcoco_results_on_dataset(tmp_path):
    import json

    from hoigen_tpu.data.vcoco import VCOCODataset
    from hoigen_tpu.eval.vcoco_ap import evaluate_vcoco_results

    actions = [f"verb{i} obj" for i in range(24)]
    annos, images = [], []
    for i in range(3):
        annos.append({"boxes_h": [[5, 5, 40, 60]],
                      "boxes_o": [[30, 10, 90, 70]],
                      "actions": [i], "objects": [1],
                      "file_name": f"COCO_val2014_{i:012d}.jpg"})
        images.append(1000 + i)
    inst = {"annotations": annos, "classes": actions,
            "objects": ["background"] + [f"o{i}" for i in range(80)],
            "images": images,
            "action_to_object": [[1] for _ in range(24)]}
    p = tmp_path / "instances_vcoco_test.json"
    p.write_text(json.dumps(inst))
    ds = VCOCODataset(str(p))
    results = [_entry(1000 + i, [5, 5, 40, 60], f"verb{i}_obj",
                      [30, 10, 90, 70], 0.9) for i in range(3)]
    rep = evaluate_vcoco_results(results, ds)
    assert rep["role_ap_scenario_1"]["mean"] == 1.0
    assert rep["role_ap_scenario_2"]["mean"] == 1.0
    assert rep["agent_ap"]["mean"] == 1.0
