#!/usr/bin/env python
"""Extract the HICO-DET / V-COCO label & metadata tables from the reference
repository's data modules into JSON files consumed by `hoigen_tpu.labels`.

These tables are dataset facts (600 interaction (verb, object) pairs, 117 verb
names, prompt texts, zero-shot index splits, ...) — identical by necessity to
the reference (`/root/reference/hico_list.py`, `hico_text_label.py`,
`hico_label.py`, `vcoco_list.py`, `HICO_utils.py`). We store them as JSON data
so the framework code carries no vendored Python tables.

Run once (requires the reference checkout):
    python tools/extract_labels.py [--reference /root/reference]
"""
import argparse
import ast
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
OUT_DIR = os.path.join(HERE, "..", "hoigen_tpu", "labels", "data")

# module -> variables to extract
TABLES = {
    "hico_list.py": [
        "hico_verb_object_list", "hico_verbs", "hico_objects",
        "hico_verbs_sentence", "hico_verbs_sentence_2",
    ],
    "hico_text_label.py": [
        "hico_text_label", "hico_obj_text_label", "hico_hum_text_label",
        "hico_unseen_index",
    ],
    "hico_label.py": [
        "rare_first_num", "nonrare_first_num", "all_classnames",
        "object_seen_name", "human_seen_name", "object_name", "human_name",
        "human_for_verb_name", "seen_classnames",
    ],
    "vcoco_list.py": [
        "vcoco_keys", "vcoco_seen_keys", "vcoco_seen_values", "vcoco_values",
        "object_seen_keys", "object_seen_values", "vcoco_object_name",
        "vcoco_verbs_sentence", "vcoco_human_name", "human_seen_values",
    ],
    "HICO_utils.py": [
        "rare_indexes", "HOI_IDX_TO_OBJ_IDX", "no_interaction_indexes",
        "obj_to_no_interaction", "HOI_IDX_TO_ACT_IDX",
    ],
}


def literal_env(path):
    """Evaluate only literal assignments of a module (no code execution)."""
    tree = ast.parse(open(path).read())
    env = {}
    for node in tree.body:
        if isinstance(node, ast.Assign) and isinstance(node.targets[0], ast.Name):
            value = node.value
            # unwrap torch.as_tensor(<literal>) wrappers
            if isinstance(value, ast.Call) and value.args:
                value = value.args[0]
            try:
                env[node.targets[0].id] = ast.literal_eval(value)
            except (ValueError, SyntaxError):
                pass  # non-literal assignment (e.g. computed); skip
    return env


def jsonable(obj):
    if isinstance(obj, dict):
        # JSON keys must be strings; tuple keys become "v,o" strings
        return {
            (",".join(map(str, k)) if isinstance(k, tuple) else str(k)): jsonable(v)
            for k, v in obj.items()
        }
    if isinstance(obj, (list, tuple)):
        return [jsonable(v) for v in obj]
    return obj


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reference", default="/root/reference")
    args = p.parse_args()

    os.makedirs(OUT_DIR, exist_ok=True)
    for mod, names in TABLES.items():
        env = literal_env(os.path.join(args.reference, mod))
        out = {}
        for n in names:
            if n not in env:
                print(f"WARNING: {mod}:{n} not literal-extractable; skipped")
                continue
            out[n] = jsonable(env[n])
        out_path = os.path.join(OUT_DIR, mod.replace(".py", ".json"))
        with open(out_path, "w") as f:
            json.dump(out, f)
        print(f"wrote {out_path}: {list(out)}")


if __name__ == "__main__":
    main()
