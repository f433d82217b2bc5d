"""Capture a golden V-COCO role/agent-AP fixture from the REAL public
s-gupta/v-coco toolkit (vsrl_eval.py).

This environment cannot run it (zero egress; the toolkit is not vendored by
the reference — /root/reference/main_tip_finetune.py:912 defers to it), so
the V-COCO scorer is currently certified against a transcription
(tests/ref_vsrl_eval.py). On any machine where
``git clone https://github.com/s-gupta/v-coco`` is importable, run

    python tools/capture_vsrl_fixture.py tests/fixtures

and check in the resulting ``vsrl_golden.npz``. The fixture stores BOTH the
randomized scenes (so no cross-version RNG reproducibility is assumed) and
the toolkit's per-class AP outputs on them;
``tests/test_vcoco_oracle.py::test_vsrl_golden_fixture`` then certifies
``hoigen_tpu/eval/vcoco_ap.py`` and the transcription against the actual
toolkit, algorithm-vs-binary.

Mechanics: ``VCOCOeval`` is instantiated without its COCO-annotation
constructor (object.__new__) and fed a hand-built ``vcocodb`` in its native
form — person rows carry ``gt_actions``/``gt_role_id`` indices into the
image's ``boxes`` array — plus a detections pickle in the official format
(the same entry layout our ``cache_vcoco`` writes:
/root/reference/utils_tip_cache_and_union_finetune.py:494-540). Only the
toolkit's ``_do_role_eval`` / ``_do_agent_eval`` code runs; everything they
read is asserted present first.
"""
import os
import pickle
import sys
import tempfile

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tests"))

N_SEEDS = 6
SCENES_PER_SEED = 8
A = 5  # actions per scene (matches tests/test_vcoco_oracle.py)


def generate_scenes():
    """Deterministic scenes via the suite's own generator."""
    import test_vcoco_oracle as tvo

    runs = []
    for seed in range(N_SEEDS):
        rng = np.random.default_rng(1000 + seed)
        n_img = int(rng.integers(2, 5))
        vcocodb, dets, entries_all = [], [], []
        for i in range(n_img):
            gt, det, _og, entries = tvo._make_scene(rng, image_id=i)
            vcocodb.append(gt)
            dets.append(det)
            entries_all.extend(entries)
        runs.append((vcocodb, dets, entries_all))
    return runs


def to_toolkit_vcocodb(vcocodb):
    """Our per-image dicts -> the toolkit's native vcocodb rows."""
    out = []
    for i, gt in enumerate(vcocodb):
        persons = np.asarray(gt["gt_boxes"], np.float64).reshape(-1, 4)
        acts = np.asarray(gt["gt_actions"], np.int64).reshape(-1, A)
        roles = np.asarray(gt["gt_role_boxes"], np.float64).reshape(
            -1, A, 4)
        P = persons.shape[0]
        boxes = [persons[p] for p in range(P)]
        gt_role_id = -np.ones((P, A, 1), np.int64)
        for p in range(P):
            for a in range(A):
                if acts[p, a] and np.isfinite(roles[p, a]).all():
                    gt_role_id[p, a, 0] = len(boxes)
                    boxes.append(roles[p, a])
        n_obj = len(boxes) - P
        row = {
            "id": i,
            "boxes": (np.stack(boxes) if boxes
                      else np.zeros((0, 4))).astype(np.float64),
            # toolkit: person category id == 1
            "gt_classes": np.concatenate(
                [np.ones(P, np.int64), np.full(n_obj, 2, np.int64)]),
            "gt_actions": np.concatenate(
                [acts, np.zeros((n_obj, A), np.int64)], axis=0),
            "gt_role_id": np.concatenate(
                [gt_role_id, -np.ones((n_obj, A, 1), np.int64)], axis=0),
        }
        out.append(row)
    return out


def make_eval(num_actions):
    from vsrl_eval import VCOCOeval  # the real toolkit

    ev = object.__new__(VCOCOeval)
    ev.num_actions = num_actions
    ev.actions = [f"v{a}" for a in range(num_actions)]
    ev.roles = [["agent", "obj"] for _ in range(num_actions)]
    ev.num_roles = 2  # some toolkit revisions read this
    return ev


def main(out_dir):
    runs = generate_scenes()
    payload = {"n_runs": np.int64(len(runs)), "num_actions": np.int64(A)}
    for r, (vcocodb, dets, entries) in enumerate(runs):
        ev = make_eval(A)
        tk_db = to_toolkit_vcocodb(vcocodb)
        with tempfile.NamedTemporaryFile(suffix=".pkl",
                                         delete=False) as f:
            pickle.dump(entries, f, protocol=2)
            det_file = f.name
        try:
            role1 = ev._do_role_eval(tk_db, det_file, ovr_thresh=0.5,
                                     eval_type="scenario_1")
            role2 = ev._do_role_eval(tk_db, det_file, ovr_thresh=0.5,
                                     eval_type="scenario_2")
            agent = ev._do_agent_eval(tk_db, det_file, ovr_thresh=0.5)
        finally:
            os.unlink(det_file)

        def _aps(x):
            # revisions return either the ap array or None (print-only);
            # fall back to the instance attribute some forks set
            arr = x if x is not None else getattr(ev, "role_ap", None)
            assert arr is not None, (
                "this vsrl_eval revision returns nothing — grab the ap "
                "array from inside _do_role_eval (it is computed right "
                "before the print) and re-run")
            return np.asarray(arr, np.float64).reshape(-1)[:A]

        payload[f"run{r}_role_ap_s1"] = _aps(role1)
        payload[f"run{r}_role_ap_s2"] = _aps(role2)
        payload[f"run{r}_agent_ap"] = _aps(agent)
        payload[f"run{r}_scenes"] = np.frombuffer(
            pickle.dumps({"vcocodb": vcocodb, "dets": dets,
                          "entries": entries}, protocol=2), np.uint8)
        print(f"[capture] run {r}: role_s1 mean "
              f"{payload[f'run{r}_role_ap_s1'].mean():.4f}")

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "vsrl_golden.npz")
    np.savez_compressed(path, **payload)
    print(f"captured -> {path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.path.join(ROOT, "tests", "fixtures"))
