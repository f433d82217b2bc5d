"""Worker for the 2-process CLI test (tests/test_cli_main.py): runs the
real ``cli.main_finetune`` train-one-epoch -> eval flow on the tiny fixture
under a multi-process CPU cluster (or single-process when nproc == 1 as the
golden run) and prints one JSON line with the eval result.

argv: pid nproc port data_root out_dir
"""
import functools
import json
import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    data_root, out_dir = sys.argv[4], sys.argv[5]
    if nproc > 1:
        # main() reads these in init_distributed()
        os.environ["COORDINATOR_ADDRESS"] = f"localhost:{port}"
        os.environ["NUM_PROCESSES"] = str(nproc)
        os.environ["PROCESS_ID"] = str(pid)

    import numpy as np
    import hoigen_tpu.cli.main_finetune as mf
    import hoigen_tpu.data.factory as factory_mod
    from hoigen_tpu.data import DataFactory
    from hoigen_tpu.utils.config import RunConfig
    from test_cli_main import _tiny_model_config

    mf.make_model_config = _tiny_model_config
    mf.DataFactory = functools.partial(
        DataFactory, clip_resolution=32,
        transform_kwargs=dict(eval_min_side=48, max_side=80,
                              train_scales=(40, 48, 56),
                              crop_resize_choices=(56, 64),
                              crop_range=(32, 64)))
    factory_mod.DEFAULT_BUCKETS = ((56, 80), (80, 56), (80, 80))

    common = dict(data_root=data_root, output_dir=out_dir, batch_size=2,
                  num_workers=2, num_classes=117, dino=False,
                  generate_feature=False, max_gt_pairs=4, devices=1,
                  print_interval=100, epochs=1, seed=3)
    # train 1 epoch; the Orbax save itself barriers all ranks, so the
    # checkpoint is finalized before any rank proceeds to eval
    mf.main(RunConfig(**common))

    result = mf.main(RunConfig(**{**common, "eval": True,
                                  "resume": out_dir}))

    # official-format caching under the same cluster: each process scores
    # its shard, results merge via gather_pyobj, process 0 writes the .mat
    # files; digest them so the test can compare against the 1-proc run
    cache_dir = os.path.join(out_dir, "cache_out")
    mf.main(RunConfig(**{**common, "cache": True, "resume": out_dir,
                         "output_dir": cache_dir}))
    mat_digest = []
    if pid == 0:
        import scipy.io as sio
        for obj in range(1, 81):
            m = sio.loadmat(
                os.path.join(cache_dir, f"detections_{obj:02d}.mat"))
            cells = [c for c in np.asarray(m["all_boxes"]).ravel()
                     if c.size]
            n = int(sum(c.shape[0] for c in cells))
            s = float(sum(np.float64(c).sum() for c in cells))
            mat_digest.append([n, round(s, 6)])

    print(json.dumps({
        "pid": pid,
        "mAP": float(result["mAP"]),
        "rare": float(result["mAP_rare"]),
        "non_rare": float(result["mAP_non_rare"]),
        "ap": np.round(np.asarray(result["ap"], np.float64), 10).tolist(),
        "mat_digest": mat_digest,
    }))


if __name__ == "__main__":
    main()
