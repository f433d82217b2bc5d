"""The reproduction runbook (scripts/repro_*.sh) stays wired: dry-run each
script and feed the assembled CLI flags back through the real parser
(round-4 VERDICT item 6 — one command per BASELINE config)."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = ["repro_fs.sh", "repro_uc.sh", "repro_rf.sh", "repro_nf.sh",
           "repro_uo.sh", "repro_uv.sh"]


@pytest.mark.parametrize("script", SCRIPTS)
def test_repro_script_commands_parse(script):
    from hoigen_tpu.utils.config import parse_config
    env = dict(os.environ, HOIGEN_REPRO_DRYRUN="1")
    out = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", script)],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    cmds = [l for l in out.stdout.splitlines()
            if l.startswith(("TRAIN:", "EVAL:"))]
    assert len(cmds) >= 2, out.stdout
    if script == "repro_uc.sh":                # five splits
        assert len(cmds) == 10
    for line in cmds:
        argv = line.split()[1:]
        assert argv[:3] == ["python", "-m", "hoigen_tpu.cli.main_finetune"]
        cfg = parse_config(argv[3:])           # raises on any bad flag
        assert cfg.num_classes == 117 and cfg.use_multi_hot
        if "EVAL" in line:
            assert cfg.eval and cfg.resume
    # the zero-shot scripts carry their split
    tag_to_zs = {"repro_rf.sh": "rare_first", "repro_nf.sh":
                 "non_rare_first", "repro_uo.sh": "unseen_object",
                 "repro_uv.sh": "unseen_verb"}
    if script in tag_to_zs:
        cfg = parse_config(cmds[0].split()[4:])
        assert cfg.zs and cfg.zs_type == tag_to_zs[script]


def test_fetch_script_syntax():
    out = subprocess.run(["bash", "-n",
                          os.path.join(REPO, "scripts", "fetch_data.sh")],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr


def test_make_fixture_tool(tmp_path):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_fixture.py"),
         str(tmp_path / "fx"), "--images", "3"],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert os.path.exists(tmp_path / "fx" / "instances_train2015.json")
    assert os.path.exists(tmp_path / "fx" / "instances_test2015.json")
