"""Day-1 bring-up pipeline (`scripts/bringup.py`): the synthetic-stand-in
mode must run the full convert->load->tokenize->parity->sample->eval chain
end-to-end, and the fail-fast paths must fail loudly, not silently."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/flowdiffusion/flowdiffusion"


def _run(args, **kw):
    env = dict(os.environ)
    pp = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = f"{pp}:{REPO}" if pp else REPO
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "bringup.py")] + args,
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900, **kw
    )


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not available")
def test_synthetic_bringup_end_to_end(tmp_path):
    out = str(tmp_path / "bringup")
    r = _run(["--synthetic", "--out-dir", out])
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    manifest = json.load(open(os.path.join(out, "bringup_manifest.json")))
    assert manifest["pass"]
    steps = {s["step"]: s for s in manifest["steps"]}
    assert set(steps) == {
        "assets", "convert", "load", "tokenizer", "parity", "sample", "eval"
    }
    assert steps["tokenizer"]["is_real"]
    assert steps["parity"]["max_abs_err"] < 2e-3
    assert steps["eval"]["episode_frames"] > 1


def test_bringup_missing_checkpoint_fails_fast(tmp_path):
    out = str(tmp_path / "bringup")
    r = _run(["--pt", str(tmp_path / "nope.pt"), "--cpu", "--out-dir", out])
    assert r.returncode != 0
    manifest = json.load(open(os.path.join(out, "bringup_manifest.json")))
    assert not manifest["pass"]
    assert manifest["steps"][0]["step"] == "assets"
    assert manifest["steps"][0]["status"] == "FAIL"
    assert "nope.pt" in manifest["steps"][0]["error"]
