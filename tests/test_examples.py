"""The smoke recipe (examples/smoke/run.sh) must run end to end: data gen
-> scp2jsonl -> cmvn -> train -> n-best average -> infer -> CER."""

import os
import shutil
import subprocess
import sys
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_smoke_recipe_runs():
    work = tempfile.mkdtemp(prefix="fta_smoke_")
    bindir = os.path.join(work, "bin")
    os.makedirs(bindir)
    for name, mod in [("funasr-tpu", "inference"), ("funasr-tpu-train", "train"),
                      ("funasr-tpu-scp2jsonl", "scp2jsonl")]:
        p = os.path.join(bindir, name)
        with open(p, "w") as f:
            f.write("#!/bin/bash\nexec %s -m funasr_tpu.bin.%s \"$@\"\n"
                    % (sys.executable, mod))
        os.chmod(p, 0o755)
    env = dict(os.environ,
               PATH=bindir + os.pathsep + os.environ.get("PATH", ""),
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
               JAX_PLATFORMS="cpu")
    try:
        out = subprocess.run(
            ["bash", os.path.join(REPO, "examples", "smoke", "run.sh"),
             os.path.join(work, "data")],
            env=env, capture_output=True, text=True, timeout=840)
        assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
        assert "SMOKE OK" in out.stdout
        assert os.path.exists(os.path.join(work, "data", "decode", "text"))
        assert os.path.exists(os.path.join(work, "data", "exp",
                                           "model.avg.npz"))
    finally:
        shutil.rmtree(work, ignore_errors=True)
