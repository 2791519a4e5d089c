"""Every examples/ script must stay runnable (velox/examples analog;
the scripts double as embedding-surface smoke tests)."""

import glob
import os
import subprocess
import sys

import pytest

_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")


@pytest.mark.parametrize(
    "script", sorted(glob.glob(os.path.join(_DIR, "0*.py"))),
    ids=lambda p: os.path.basename(p))
def test_example_runs(script):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # 06 sets its own device count
    r = subprocess.run(
        [sys.executable, script], capture_output=True, text=True,
        timeout=300, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
