"""CLI smoke tests: every entry point parses its arguments.

Guards the argparse surfaces (train.py / eval.py / evaluation CLIs /
verify_parity runbook) against import-time and flag regressions without
running any heavy work.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("cli", [
    "train.py",
    "eval.py",
    "evaluation_method.py",
    "evaluation_codalab.py",
    os.path.join("scripts", "verify_parity.py"),
    os.path.join("scripts", "export_model.py"),
])
def test_cli_help(cli):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, cli), "--help"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "usage" in out.stdout.lower()
