"""Bit-exact parity vs the reference library (skipped when the reference repo
is not mounted). Runs tools/reference_parity.py, which stubs numba/river/
optuna and compares every detector's output on the reference's own fixtures.
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/streamchange"),
    reason="reference repo not available",
)
def test_reference_parity():
    script = os.path.join(os.path.dirname(__file__), "..", "tools", "reference_parity.py")
    proc = subprocess.run(
        [sys.executable, script], capture_output=True, text=True, timeout=600
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
