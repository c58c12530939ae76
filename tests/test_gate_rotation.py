"""The gate-window rotation invariant as a test: tools/gate_rotation.py
exits 1 if the current ``queries()`` ordering would leave a bound-stale
or row-less oracle-backed gate outside the driver's ~50-entry window.
Running it in the suite means "added a gate but forgot to rotate" (or
"a round passed without reordering") fails loudly BEFORE the driver
records a stale ledger, instead of being re-derived by hand in the
next verdict."""

from __future__ import annotations

import subprocess
import sys

REPO = "/root/repo"


def test_rotation_invariant_holds():
    r = subprocess.run(
        [sys.executable, "tools/gate_rotation.py", "--window", "50"],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
    )
    assert r.returncode == 0, f"rotation stale:\n{r.stdout}\n{r.stderr}"
    assert "OK: current queries() prefix" in r.stdout
