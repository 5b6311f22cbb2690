"""CI hook for the concordance harness (VERDICT r2 'Next round' #2):
runs `concordance.py --quick` with the CPU-JAX device path so the
harness can never silently rot. The full-size run (CONCORDANCE.md) is
produced by `python concordance.py` out-of-band."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_concordance_quick(tmp_path):
    out = tmp_path / "CONCORDANCE_quick.md"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "concordance.py"),
         "--quick", "--device", "cpu", "--out", str(out)],
        cwd=REPO, capture_output=True, timeout=900)
    sys.stderr.write(proc.stdout.decode()[-2000:])
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]
    text = out.read_text()
    assert "Overall: PASS" in text
