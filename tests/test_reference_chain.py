"""CI wrapper for the full-chain executed-reference parity check.

Runs tools/reference_chain_parity.py in a subprocess: the tool executes
the ACTUAL reference pipeline composed exactly as
/root/reference/src/match.py:131-176, at the shipped paper defaults
(cbca_distance 14, iterations 2+16), and diffs the final disparity map
against our exact-mode jitted pipeline. Subprocess isolation matters —
the reference loader stubs `tensorflow`/`cv2` in sys.modules, which must
not leak into this process (tests/test_tf_parity.py imports real TF).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "reference_chain_parity.py")


def test_full_chain_matches_executed_reference_at_paper_defaults():
    result = subprocess.run(
        [sys.executable, TOOL, "--height", "48", "--width", "64",
         "--ndisp", "12"],
        capture_output=True, text=True, timeout=1800,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert result.returncode == 0, (
        f"chain parity failed:\n{result.stdout[-3000:]}\n{result.stderr[-2000:]}"
    )
    assert "CHAIN PARITY OK" in result.stdout
