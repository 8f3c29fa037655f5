"""Real multi-process (multi-host) exercise: 2 CPU processes form one
global mesh via jax.distributed.initialize and train with host-sharded
feeds; losses must equal the single-process run.

No reference counterpart (the reference is single-process, SURVEY §2.4)
— this is the net-new distributed layer, demonstrated rather than just
written. The heavy lifting lives in scripts/dryrun_multihost.py so the
driver can also run it standalone.
"""
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent.parent


def test_two_process_training_matches_single_process():
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "dryrun_multihost.py")],
        capture_output=True, text=True, timeout=840,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "[dryrun_multihost] ok" in proc.stdout
    assert "losses match" in proc.stdout
