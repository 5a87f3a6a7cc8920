"""Multi-JVM execution proof as a test (r7 verdict #2).

Runs scripts/cluster_proof.py --quick in a SUBPROCESS (local-cluster
needs its own SparkContext; the suite's session fixture owns this
process's JVM): two real worker JVMs, real broadcast transport, the
addPyFile zip as the only import path for executor Python workers.
Skips — with the captured reason — when the environment cannot spawn
worker JVMs at all (e.g. no free memory for two 2 GiB workers);
FAILS on any correctness mismatch once executors registered.
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_cluster_quick_slice_green():
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "cluster_proof.py"), "--quick"],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(REPO),
    )
    out = proc.stdout + proc.stderr
    if "executors=" in out:
        n_execs = int(out.split("executors=")[1].split()[0].strip())
        if n_execs < 2:
            pytest.skip(
                "local-cluster worker JVMs did not register "
                f"(executors={n_execs}) — cannot prove multi-JVM here"
            )
    elif proc.returncode != 0:
        pytest.skip(
            "local-cluster session failed to start: " + out[-500:]
        )
    assert proc.returncode == 0, out[-2000:]
    assert '"failures": []' in out, out[-2000:]
