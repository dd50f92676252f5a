"""Driver-contract tests for __graft_entry__ (the round-gate harness).

Round 1 failed MULTICHIP capture because dryrun_multichip asserted on
pre-existing devices instead of provisioning a virtual mesh; these tests
pin the fixed contract. The in-process impl runs on the conftest-provided
8-device CPU platform; the public wrapper's subprocess path is exercised
by running it exactly as the driver does (fresh interpreter, any cwd).
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_dryrun_impl_in_process():
    import __graft_entry__ as g

    g._dryrun_multichip_impl(8, full=False)


@pytest.mark.slow
def test_dryrun_wrapper_subprocess(tmp_path):
    # From a foreign cwd, with a hostile JAX_PLATFORMS preset: the wrapper
    # must still self-provision the CPU mesh in its child process.
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "nonexistent-platform"
    env["TUNEVLSEG_DRYRUN_TINY"] = "1"  # driver runs full rd64; tests tiny
    code = ("import sys; sys.path.insert(0, %r)\n"
            "import __graft_entry__ as g\n"
            "g.dryrun_multichip(8)\n" % REPO)
    proc = subprocess.run([sys.executable, "-c", code], cwd=tmp_path,
                          env=env, capture_output=True, text=True,
                          timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8) ok" in proc.stdout
