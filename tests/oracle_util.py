"""Oracle harness: build the reference arriba against the htslib shim and
run it for golden-output comparison. The binary is cached per test session."""

import os
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path(os.environ.get("ARRIBA_REFERENCE", "/root/reference"))
ORACLE_BINARY = Path("/tmp/arriba_oracle/arriba")


def oracle_available() -> bool:
    if ORACLE_BINARY.exists():
        return True
    if not (REFERENCE / "source" / "arriba.cpp").exists():
        return False
    try:
        subprocess.run([str(REPO / "oracle" / "build_oracle.sh"), str(ORACLE_BINARY)],
                       check=True, capture_output=True, timeout=600)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, OSError):
        return False
    return ORACLE_BINARY.exists()


def run_oracle(args, cwd) -> subprocess.CompletedProcess:
    return subprocess.run([str(ORACLE_BINARY)] + args, cwd=str(cwd),
                          capture_output=True, text=True, timeout=600)


def run_ours(args, cwd) -> subprocess.CompletedProcess:
    import sys
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run([sys.executable, "-m", "arriba_tpu"] + args, cwd=str(cwd),
                          capture_output=True, text=True, timeout=600, env=env)
