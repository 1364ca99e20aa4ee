"""`python -m arriba_tpu` — the command-line entry point."""

import os
import sys

# OpenBLAS/OMP worker threads spin-wait and starve the native scan/cascade
# pools (nothing here issues large BLAS calls); must be set before numpy
# loads the BLAS runtime
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

from .cli import main  # noqa: E402

if __name__ == "__main__":
    status = main()
    # Skip interpreter finalization: teardown of the multi-million-object
    # alignment graph costs ~0.3s of pure refcount churn after all outputs
    # are already written and flushed (the reference binary's C++ destructors
    # are effectively free; Python's are not). In-process callers (tests,
    # library use) still get normal teardown via cli.main().
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(status)
