"""One sharded program, start to finish (SURVEY §2.7 collectives row):
the production pipeline run with its mid-cascade global statistics — the
e-value model's fusion-partner counts and breakpoint-location priors
(filter_relative_support.cpp:20-126) and the in-vitro expression quantile
(filter_in_vitro.cpp:48-83) — computed as psum/all-gather reductions over
a device mesh (1 device, 8 devices) and across 2 genuine jax.distributed
processes (DCN/Gloo), must emit byte-identical fusions.tsv and
fusions.discarded.tsv and identical per-stage `remaining=` counters in
every layout. The multi-process layout additionally merges the candidate
cluster tables across the process boundary and cross-checks them against
the host fusion table (filters/native_cascade.py _sharded_expression)."""

import os
import re
import subprocess
import sys

import pytest

from .scenario import multi_event_sample


def _counters(stdout: str):
    return re.findall(r"\((?:remaining|total|marked)=\d+\)", stdout)


@pytest.mark.parametrize("engine_env", [
    {},                              # native engine (default build)
    {"ARRIBA_TPU_NO_NATIVE": "1"},   # pure-Python parity engine
])
def test_sharded_stats_layouts_byte_equal(tmp_path, engine_env):
    args = multi_event_sample(tmp_path)
    layouts = {
        "host": None,
        "mesh1": "1",
        "mesh8": "8",
        "procs2": "2procs",
    }
    outputs = {}
    counters = {}
    for label, shards in layouts.items():
        out = tmp_path / f"fusions_{label}.tsv"
        discarded = tmp_path / f"discarded_{label}.tsv"
        env = dict(os.environ,
                   JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=8",
                   **engine_env)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        if shards is None:
            env.pop("ARRIBA_TPU_SHARDED_STATS", None)
        else:
            env["ARRIBA_TPU_SHARDED_STATS"] = shards
        result = subprocess.run(
            [sys.executable, "-m", "arriba_tpu"] + args
            + ["-o", str(out), "-O", str(discarded)],
            env=env, capture_output=True, text=True, timeout=600)
        assert result.returncode == 0, \
            f"{label}: {result.stdout[-2000:]}\n{result.stderr[-2000:]}"
        outputs[label] = (out.read_bytes(), discarded.read_bytes())
        counters[label] = _counters(result.stdout)

    reference = outputs["host"]
    assert reference[0].count(b"\n") > 1  # non-trivial sample
    for label in ("mesh1", "mesh8", "procs2"):
        assert outputs[label][0] == reference[0], \
            f"fusions.tsv differs under {label}"
        assert outputs[label][1] == reference[1], \
            f"discarded output differs under {label}"
        assert counters[label] == counters["host"], \
            f"stage counters differ under {label}"
