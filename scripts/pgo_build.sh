#!/bin/bash
# Profile-guided build of the native extension against the bench workload.
#
#   scripts/pgo_build.sh [sample_dir]
#
# Three steps: instrumented build, in-process profile run (the CLI entry
# point exits via os._exit which skips the gcov dump, so the profile run
# must call cli.main() in-process), profile-fed rebuild. Requires the
# bench sample (python bench.py builds it on first run) or a sample dir
# holding aligned.sam/genes.gtf/genome.fa/blacklist.tsv.
set -euo pipefail
cd "$(dirname "$0")/.."
SAMPLE="${1:-/tmp/arriba_tpu_bench_sample_v3}"
if [ ! -f "$SAMPLE/aligned.sam" ]; then
    echo "sample not found: $SAMPLE (run 'python bench.py' once to build it)" >&2
    exit 1
fi
rm -f build/temp.*/native/*.gcda
ARRIBA_TPU_PGO=gen python setup.py build_ext --inplace --force >/dev/null
for input in aligned.sam aligned.bam; do
    [ -f "$SAMPLE/$input" ] || continue
    PYTHONPATH=. python - "$SAMPLE" "$input" <<'EOF'
import sys, os
sample, input_name = sys.argv[1], sys.argv[2]
sys.argv = ["arriba_tpu",
            "-x", os.path.join(sample, input_name),
            "-g", os.path.join(sample, "genes.gtf"),
            "-a", os.path.join(sample, "genome.fa"),
            "-b", os.path.join(sample, "blacklist.tsv"),
            "-o", "/tmp/pgo_fusions.tsv", "-O", "/tmp/pgo_fusions.discarded.tsv",
            "-i", "1 2", "-s", "no", "-@", str(os.cpu_count() or 1)]
from arriba_tpu.cli import main
status = main()
assert status == 0, status
EOF
done
# also profile the genome-scale 150bp tier when present (the headline tier)
TIER2="/tmp/arriba_tpu_bench_genome_scale_v3"
if [ -f "$TIER2/aligned.sam" ]; then
    PYTHONPATH=. python - "$TIER2" <<'EOF'
import sys, os
sample = sys.argv[1]
sys.argv = ["arriba_tpu",
            "-x", os.path.join(sample, "aligned.sam"),
            "-g", os.path.join(sample, "genes.gtf"),
            "-a", os.path.join(sample, "genome.fa"),
            "-b", os.path.join(sample, "blacklist.tsv"),
            "-o", "/tmp/pgo_fusions2.tsv", "-O", "/tmp/pgo_fusions2.discarded.tsv",
            "-s", "no", "-@", str(os.cpu_count() or 1)]
from arriba_tpu.cli import main
status = main()
assert status == 0, status
EOF
fi
ls build/temp.*/native/*.gcda >/dev/null  # the profile must exist
ARRIBA_TPU_PGO=use python setup.py build_ext --inplace --force >/dev/null
echo "PGO build complete: arriba_tpu/_native$(python3-config --extension-suffix)"
