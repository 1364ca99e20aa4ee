#!/bin/bash
# Build the native engine under AddressSanitizer or ThreadSanitizer and run
# the sharded pipeline on a scenario — validates the parallel scan/cascade
# (atomic coverage updates, shard isolation, cache prepopulation) beyond
# what the byte-parity tests can see.
#
#   scripts/sanitize.sh asan|tsan [input.sam genes.gtf genome.fa blacklist.tsv]
#
# With no input files, a synthetic multi-event scenario is generated.
set -euo pipefail
cd "$(dirname "$0")/.."

MODE="${1:-asan}"
case "$MODE" in
    asan) FLAG="-fsanitize=address -fno-omit-frame-pointer"
          LIB=$(g++ -print-file-name=libasan.so)
          export ASAN_OPTIONS="detect_leaks=0" ;;
    tsan) FLAG="-fsanitize=thread"
          LIB=$(g++ -print-file-name=libtsan.so)
          export TSAN_OPTIONS="report_bugs=1 halt_on_error=1" ;;
    *) echo "usage: $0 asan|tsan [input files...]" >&2; exit 1 ;;
esac

BUILD_DIR=$(mktemp -d)
trap 'rm -rf "$BUILD_DIR"' EXIT
g++ -O1 -g -shared -fPIC -std=c++17 $FLAG $(python3-config --includes) \
    native/ingest.cpp native/gtf.cpp native/realign.cpp native/annotate.cpp \
    native/filters.cpp native/cascade.cpp native/fusions.cpp \
    native/event.cpp native/extract.cpp native/codecs.cpp \
    -o "$BUILD_DIR/_native$(python3-config --extension-suffix)" -lz $( [ -e /usr/include/libdeflate.h ] && echo -ldeflate )
cp -r arriba_tpu "$BUILD_DIR/pkg_arriba_tpu"
mkdir -p "$BUILD_DIR/pkg"
mv "$BUILD_DIR/pkg_arriba_tpu" "$BUILD_DIR/pkg/arriba_tpu"
cp "$BUILD_DIR"/_native*.so "$BUILD_DIR/pkg/arriba_tpu/"

if [ "$#" -ge 5 ]; then
    ARGS=(-x "$2" -g "$3" -a "$4" -b "$5")
else
    python3 - "$BUILD_DIR" <<'PYEOF'
import pathlib, sys
sys.path.insert(0, ".")
from tests.scenario import multi_event_sample
out = pathlib.Path(sys.argv[1]) / "sample"
out.mkdir()
args = multi_event_sample(out)
(out / "args.txt").write_text("\n".join(args))
PYEOF
    mapfile -t ARGS < "$BUILD_DIR/sample/args.txt"
fi

# run from the build dir: `python -m` puts the CWD first on sys.path, and
# running from the repo would silently load the UNINSTRUMENTED extension
# (sanitizers then report false races on code they cannot see into)
cd "$BUILD_DIR"
PYTHONPATH="$BUILD_DIR/pkg" LD_PRELOAD="$LIB" \
    python3 -m arriba_tpu "${ARGS[@]}" \
    -o "$BUILD_DIR/fusions.tsv" -O "$BUILD_DIR/discarded.tsv" -@ 4
echo "$MODE run clean: $(wc -l < "$BUILD_DIR/fusions.tsv") output lines"
