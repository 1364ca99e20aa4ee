#!/bin/bash
# Build the native data loader extension in place.
set -euo pipefail
cd "$(dirname "$0")/.."
g++ -O3 -g -shared -fPIC -std=c++17 $(python3-config --includes) \
    native/ingest.cpp native/gtf.cpp native/realign.cpp native/annotate.cpp native/filters.cpp native/cascade.cpp native/fusions.cpp native/event.cpp native/extract.cpp native/codecs.cpp \
    -o arriba_tpu/_native$(python3-config --extension-suffix) -lz $( [ -e /usr/include/libdeflate.h ] && echo -ldeflate )
echo "built arriba_tpu/_native"
