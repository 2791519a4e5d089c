#!/bin/sh
# Build the dsdgen-exact TPC-DS dumper: our driver + append sink
# (dsdgen_dump.cpp) linked against the REFERENCE dsdgen sources compiled in
# place (read-only; nothing is copied into this repo). Artifacts go to
# native/build/ (gitignored). Mirrors build_dbgen.sh.
set -e
REF=${REF:-/root/reference}
HERE=$(dirname "$0")
DSDGEN="$REF/velox/tpcds/gen/dsdgen"
OUT="$HERE/build"
mkdir -p "$OUT"

if [ -x "$OUT/dsdgen_dump" ] && [ "$OUT/dsdgen_dump" -nt "$HERE/dsdgen_dump.cpp" ]; then
  echo "dsdgen_dump up to date"
  exit 0
fi

# -include cmath: dist.cpp uses log10 without including <cmath>
g++ -O2 -w -std=c++17 -include cmath \
  -I "$HERE/shim" -I "$REF" \
  "$DSDGEN"/*.cpp \
  "$HERE/dsdgen_dump.cpp" \
  -o "$OUT/dsdgen_dump"
echo "built $OUT/dsdgen_dump"
