#!/bin/sh
# Build the dbgen-exact TPC-H dumper: our driver (dbgen_dump.cpp) linked
# against the REFERENCE dbgen sources compiled in place (read-only; nothing
# is copied into this repo). Artifacts go to native/build/ (gitignored).
set -e
REF=${REF:-/root/reference}
HERE=$(dirname "$0")
DBGEN="$REF/velox/tpch/gen/dbgen"
OUT="$HERE/build"
mkdir -p "$OUT"

if [ -x "$OUT/dbgen_dump" ] && [ "$OUT/dbgen_dump" -nt "$HERE/dbgen_dump.cpp" ]; then
  echo "dbgen_dump up to date"
  exit 0
fi

g++ -O2 -w -std=c++17 \
  -DDBNAME=dss -DMAC -DORACLE -DTPCH \
  -I "$DBGEN/include" -I "$HERE/shim" -I "$REF" \
  "$DBGEN/dbgen.cpp" "$DBGEN/dbgen_gunk.cpp" "$DBGEN/bm_utils.cpp" \
  "$DBGEN/build.cpp" "$DBGEN/permute.cpp" "$DBGEN/rnd.cpp" \
  "$DBGEN/rng64.cpp" "$DBGEN/speed_seed.cpp" "$DBGEN/text.cpp" \
  "$HERE/dbgen_dump.cpp" \
  -o "$OUT/dbgen_dump"
echo "built $OUT/dbgen_dump"
