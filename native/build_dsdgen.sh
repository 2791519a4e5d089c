#!/bin/sh
# Build the dsdgen-exact TPC-DS dumper: our driver + append sink
# (dsdgen_dump.cpp) linked against the REFERENCE dsdgen sources compiled in
# place (read-only; nothing is copied into this repo). Artifacts go to
# native/build/ (gitignored). Mirrors build_dbgen.sh.
#
# permute.cpp is EXCLUDED: the reference port returns a dangling pointer
# from makePermutation (local std::vector .data()), collapsing every
# sales item permutation to freed-heap garbage. shim/permute_fix.cpp is
# our correct same-API replacement (see its header comment).
set -e
REF=${REF:-/root/reference}
HERE=$(dirname "$0")
DSDGEN="$REF/velox/tpcds/gen/dsdgen"
OUT="$HERE/build"
mkdir -p "$OUT"

up_to_date=yes
for src in "$HERE/dsdgen_dump.cpp" "$HERE/shim/permute_fix.cpp" "$0"; do
  if [ ! -x "$OUT/dsdgen_dump" ] || [ "$src" -nt "$OUT/dsdgen_dump" ]; then
    up_to_date=no
  fi
done
if [ "$up_to_date" = yes ]; then
  echo "dsdgen_dump up to date"
  exit 0
fi

SRCS=$(ls "$DSDGEN"/*.cpp | grep -v '/permute\.cpp$')

# -include cmath: dist.cpp uses log10 without including <cmath>
g++ -O2 -w -std=c++17 -include cmath \
  -I "$HERE/shim" -I "$REF" \
  $SRCS \
  "$HERE/shim/permute_fix.cpp" \
  "$HERE/dsdgen_dump.cpp" \
  -o "$OUT/dsdgen_dump"
echo "built $OUT/dsdgen_dump"
