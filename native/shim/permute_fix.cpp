// permute_fix: correct replacement for the reference dsdgen port's
// permute.cpp (velox/tpcds/gen/dsdgen/permute.cpp:49-70), which returns
// `std::vector<int32_t>(...).data()` — a pointer into a local vector
// that is destroyed on return. Every permutation consumer
// (w_store_sales.cpp / w_catalog_sales.cpp / w_web_sales.cpp item
// permutations, read through the getPermutationEntry macro in
// include/permute.h:33) therefore reads freed heap memory: after the
// first order the "permuted" item ids collapse to whatever the
// allocator wrote over the block (observed: every ss/cs/ws_item_sk
// equal to the max item id).
//
// This file implements the same public API with a heap allocation that
// matches the permutation's lifetime (the DSDGenContext holds the
// pointer for the whole table build; dsdgen's original C used malloc
// and never freed either — the process exits after the dump). The
// Fisher–Yates-with-replacement swap loop and the RNG stream protocol
// must match the reference EXACTLY so every other column's random
// stream stays aligned; the per-element cost is one genrand_integer
// call on `nStream`, identical to the reference loop.
//
// build_dsdgen.sh compiles the reference sources EXCEPT permute.cpp and
// links this instead.
#include "velox/tpcds/gen/dsdgen/include/config.h"
#include "velox/tpcds/gen/dsdgen/include/porting.h"

#include <cstdlib>

#include "velox/tpcds/gen/dsdgen/include/genrand.h"

int* makePermutation(int nSize, int nStream, DSDGenContext& dsdGenContext) {
  if (nSize <= 0) {
    return nullptr;
  }
  int* pInt = static_cast<int*>(std::malloc(sizeof(int) * nSize));
  if (!pInt) {
    return nullptr;
  }
  for (int i = 0; i < nSize; i++) {
    pInt[i] = i;
  }
  // same swap sequence as the reference (one DIST_UNIFORM draw per
  // element on nStream) so downstream RNG usage counts are unchanged
  for (int i = 0; i < nSize; i++) {
    int nIndex = genrand_integer(
        nullptr, DIST_UNIFORM, 0, nSize - 1, 0, nStream, dsdGenContext);
    int nTemp = pInt[i];
    pInt[i] = pInt[nIndex];
    pInt[nIndex] = nTemp;
  }
  return pInt;
}
