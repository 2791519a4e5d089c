// Minimal shim so the reference dbgen sources (which use one VELOX_CHECK_GT
// in build.cpp) compile standalone without folly/velox-common.
#pragma once
#include <cassert>
#include <cstdio>
#include <cstdlib>

#define VELOX_CHECK_GT(a, b)                               \
  do {                                                     \
    if (!((a) > (b))) {                                    \
      std::fprintf(stderr, "VELOX_CHECK_GT failed\n");     \
      std::abort();                                        \
    }                                                      \
  } while (0)
