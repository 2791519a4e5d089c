// TPC-H columnar generator — native core.
//
// The analog of velox's embedded dbgen (velox/tpch/gen/dbgen, C) for this
// engine: generates the two large tables' (orders, lineitem) numeric
// columns directly into caller-provided buffers, vectorizable and
// allocation-free. Distributions follow TPC-H spec 4.2.3 (same rules as
// velox_tpu/io/tpch.py's numpy path; deterministic via a dbgen-style
// Lehmer LCG, so any scale factor reproduces bit-identically across
// machines). Strings (flags/status/priority) are emitted as small int8
// codes; Python attaches the dictionaries.
//
// Build: g++ -O3 -march=native -shared -fPIC tpchgen.cpp -o libtpchgen.so

#include <cstdint>
#include <cstring>

namespace {

// dbgen-style Lehmer LCG (minimal standard): x = 16807 x mod (2^31-1)
struct Rng {
  int64_t state;
  explicit Rng(int64_t seed) : state(seed % 2147483646 + 1) {}
  inline int64_t next() {
    state = (16807 * state) % 2147483647;
    return state;
  }
  // uniform integer in [lo, hi]
  inline int64_t uniform(int64_t lo, int64_t hi) {
    return lo + next() % (hi - lo + 1);
  }
};

constexpr int32_t kStartDate = 8035;    // 1992-01-01
constexpr int32_t kEndDate = 10561;     // 1998-12-01
constexpr int32_t kCurrentDate = 9298;  // 1995-06-17

// spec 4.2.3: the i-th (0..3) supplier of part p among S suppliers
inline int64_t part_supplier(int64_t p, int64_t i, int64_t s) {
  return (p + i * (s / 4 + (p - 1) / s)) % s + 1;
}

inline int64_t retail_price_cents(int64_t partkey) {
  return 90000 + (partkey / 10) % 20001 + 100 * (partkey % 1000);
}

}  // namespace

extern "C" {

// Phase 1: per-order line counts (1..7) + order dates + custkeys.
// Returns total line count.
int64_t tpch_gen_orders(
    int64_t num_orders, int64_t num_customers, int64_t seed,
    int32_t* line_counts,       // [num_orders]
    int64_t* o_custkey,         // [num_orders]
    int32_t* o_orderdate,       // [num_orders]
    int8_t* o_orderpriority) {  // [num_orders] code 0..4
  Rng rng(seed);
  int64_t total = 0;
  for (int64_t i = 0; i < num_orders; ++i) {
    int64_t ck = rng.uniform(1, num_customers);
    // spec: customers with custkey % 3 == 0 place no orders
    while (ck % 3 == 0) {
      ck = ck + 1 > num_customers ? 1 : ck + 1;
    }
    o_custkey[i] = ck;
    o_orderdate[i] =
        static_cast<int32_t>(rng.uniform(kStartDate, kEndDate - 151));
    o_orderpriority[i] = static_cast<int8_t>(rng.uniform(0, 4));
    int32_t nl = static_cast<int32_t>(rng.uniform(1, 7));
    line_counts[i] = nl;
    total += nl;
  }
  return total;
}

// Phase 2: lineitem columns + order-derived columns.
// All money columns are cents (unscaled DECIMAL(p,2)).
void tpch_gen_lineitem(
    int64_t num_orders, int64_t num_parts, int64_t num_suppliers,
    int64_t seed, const int32_t* line_counts, const int32_t* o_orderdate,
    // per-line outputs
    int64_t* l_orderkey, int64_t* l_partkey, int64_t* l_suppkey,
    int64_t* l_linenumber, int32_t* l_quantity_cents,
    int32_t* l_extendedprice_cents, int32_t* l_discount_cents,
    int32_t* l_tax_cents, int32_t* l_shipdate, int32_t* l_commitdate,
    int32_t* l_receiptdate, int8_t* l_returnflag,  // 0=A 1=N 2=R
    int8_t* l_linestatus,                          // 0=F 1=O
    int8_t* l_shipmode, int8_t* l_shipinstruct,
    // per-order outputs
    int8_t* o_orderstatus,       // 0=F 1=O 2=P
    int64_t* o_totalprice_cents) {
  Rng rng(seed + 7);
  int64_t li = 0;
  for (int64_t oi = 0; oi < num_orders; ++oi) {
    const int32_t nl = line_counts[oi];
    const int32_t odate = o_orderdate[oi];
    int32_t n_open = 0;
    int64_t total_cents = 0;
    for (int32_t ln = 0; ln < nl; ++ln, ++li) {
      l_orderkey[li] = oi + 1;
      const int64_t pk = rng.uniform(1, num_parts);
      l_partkey[li] = pk;
      l_suppkey[li] = part_supplier(pk, rng.uniform(0, 3), num_suppliers);
      l_linenumber[li] = ln + 1;
      const int64_t qty = rng.uniform(1, 50);
      l_quantity_cents[li] = static_cast<int32_t>(qty * 100);
      const int64_t price = qty * retail_price_cents(pk);
      l_extendedprice_cents[li] = static_cast<int32_t>(price);
      const int64_t disc = rng.uniform(0, 10);
      l_discount_cents[li] = static_cast<int32_t>(disc);
      const int64_t tax = rng.uniform(0, 8);
      l_tax_cents[li] = static_cast<int32_t>(tax);
      const int32_t ship =
          odate + static_cast<int32_t>(rng.uniform(1, 121));
      const int32_t commit =
          odate + static_cast<int32_t>(rng.uniform(30, 90));
      const int32_t receipt =
          ship + static_cast<int32_t>(rng.uniform(1, 30));
      l_shipdate[li] = ship;
      l_commitdate[li] = commit;
      l_receiptdate[li] = receipt;
      const bool returned = receipt <= kCurrentDate;
      l_returnflag[li] =
          returned ? (rng.uniform(0, 1) ? 0 : 2) : 1;  // A/R else N
      const bool open = ship > kCurrentDate;
      l_linestatus[li] = open ? 1 : 0;
      n_open += open;
      l_shipmode[li] = static_cast<int8_t>(rng.uniform(0, 6));
      l_shipinstruct[li] = static_cast<int8_t>(rng.uniform(0, 3));
      // amount = price * (1+tax) * (1-disc), cents precision like spec
      const int64_t amount =
          price * (100 + tax) / 100 * (100 - disc) / 100;
      total_cents += amount;
    }
    o_orderstatus[oi] = n_open == 0 ? 0 : (n_open == nl ? 1 : 2);
    o_totalprice_cents[oi] = total_cents;
  }
}

}  // extern "C"
