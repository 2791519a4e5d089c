// dbgen_dump: standalone driver that links the REFERENCE dbgen library
// (compiled unmodified, in place, from /root/reference/velox/tpch/gen/dbgen)
// and dumps dbgen-exact TPC-H tables as pipe-separated files.
//
// Purpose (VERDICT r1, item 1b): produce the *same bytes* velox_tpch would
// see, so velox_tpu's results can be bit-compared against the reference
// semantics. This file is our own driver; the generation call pattern
// mirrors velox/tpch/gen/DBGenIterator.cpp:66-126 and the column order /
// value conversions mirror velox/tpch/gen/TpchGen.cpp:380-760.
//
// Output conventions:
//   * money columns are RAW CENTS int64 (velox converts with
//     decimalToDouble = cents * 0.01, TpchGen.cpp:80-82; we keep exact ints
//     and convert at ingest)
//   * dates are yyyy-mm-dd strings (velox parses to days-since-epoch)
//   * column order matches velox getTableSchema()
//
// Usage: dbgen_dump <scale_factor> <outdir> [table,table,...]
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "dbgen/dbgen_gunk.hpp"
#include "dbgen/dss.h"
#include "dbgen/dsstypes.h"

// dss.h no-ops stdio/exit for its own build; restore them for the driver.
#undef exit
#undef printf
#undef fprintf

using namespace facebook::velox::tpch::dbgen;

namespace {

FILE* openOut(const std::string& dir, const char* name) {
  std::string path = dir + "/" + name + ".tbl";
  FILE* f = std::fopen(path.c_str(), "w");
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", path.c_str());
    std::exit(1);
  }
  return f;
}

bool wantTable(const std::vector<std::string>& tables, const char* name) {
  if (tables.empty()) {
    return true;
  }
  for (const auto& t : tables) {
    if (t == name) {
      return true;
    }
  }
  return false;
}

// Row counts mirror velox/tpch/gen/TpchGen.cpp:132-153 (getRowCount).
long rowCount(long base, double sf) {
  return static_cast<long>(base * sf);
}

} // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(
        stderr, "usage: %s <scale_factor> <outdir> [tables]\n", argv[0]);
    return 2;
  }
  double sf = std::atof(argv[1]);
  std::string outdir = argv[2];
  std::vector<std::string> tables;
  if (argc > 3) {
    std::string arg = argv[3];
    size_t pos = 0;
    while (pos < arg.size()) {
      size_t comma = arg.find(',', pos);
      if (comma == std::string::npos) {
        comma = arg.size();
      }
      tables.push_back(arg.substr(pos, comma - pos));
      pos = comma + 1;
    }
  }

  DBGenContext ctx;
  // 300MB text pool: same default as velox_tpch_text_pool_size_mb.
  load_dists(300L * 1024 * 1024, &ctx);
  init_build_buffers();
  // Fractional SF uses dbgen scale 1 internally but scaled row counts
  // (DBGenIterator.cpp:57-66).
  ctx.scale_factor = (sf > 0 && sf < 1.0) ? 1 : static_cast<long>(sf);

  if (wantTable(tables, "nation")) {
    FILE* f = openOut(outdir, "nation");
    sd_nation(NATION, 0, &ctx);
    code_t code;
    for (long i = 0; i < 25; ++i) {
      row_start(NATION, &ctx);
      mk_nation(i + 1, &code, &ctx);
      row_stop_h(NATION, &ctx);
      std::fprintf(
          f,
          "%lld|%s|%ld|%.*s\n",
          (long long)code.code,
          code.text,
          code.join,
          code.clen,
          code.comment);
    }
    std::fclose(f);
  }

  if (wantTable(tables, "region")) {
    FILE* f = openOut(outdir, "region");
    sd_region(REGION, 0, &ctx);
    code_t code;
    for (long i = 0; i < 5; ++i) {
      row_start(REGION, &ctx);
      mk_region(i + 1, &code, &ctx);
      row_stop_h(REGION, &ctx);
      std::fprintf(
          f,
          "%lld|%s|%.*s\n",
          (long long)code.code,
          code.text,
          code.clen,
          code.comment);
    }
    std::fclose(f);
  }

  if (wantTable(tables, "supplier")) {
    FILE* f = openOut(outdir, "supplier");
    sd_supp(SUPP, 0, &ctx);
    supplier_t supp;
    long n = rowCount(10000, sf);
    for (long i = 0; i < n; ++i) {
      row_start(SUPP, &ctx);
      mk_supp(i + 1, &supp, &ctx);
      row_stop_h(SUPP, &ctx);
      std::fprintf(
          f,
          "%lld|%s|%.*s|%lld|%s|%lld|%.*s\n",
          (long long)supp.suppkey,
          supp.name,
          supp.alen,
          supp.address,
          (long long)supp.nation_code,
          supp.phone,
          (long long)supp.acctbal,
          supp.clen,
          supp.comment);
    }
    std::fclose(f);
  }

  if (wantTable(tables, "customer")) {
    FILE* f = openOut(outdir, "customer");
    sd_cust(CUST, 0, &ctx);
    customer_t cust;
    long n = rowCount(150000, sf);
    for (long i = 0; i < n; ++i) {
      row_start(CUST, &ctx);
      mk_cust(i + 1, &cust, &ctx);
      row_stop_h(CUST, &ctx);
      std::fprintf(
          f,
          "%lld|%s|%.*s|%lld|%s|%lld|%s|%.*s\n",
          (long long)cust.custkey,
          cust.name,
          cust.alen,
          cust.address,
          (long long)cust.nation_code,
          cust.phone,
          (long long)cust.acctbal,
          cust.mktsegment,
          cust.clen,
          cust.comment);
    }
    std::fclose(f);
  }

  bool wantPart = wantTable(tables, "part");
  bool wantPsupp = wantTable(tables, "partsupp");
  if (wantPart || wantPsupp) {
    FILE* fp = wantPart ? openOut(outdir, "part") : nullptr;
    FILE* fps = wantPsupp ? openOut(outdir, "partsupp") : nullptr;
    sd_part(PART, 0, &ctx);
    sd_psupp(PSUPP, 0, &ctx);
    part_t part;
    long n = rowCount(200000, sf);
    for (long i = 0; i < n; ++i) {
      row_start(PART, &ctx);
      mk_part(i + 1, &part, &ctx);
      row_stop_h(PART, &ctx);
      if (fp) {
        std::fprintf(
            fp,
            "%lld|%.*s|%s|%s|%.*s|%lld|%s|%lld|%.*s\n",
            (long long)part.partkey,
            part.nlen,
            part.name,
            part.mfgr,
            part.brand,
            part.tlen,
            part.type,
            (long long)part.size,
            part.container,
            (long long)part.retailprice,
            part.clen,
            part.comment);
      }
      if (fps) {
        for (long s = 0; s < SUPP_PER_PART; ++s) {
          const partsupp_t& ps = part.s[s];
          std::fprintf(
              fps,
              "%lld|%lld|%lld|%lld|%.*s\n",
              (long long)ps.partkey,
              (long long)ps.suppkey,
              (long long)ps.qty,
              (long long)ps.scost,
              ps.clen,
              ps.comment);
        }
      }
    }
    if (fp) {
      std::fclose(fp);
    }
    if (fps) {
      std::fclose(fps);
    }
  }

  bool wantOrders = wantTable(tables, "orders");
  bool wantLine = wantTable(tables, "lineitem");
  if (wantOrders || wantLine) {
    FILE* fo = wantOrders ? openOut(outdir, "orders") : nullptr;
    FILE* fl = wantLine ? openOut(outdir, "lineitem") : nullptr;
    sd_order(ORDER, 0, &ctx);
    sd_line(LINE, 0, &ctx);
    order_t order;
    long n = rowCount(1500000, sf);
    for (long i = 0; i < n; ++i) {
      row_start(ORDER, &ctx);
      mk_order(i + 1, &order, &ctx, 0);
      row_stop_h(ORDER, &ctx);
      if (fo) {
        std::fprintf(
            fo,
            "%lld|%lld|%c|%lld|%s|%s|%s|%ld|%.*s\n",
            (long long)order.okey,
            (long long)order.custkey,
            order.orderstatus,
            (long long)order.totalprice,
            order.odate,
            order.opriority,
            order.clerk,
            order.spriority,
            order.clen,
            order.comment);
      }
      if (fl) {
        for (long l = 0; l < order.lines; ++l) {
          const line_t& line = order.l[l];
          std::fprintf(
              fl,
              "%lld|%lld|%lld|%lld|%lld|%lld|%lld|%lld|%c|%c|%s|%s|%s|%s|%s|%.*s\n",
              (long long)line.okey,
              (long long)line.partkey,
              (long long)line.suppkey,
              (long long)line.lcnt,
              (long long)line.quantity,
              (long long)line.eprice,
              (long long)line.discount,
              (long long)line.tax,
              line.rflag[0],
              line.lstatus[0],
              line.sdate,
              line.cdate,
              line.rdate,
              line.shipinstruct,
              line.shipmode,
              line.clen,
              line.comment);
        }
      }
    }
    if (fo) {
      std::fclose(fo);
    }
    if (fl) {
      std::fclose(fl);
    }
  }

  cleanup_dists();
  return 0;
}
