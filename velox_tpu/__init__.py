"""velox_tpu — a TPU-native vectorized query-execution engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
facebookincubator/velox (reference mounted at /root/reference): columnar
device batches in HBM, a mask-aware vectorized expression engine, relational
operators (FilterProject, HashAggregation, hash joins, OrderBy/TopN) as
XLA/Pallas kernels, and a hash-partitioned distributed shuffle over a
jax.sharding.Mesh (ICI collectives instead of Velox's ExchangeSource/
OutputBufferManager protocol).

Layer map (mirrors SURVEY.md §1, bottom-up):
  types/     — logical types, filter pushdown        (velox/type)
  vector/    — device columns/batches, Arrow bridge  (velox/vector, buffer)
  expr/      — expression IR + compiler to XLA       (velox/expression)
  functions/ — Presto-semantics scalar + aggregate fns (velox/functions)
  plan/      — PlanNode IR + PlanBuilder             (velox/core)
  exec/      — operators, pipelines, Task driver     (velox/exec)
  ops/       — device kernels: hash agg, join, sort, compaction, partition
  parallel/  — mesh, distributed shuffle, SPMD runner
  io/        — TPC-H datagen, Parquet/Arrow ingest   (velox/tpch, dwio)
  utils/     — config, metrics                       (velox/common)
"""

import os

import jax

# The engine computes BIGINT/DECIMAL lanes in int64 and DOUBLE in float64
# (Presto semantics demand 64-bit integer/floating behavior, velox/type/
# DecimalUtil.h). Enable x64 before any tracing happens.
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: some backends (tunneled TPUs) compile
# certain 64-bit programs pathologically slowly; cache once per machine.
# The directory is scoped by a CPU-feature fingerprint: XLA:CPU AOT
# artifacts compiled on a host with different ISA features load but can
# SIGILL/SEGV at run time (fleet machines differ across sessions).


def _machine_fingerprint() -> str:
    import hashlib
    import platform

    probe = platform.machine() + platform.python_version()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    probe += line
                    break
    except OSError:
        pass
    try:
        import jaxlib

        probe += jaxlib.__version__
    except Exception:
        pass
    return hashlib.sha1(probe.encode()).hexdigest()[:12]


# OPT-IN only (VELOX_TPU_COMPILE_CACHE=1 or =<dir>): long test runs hit
# aborts/segfaults inside the cache's compile-and-write path on this jax
# build, and the tunneled TPU backend compiles server-side where the
# local cache never hits anyway (BASELINE.md notes).
_cache_env = os.environ.get("VELOX_TPU_COMPILE_CACHE", "")
_cache_dir = ""
if _cache_env == "1":
    _cache_dir = os.path.expanduser(
        f"~/.velox_tpu_xla_cache/{_machine_fingerprint()}")
elif _cache_env:
    _cache_dir = _cache_env
if _cache_dir:
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the knobs
        pass

__version__ = "0.1.0"
