"""Differential fuzzing (velox scheduled fuzzer CI analog, short budget)."""

from velox_tpu.fuzzer import VectorFuzzer, run_expression_fuzz


def test_vector_fuzzer_shapes():
    vf = VectorFuzzer(seed=3, null_ratio=0.2)
    b = vf.batch({"a": "bigint", "x": "double", "s": "varchar",
                  "flag": "boolean", "d": "date"}, 100)
    assert b.selected_count() == 100
    assert b.columns["s"].dictionary is not None


def test_expression_fuzz_200():
    checked = run_expression_fuzz(iterations=200, seed=11, rows=48)
    assert checked >= 150  # most generated trees must be well-typed


def test_plan_fuzz():
    from velox_tpu.fuzzer.plan_fuzzer import run_plan_fuzz

    run_plan_fuzz(iterations=25, seed=7)
