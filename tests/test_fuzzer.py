"""Differential fuzzing (velox scheduled fuzzer CI analog, short budget)."""

import pytest

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


def test_join_fuzz():
    from velox_tpu.fuzzer.join_fuzzer import run_join_fuzz

    run_join_fuzz(iterations=15, seed=21)


def test_aggregation_fuzz():
    from velox_tpu.fuzzer.aggregation_fuzzer import run_aggregation_fuzz

    run_aggregation_fuzz(iterations=20, seed=22)


def test_window_fuzz():
    from velox_tpu.fuzzer.window_fuzzer import run_window_fuzz

    run_window_fuzz(iterations=10, seed=23)


@pytest.mark.nightly
def test_join_fuzz_nightly():
    from velox_tpu.fuzzer.join_fuzzer import run_join_fuzz

    run_join_fuzz(iterations=100, seed=101)


@pytest.mark.nightly
def test_aggregation_fuzz_nightly():
    from velox_tpu.fuzzer.aggregation_fuzzer import run_aggregation_fuzz

    run_aggregation_fuzz(iterations=120, seed=102)


@pytest.mark.nightly
def test_window_fuzz_nightly():
    from velox_tpu.fuzzer.window_fuzzer import run_window_fuzz

    run_window_fuzz(iterations=100, seed=103)


def test_exchange_fuzz():
    from velox_tpu.fuzzer.exchange_fuzzer import run_exchange_fuzz

    run_exchange_fuzz(iterations=15, seed=24)


@pytest.mark.nightly
def test_exchange_fuzz_nightly():
    from velox_tpu.fuzzer.exchange_fuzzer import run_exchange_fuzz

    run_exchange_fuzz(iterations=120, seed=104)


def test_distributed_fuzz():
    from velox_tpu.fuzzer.distributed_fuzzer import run_distributed_fuzz

    run_distributed_fuzz(iterations=8, seed=25)


@pytest.mark.nightly
def test_distributed_fuzz_nightly():
    from velox_tpu.fuzzer.distributed_fuzzer import run_distributed_fuzz

    run_distributed_fuzz(iterations=60, seed=105)
