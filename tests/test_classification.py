"""Classification metric aggregates (ClassificationAggregation.cpp):
per-threshold precision/recall/miss_rate/fall_out over bucketized
prediction scores, verified against a sklearn-free numpy oracle."""

import numpy as np

from velox_tpu.exec import run_plan_pydict
from velox_tpu.plan import PlanBuilder
from velox_tpu.types import BIGINT, BOOLEAN, DOUBLE
from velox_tpu.vector.batch import Batch


def _oracle(outcome, pred, b):
    bucket = np.minimum((pred * b).astype(int), b - 1)
    tmat = np.zeros(b)
    fmat = np.zeros(b)
    for bk, o in zip(bucket, outcome):
        (tmat if o else fmat)[bk] += 1
    tp = np.cumsum(tmat[::-1])[::-1]
    fp = np.cumsum(fmat[::-1])[::-1]
    fn = tmat.sum() - tp
    tn = fmat.sum() - fp
    with np.errstate(divide="ignore", invalid="ignore"):
        return {
            "precision": np.nan_to_num(tp / (tp + fp)),
            "recall": np.nan_to_num(tp / (tp + fn)),
            "miss_rate": np.nan_to_num(fn / (tp + fn)),
            "fall_out": np.nan_to_num(fp / (fp + tn)),
        }


def test_classification_metrics_global():
    rng = np.random.default_rng(2)
    n = 1000
    outcome = rng.random(n) < 0.4
    # correlated score: positives skew high
    pred = np.clip(rng.normal(0.35 + 0.3 * outcome, 0.2), 0, 0.999)
    b = Batch.from_pydict(
        {"o": [bool(v) for v in outcome],
         "p": [float(v) for v in pred]},
        {"o": BOOLEAN, "p": DOUBLE})
    out = run_plan_pydict(
        PlanBuilder().values([b]).aggregate(
            [], ["classification_precision(10, o, p) AS pr",
                 "classification_recall(10, o, p) AS rc",
                 "classification_miss_rate(10, o, p) AS mr",
                 "classification_fall_out(10, o, p) AS fo",
                 "classification_thresholds(10, o, p) AS th"]).build())
    exp = _oracle(outcome, pred, 10)
    assert np.allclose(out["pr"][0], exp["precision"])
    assert np.allclose(out["rc"][0], exp["recall"])
    assert np.allclose(out["mr"][0], exp["miss_rate"])
    assert np.allclose(out["fo"][0], exp["fall_out"])
    assert out["th"][0] == [i / 10 for i in range(10)]


def test_classification_grouped():
    rng = np.random.default_rng(3)
    n = 600
    g = rng.integers(0, 3, n)
    outcome = rng.random(n) < 0.5
    pred = rng.random(n) * 0.999
    b = Batch.from_pydict(
        {"g": [int(v) for v in g],
         "o": [bool(v) for v in outcome],
         "p": [float(v) for v in pred]},
        {"g": BIGINT, "o": BOOLEAN, "p": DOUBLE})
    out = run_plan_pydict(
        PlanBuilder().values([b]).aggregate(
            ["g"], ["classification_recall(5, o, p) AS rc"])
        .order_by(["g"]).build())
    for i, gid in enumerate(sorted(set(int(v) for v in g))):
        m = g == gid
        exp = _oracle(outcome[m], pred[m], 5)["recall"]
        assert np.allclose(out["rc"][i], exp), (gid, out["rc"][i], exp)
