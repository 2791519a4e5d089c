"""IP functions (IPAddressFunctions.cpp) — VARCHAR-string representation."""

from velox_tpu.exec import run_plan
from velox_tpu.plan import PlanBuilder
from velox_tpu.types import VARCHAR
from velox_tpu.vector.batch import Batch


def _run(plan):
    return run_plan(plan.build()).to_pydict()


def test_ip_prefix_and_subnet_bounds():
    b = Batch.from_pydict(
        {"ip": ["10.1.2.3", "192.168.77.200", "2001:db8::8a2e:370:7334",
                "not-an-ip", None]},
        {"ip": VARCHAR})
    out = _run(PlanBuilder().values([b]).project(
        ["ip_prefix(ip, 24) AS p",
         "ip_subnet_min(ip_prefix(ip, 24)) AS lo",
         "ip_subnet_max(ip_prefix(ip, 24)) AS hi"]))
    assert out["p"] == ["10.1.2.0/24", "192.168.77.0/24",
                        "2001:d00::/24", None, None]
    assert out["lo"][0] == "10.1.2.0"
    assert out["hi"][1] == "192.168.77.255"


def test_is_subnet_of_with_literal_prefix():
    b = Batch.from_pydict(
        {"ip": ["10.0.0.9", "10.0.1.9", "10.0.0.255", "bad"]},
        {"ip": VARCHAR})
    out = _run(PlanBuilder().values([b]).project(
        ["is_subnet_of('10.0.0.0/24', ip) AS in24",
         "is_private_ip(ip) AS priv"]))
    assert out["in24"] == [True, False, True, None]
    assert out["priv"] == [True, True, True, None]


def test_is_subnet_of_prefix_prefix():
    b = Batch.from_pydict({"p": ["10.0.0.0/25", "10.0.1.0/25"]},
                          {"p": VARCHAR})
    out = _run(PlanBuilder().values([b]).project(
        ["is_subnet_of('10.0.0.0/24', p) AS s"]))
    assert out["s"] == [True, False]
