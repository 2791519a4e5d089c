"""Plan IR + fluent PlanBuilder.

Analog of velox/core (PlanNode hierarchy velox/core/PlanNode.h:175) and the
test-utils PlanBuilder (velox/exec/tests/utils/PlanBuilder.h:92), which in
this engine is a first-class embedding API rather than test scaffolding.
"""

from velox_tpu.plan.nodes import (
    PlanNode, ValuesNode, TableScanNode, FilterNode, ProjectNode,
    AggregationNode, AggregateSpec, OrderByNode, TopNNode, LimitNode,
    HashJoinNode, CrossJoinNode, AggStep, JoinType, SortField,
    LocalPartitionNode, UnnestNode, AssignUniqueIdNode, WindowNode,
    WindowSpec, RowNumberNode, TopNRowNumberNode, ExchangeNode,
    MergeJoinNode, EnforceSingleRowNode, MarkDistinctNode, ExpandNode,
    GroupIdNode,
)
from velox_tpu.plan.builder import PlanBuilder

__all__ = [
    "PlanNode", "ValuesNode", "TableScanNode", "FilterNode", "ProjectNode",
    "AggregationNode", "AggregateSpec", "OrderByNode", "TopNNode",
    "LimitNode", "HashJoinNode", "CrossJoinNode", "AggStep", "JoinType",
    "SortField", "LocalPartitionNode", "UnnestNode", "AssignUniqueIdNode",
    "WindowNode", "WindowSpec", "RowNumberNode", "TopNRowNumberNode",
    "ExchangeNode", "MergeJoinNode", "EnforceSingleRowNode",
    "MarkDistinctNode", "ExpandNode", "GroupIdNode", "PlanBuilder",
]
