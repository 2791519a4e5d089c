from velox_tpu.tpcds.queries import SUPPORTED_QUERIES, tpcds_plan

__all__ = ["tpcds_plan", "SUPPORTED_QUERIES"]
