from toyocr_spark.plans.partitioning import hot_hosts, salted_repartition, with_host

__all__ = ["hot_hosts", "salted_repartition", "with_host"]
