from etl_spark.sim.ann import brute_force_topk, hyperplane_bucket, lsh_topk

__all__ = ["brute_force_topk", "hyperplane_bucket", "lsh_topk"]
