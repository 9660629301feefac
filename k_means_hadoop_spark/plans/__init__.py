from k_means_hadoop_spark.plans.inspect import n_nodes, plan_of, pushed_filters

__all__ = ["plan_of", "n_nodes", "pushed_filters"]
