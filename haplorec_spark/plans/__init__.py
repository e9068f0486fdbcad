from haplorec_spark.plans.dependency import Dependency, DependencyGraph

__all__ = ["Dependency", "DependencyGraph"]
