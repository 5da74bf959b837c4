"""Per-family query registration modules (split from registry.py,
r13). Import dumbo_spark.registry, not these, for the public
surface; importing a family module alone registers only that
family."""
