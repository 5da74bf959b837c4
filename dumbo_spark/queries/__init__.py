"""Per-family query registration modules (split from registry.py,
r13). Import dumbo_spark.registry, not these, for the public
surface; importing a family module registers that family plus any
families it borrows shared oracle-SQL helpers from (compat_pack
imports dedup_sim; distribution imports compat_pack and dedup_sim),
so only registry.py guarantees the full ordered set."""
