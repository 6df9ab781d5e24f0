"""Sources/sinks: the synthetic audio+transcript table generator, the
Iceberg-or-parquet catalog abstraction, and stage checkpointing."""
