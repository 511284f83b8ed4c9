"""Runtime layer: config system, program registry, sharded inference driver,
checkpointing, and observability."""
