"""Training stack: optimiser/schedule, jitted sharded train step,
checkpointing and the epoch driver."""
