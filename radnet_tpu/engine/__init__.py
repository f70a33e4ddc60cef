"""Training engine: fused jitted steps, state, checkpointing, loops."""
