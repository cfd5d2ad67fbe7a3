"""Host-side utilities: config, reporting, checkpointing, profiling."""
