"""Host-side utilities: image I/O, config, progress, checkpointing."""
