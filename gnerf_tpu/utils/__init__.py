"""Runtime infrastructure: configs, cameras, checkpoints, stats, misc."""
