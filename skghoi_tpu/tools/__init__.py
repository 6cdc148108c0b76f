"""Command-line entry points (train/test/cache/demo/bench tools)."""
