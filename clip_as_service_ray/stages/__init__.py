"""Ray Data stages: per-batch transforms and grouped merges."""
