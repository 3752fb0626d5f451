"""End-to-end pipelines: index build, search, and the golden oracle."""
