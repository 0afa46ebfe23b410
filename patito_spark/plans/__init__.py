"""Plan compilation: single-pass check aggregation, uniqueness, stats, runner."""
