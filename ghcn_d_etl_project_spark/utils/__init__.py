"""Driver-side utilities (config loading)."""
