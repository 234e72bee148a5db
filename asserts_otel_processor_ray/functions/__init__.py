"""Pure scalar / vectorized helper functions (no Ray dependency)."""
