"""Pipeline stages: batch transforms over zero-copy Arrow blocks."""
