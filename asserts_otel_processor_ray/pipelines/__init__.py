"""Pipeline composition and the pure-Python oracle."""
