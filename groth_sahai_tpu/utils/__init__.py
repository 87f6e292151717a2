"""RNG, serialization, misc utilities."""
