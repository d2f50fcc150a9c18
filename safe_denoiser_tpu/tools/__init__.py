"""Misc tooling (reference mics/ + data/ scripts): log parsing, data prep,
result organization, image grids, CSV conversion."""
