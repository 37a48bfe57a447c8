"""Attic: honest negative results kept for reference, NOT wired into any
default or recommended path. Each module documents its measurement and why
it lost; see RESULTS.md for the numbers."""
