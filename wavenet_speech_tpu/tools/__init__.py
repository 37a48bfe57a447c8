"""Offline data-preparation tools (reference utils/dump_distributions.py, utils/dump_durations_from_eventalign.py)."""
