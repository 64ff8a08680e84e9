"""Offline host-side utilities: calibration, video ingest.

These are pre-processing tools, not part of the device compute path
(SURVEY.md §2.3 N12: "calibration stays a host utility").
"""
