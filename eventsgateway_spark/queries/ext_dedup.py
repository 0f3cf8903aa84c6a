"""Placeholder — populated in the EXT operators phase."""
