"""Spectroscopy namespace (reference src/sasktran2/spectroscopy: empty
placeholder module)."""
