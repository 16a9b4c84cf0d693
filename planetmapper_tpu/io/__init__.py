"""I/O subsystem: self-contained FITS reading/writing and celestial WCS."""
