"""File sources: discovery/classification, metadata JSON parsing, stream
definition extraction, bulk metadata. All are DataFrame-producing and scale
with partition count — no driver-side per-file loops."""
