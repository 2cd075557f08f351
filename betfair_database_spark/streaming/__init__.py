"""Structured Streaming ingestion of Betfair mcm stream files — the SURVEY §7
phase-5 extension that makes the *prices inside* the stream files queryable
(the reference only ever reads the last marketDefinition and leaves prices on
disk, SURVEY §2.9)."""
