"""Exception types matching the reference's observable error surface
(reference: betfairdatabase/exceptions.py:1-44)."""

from __future__ import annotations

from pathlib import Path


class BetfairDatabaseError(Exception):
    """Base exception for the engine."""


class DatabaseDirectoryError(BetfairDatabaseError):
    """Database directory does not exist or is not a directory."""


class IndexMissingError(BetfairDatabaseError):
    """The database index is missing in the target directory."""

    def __init__(self, target_dir: str | Path):
        super().__init__(
            f"Betfair database index not found in '{target_dir}'."
            " Index the database, then try again."
        )


class IndexExistsError(BetfairDatabaseError):
    """The database index already exists in the target directory."""

    def __init__(self, target_dir: str | Path, extra: str = ""):
        self.base_msg = f"Betfair database index already exists in '{target_dir}'."
        super().__init__(self.base_msg + extra)


class MarketDefinitionMissingError(BetfairDatabaseError):
    """A market data file contains no market definition."""

    def __init__(self, market_data_file: str | Path):
        super().__init__(f"Market definition not found in '{market_data_file}'.")
