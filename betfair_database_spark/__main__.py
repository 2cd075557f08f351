"""``python -m betfair_database_spark`` → the CLI (reference __main__.py)."""

import sys

from betfair_database_spark.cli import main

sys.exit(main())
