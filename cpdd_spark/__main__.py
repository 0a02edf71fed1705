"""``python -m cpdd_spark`` entry point (R19/R11)."""

import sys

from cpdd_spark.cli import main

sys.exit(main())
