"""`python -m paimon_spark` entry point (ref: pypaimon's console CLI)."""
import sys

from paimon_spark.cli import main

sys.exit(main())
