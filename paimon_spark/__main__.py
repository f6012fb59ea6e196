"""`python -m paimon_spark` entry point (ref: pypaimon's console CLI).

The __name__ guard is load-bearing: streaming.datasource.register()
imports every package module to locate DataSource classes, and that
import must not execute the CLI."""

if __name__ == "__main__":
    import sys

    from paimon_spark.cli import main

    sys.exit(main())
