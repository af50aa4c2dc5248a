"""``python -m tajo_spark`` → the tsql-parity shell (cli.py)."""

from tajo_spark.cli import main

raise SystemExit(main())
