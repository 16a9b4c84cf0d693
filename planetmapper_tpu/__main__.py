"""Enable ``python -m planetmapper_tpu`` to run the CLI."""

from . import cli

cli.main()
