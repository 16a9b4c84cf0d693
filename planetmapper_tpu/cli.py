"""
Command line interface (parity with the reference's console script).

``planetmapper-tpu [file]`` launches the GUI, optionally opening an
observation immediately; ``--version`` prints the version. The extra
``--precision`` flag selects the fused-pipeline numeric mode.
"""

from __future__ import annotations

import argparse


def main(args: list[str] | None = None) -> None:
    """CLI entry point. :meta private:"""
    from . import common

    parser = argparse.ArgumentParser(
        prog='planetmapper-tpu',
        description=(
            'planetmapper_tpu: a TPU-native package for visualising, '
            'navigating and mapping Solar System observations. Run with '
            'no arguments to launch the graphical interface.'
        ),
    )
    parser.add_argument(
        'file_path',
        nargs='?',
        default=None,
        help='open the GUI with this FITS/image file loaded',
    )
    parser.add_argument(
        '-v', '--version',
        action='version',
        version=f'planetmapper_tpu {common.__version__}',
        help='print the version number and exit',
    )
    parser.add_argument(
        '--precision',
        choices=('mixed', 'double'),
        default=None,
        help='numeric mode for the fused backplane pipeline',
    )
    options = parser.parse_args(args)

    if options.precision is not None:
        from . import pipeline

        pipeline.DEFAULT_PRECISION = options.precision

    print(f'Launching planetmapper_tpu {common.__version__}', flush=True)
    from . import gui

    gui._run_gui_from_cli(options.file_path)
