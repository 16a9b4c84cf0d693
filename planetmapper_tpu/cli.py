"""
Command line interface: launches the GUI (parity with planetmapper/cli.py).

Running ``planetmapper-tpu`` (or ``python -m planetmapper_tpu``) launches
the graphical interface, optionally opening a FITS file directly.
"""

from __future__ import annotations

import argparse


def main(args: list[str] | None = None) -> None:
    """CLI entry point. :meta private:"""
    parsed_args = _get_parser().parse_args(args)
    _run_gui(parsed_args.file_path)


def _get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog='planetmapper-tpu',
        description=(
            'planetmapper_tpu: a TPU-native package for visualising, '
            'navigating and mapping Solar System observations.'
        ),
        epilog=(
            'If no arguments are provided, the planetmapper_tpu GUI will be '
            'launched.'
        ),
        argument_default=argparse.SUPPRESS,
    )
    parser.add_argument(
        'file_path',
        nargs='?',
        type=str,
        help='launch the GUI with the specified FITS file open',
        default=None,
    )
    parser.add_argument(
        '-v',
        '--version',
        action='version',
        version=f'planetmapper_tpu {_get_version()}',
        help='print the version number and exit',
    )
    return parser


def _run_gui(file_path: str | None) -> None:
    print(f'Launching planetmapper_tpu {_get_version()}', flush=True)
    from . import gui

    gui._run_gui_from_cli(file_path)


def _get_version() -> str:
    from . import common

    return common.__version__
