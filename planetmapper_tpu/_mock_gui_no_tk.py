"""
Graceful degradation when tkinter is unavailable: importing the package
still works, and any GUI access raises an informative error (parity with
planetmapper/_mock_gui_no_tk.py).
"""

from __future__ import annotations

from typing import Callable, NoReturn

ERROR_MESSAGE = (
    'The "tkinter" package is not included in your Python installation, so '
    'planetmapper_tpu cannot create a graphical user interface. '
    'See https://docs.python.org/3/library/tkinter.html for more information.'
)


def raise_tkinter_import_error(parent_exception: ImportError) -> NoReturn:
    """Raise an informative error when the GUI is used without tkinter."""
    if (
        isinstance(parent_exception, ImportError)
        and parent_exception.name is not None
        and 'tkinter' in parent_exception.name
    ):
        raise ModuleNotFoundError(
            ERROR_MESSAGE, name='tkinter'
        ) from parent_exception
    raise parent_exception


class _MockGUIModuleClass:
    """
    Stand-in for the gui module when tkinter is missing: any attribute
    access raises the informative tkinter error, so the rest of the package
    remains fully usable.
    """

    def __init__(self, parent_exception: ImportError) -> None:
        self._parent_exception = parent_exception

    def __getattr__(self, name) -> NoReturn:
        raise_tkinter_import_error(self._parent_exception)


def get_mocks(
    parent_exception: ImportError,
) -> tuple[_MockGUIModuleClass, Callable[..., NoReturn]]:
    """(mock gui module, mock run_gui) pair for package init."""

    def run_gui(*args, **kwargs) -> NoReturn:
        raise_tkinter_import_error(parent_exception)

    return _MockGUIModuleClass(parent_exception), run_gui
