"""
Graphical user interface for interactively fitting observations.

Parity with the reference's tkinter GUI (planetmapper/gui.py): a plot of
the observation with a live wireframe overlay, keyboard shortcuts for
adjusting the disc parameters, automatic disc-finding routines, a
coordinate readout on click, and open/save dialogs with progress reporting
and cancellation (via an exception raised from the progress hook).

Because backplane generation is effectively instant on the batched device
pipeline, the GUI's plot updates simply redraw the wireframe through the
mutable matplotlib transforms - the reference's carefully blitted artists
are not needed for responsiveness.
"""

from __future__ import annotations

import os
import sys
import threading
import traceback
from typing import Any, Callable

import numpy as np

try:
    import tkinter as tk
    from tkinter import filedialog, messagebox, ttk
except ImportError as exc:  # pragma: no cover - depends on environment
    from ._mock_gui_no_tk import raise_tkinter_import_error

    raise_tkinter_import_error(exc)

import matplotlib.pyplot as plt
from matplotlib.backends.backend_tkagg import (
    FigureCanvasTkAgg,
    NavigationToolbar2Tk,
)
from matplotlib.figure import Figure

from . import common
from .observation import Observation

DEFAULT_PLOT_SETTINGS: dict[str, dict[str, Any]] = {
    'image': dict(cmap='inferno'),
    'limb': dict(color='w', linewidth=0.5),
    'limb_illuminated': dict(color='w'),
    'terminator': dict(color='w', linestyle='--'),
    'grid': dict(color='silver', linestyle=':', alpha=0.5),
    'ring': dict(color='w', linewidth=0.5),
    'pole': dict(color='w'),
}


def _maybe_switch_matplotlib_backend_to_tkagg() -> None:
    backend = plt.get_backend().lower()
    if 'tkagg' not in backend:
        try:
            plt.switch_backend('TkAgg')
        except Exception:  # pragma: no cover - depends on environment
            pass


def run_gui(file_path: str | None = None) -> None:
    """
    Launch the GUI, optionally opening a FITS file immediately. See also
    :func:`Observation.run_gui` to interactively fit an existing
    observation.
    """
    _run_gui_from_cli(file_path)


def _run_gui_from_cli(file_path: str | None) -> None:
    _maybe_switch_matplotlib_backend_to_tkagg()
    gui = GUI()
    if file_path is not None:
        gui.set_observation(Observation(file_path))
    gui.run()


class CancelSave(Exception):
    """Raised from the progress hook to abort an in-progress save."""


class GUI:
    """
    Main planetmapper_tpu user interface window.

    Keyboard shortcuts (matching the reference): arrow keys pan the disc,
    ``+``/``-`` resize it, ``,``/``.`` rotate it, and the step size is
    adjustable from the toolbar.
    """

    def __init__(self, allow_open: bool = True) -> None:
        _maybe_switch_matplotlib_backend_to_tkagg()
        self.allow_open = allow_open
        self.observation: Observation | None = None
        self.click_locations: list[tuple[float, float]] = []
        self.step_size = 1.0
        self.plot_settings = {
            k: dict(v) for k, v in DEFAULT_PLOT_SETTINGS.items()
        }
        self.root: tk.Tk | None = None
        self._help_hint = (
            'Arrows: move disc | +/-: resize | ,/.: rotate | '
            'click: read coordinates'
        )

    # ------------------------------------------------------------------
    def set_observation(self, observation: Observation) -> None:
        """Set the observation to fit (modified in place by the GUI)."""
        self.observation = observation
        self.click_locations = []

    def get_observation(self) -> Observation:
        if self.observation is None:
            raise ValueError('No observation loaded')
        return self.observation

    # ------------------------------------------------------------------
    def run(self) -> None:
        """Build the interface and enter the tk main loop."""
        if self.observation is None and not self.allow_open:
            raise ValueError('No observation to run GUI with')
        self.root = tk.Tk()
        self.root.title(f'planetmapper_tpu {common.__version__}')
        try:
            from ._assets import get_gui_icon_path

            icon_path = get_gui_icon_path()
            if os.path.exists(icon_path):
                self.root.iconphoto(True, tk.PhotoImage(file=icon_path))
        except Exception:
            pass
        self.build_gui()
        if self.observation is None:
            self.root.after(50, self.open_observation)
        self.root.mainloop()

    def close(self) -> None:
        if self.root is not None:
            self.root.destroy()
            self.root = None

    # ------------------------------------------------------------------
    def build_gui(self) -> None:
        assert self.root is not None
        root = self.root

        self.controls = ttk.Frame(root)
        self.controls.pack(side='left', fill='y', padx=4, pady=4)

        # -- buttons ----------------------------------------------------
        if self.allow_open:
            ttk.Button(
                self.controls, text='Open...', command=self.open_observation
            ).pack(fill='x', pady=2)
        ttk.Button(
            self.controls, text='Save...', command=self.save_observation
        ).pack(fill='x', pady=2)

        ttk.Separator(self.controls).pack(fill='x', pady=4)
        ttk.Label(self.controls, text='Disc finding').pack()
        for label, command in self._disc_finding_routines():
            ttk.Button(self.controls, text=label, command=command).pack(
                fill='x', pady=1
            )

        ttk.Separator(self.controls).pack(fill='x', pady=4)
        ttk.Label(self.controls, text='Disc parameters').pack()
        self.param_vars: dict[str, tk.StringVar] = {}
        for name in ('x0', 'y0', 'r0', 'rotation'):
            frame = ttk.Frame(self.controls)
            frame.pack(fill='x')
            ttk.Label(frame, text=name, width=8).pack(side='left')
            var = tk.StringVar()
            self.param_vars[name] = var
            entry = ttk.Entry(frame, textvariable=var, width=12)
            entry.pack(side='left')
            entry.bind(
                '<Return>', lambda event, n=name: self._set_param_from_entry(n)
            )

        frame = ttk.Frame(self.controls)
        frame.pack(fill='x', pady=4)
        ttk.Label(frame, text='step', width=8).pack(side='left')
        self.step_var = tk.StringVar(value=str(self.step_size))
        step_entry = ttk.Entry(frame, textvariable=self.step_var, width=12)
        step_entry.pack(side='left')
        step_entry.bind('<Return>', lambda event: self._set_step_size())

        ttk.Separator(self.controls).pack(fill='x', pady=4)
        self.readout = tk.Text(self.controls, width=28, height=14)
        self.readout.pack(fill='both', expand=True)
        self._set_readout(self._help_hint)

        # -- plot -------------------------------------------------------
        plot_frame = ttk.Frame(root)
        plot_frame.pack(side='right', fill='both', expand=True)
        self.figure = Figure(figsize=(6, 6))
        self.ax = self.figure.add_subplot(111)
        self.canvas = FigureCanvasTkAgg(self.figure, master=plot_frame)
        self.canvas.get_tk_widget().pack(fill='both', expand=True)
        try:
            NavigationToolbar2Tk(self.canvas, plot_frame)
        except Exception:
            pass

        self.canvas.mpl_connect('button_press_event', self._on_click)
        root.bind('<Key>', self._on_keypress)

        if self.observation is not None:
            self.update_plot()
        self.update_param_entries()

    def _disc_finding_routines(self) -> list[tuple[str, Callable[[], None]]]:
        return [
            ('Reset disc', self._wrap_disc_routine('reset_disc_params')),
            ('Centre disc', self._wrap_disc_routine('centre_disc')),
            ('Disc from WCS', self._wrap_disc_routine('disc_from_wcs')),
            ('Fit position', self._wrap_disc_routine('fit_disc_position')),
            ('Fit radius', self._wrap_disc_routine('fit_disc_radius')),
            (
                'Fit (gradient)',
                self._wrap_disc_routine('_fit_disc_gradient_routine'),
            ),
            (
                'North up',
                self._wrap_disc_routine('rotate_north_to_top'),
            ),
        ]

    def _wrap_disc_routine(self, method_name: str) -> Callable[[], None]:
        def command() -> None:
            if self.observation is None:
                return
            try:
                if method_name == '_fit_disc_gradient_routine':
                    from .parallel.fit import fit_disc_gradient

                    fit_disc_gradient(self.observation)
                else:
                    getattr(self.observation, method_name)()
            except Exception as exc:
                self._set_readout(f'Error: {exc}')
                return
            self.update_param_entries()
            self.update_plot()

        return command

    # ------------------------------------------------------------------
    # Event handling
    # ------------------------------------------------------------------
    def _set_step_size(self) -> None:
        try:
            self.step_size = float(self.step_var.get())
        except ValueError:
            self.step_var.set(str(self.step_size))

    def _set_param_from_entry(self, name: str) -> None:
        if self.observation is None:
            return
        try:
            value = float(self.param_vars[name].get())
            getattr(self.observation, f'set_{name}')(value)
        except ValueError as exc:
            self._set_readout(f'Error: {exc}')
        self.update_param_entries()
        self.update_plot()

    def _on_keypress(self, event) -> None:
        if self.observation is None:
            return
        obs = self.observation
        step = self.step_size
        key = event.keysym
        actions: dict[str, Callable[[], None]] = {
            'Left': lambda: obs.adjust_disc_params(dx=-step),
            'Right': lambda: obs.adjust_disc_params(dx=step),
            'Up': lambda: obs.adjust_disc_params(dy=step),
            'Down': lambda: obs.adjust_disc_params(dy=-step),
            'plus': lambda: obs.adjust_disc_params(dr=step),
            'equal': lambda: obs.adjust_disc_params(dr=step),
            'minus': lambda: obs.adjust_disc_params(dr=-step),
            'comma': lambda: obs.adjust_disc_params(drotation=-step),
            'period': lambda: obs.adjust_disc_params(drotation=step),
        }
        action = actions.get(key)
        if action is None:
            return
        try:
            action()
        except ValueError as exc:
            self._set_readout(f'Error: {exc}')
            return
        self.update_param_entries()
        self.update_plot()

    def _on_click(self, event) -> None:
        if self.observation is None or event.inaxes is not self.ax:
            return
        if event.xdata is None or event.ydata is None:
            return
        x, y = float(event.xdata), float(event.ydata)
        self.click_locations.append((x, y))
        self._set_readout(self.format_click_readout(x, y))

    def format_click_readout(self, x: float, y: float) -> str:
        """Coordinate readout (incl. backplane values) for a clicked pixel."""
        obs = self.get_observation()
        lines = [f'x, y = {x:.2f}, {y:.2f}']
        ra, dec = obs.xy2radec(x, y)
        lines.append(f'RA = {ra:.6f}')
        lines.append(f'Dec = {dec:.6f}')
        lon, lat = obs.xy2lonlat(x, y)
        if np.isfinite(lon):
            lines.append(f'lon = {lon:.3f}')
            lines.append(f'lat = {lat:.3f}')
            ix = int(round(x))
            iy = int(round(y))
            nx, ny = obs.get_img_size()
            if 0 <= ix < nx and 0 <= iy < ny:
                for name in (
                    'EMISSION', 'INCIDENCE', 'PHASE', 'LOCAL-SOLAR-TIME',
                    'DISTANCE',
                ):
                    try:
                        value = float(obs.get_backplane_img(name)[iy, ix])
                        lines.append(f'{name} = {value:.4f}')
                    except Exception:
                        pass
        else:
            lines.append('(not on disc)')
        return '\n'.join(lines)

    def _set_readout(self, text: str) -> None:
        if getattr(self, 'readout', None) is None:
            return
        self.readout.delete('1.0', 'end')
        self.readout.insert('1.0', text)

    # ------------------------------------------------------------------
    # Plot
    # ------------------------------------------------------------------
    def update_param_entries(self) -> None:
        if self.observation is None or not getattr(self, 'param_vars', None):
            return
        x0, y0, r0, rotation = self.observation.get_disc_params()
        for name, value in zip(
            ('x0', 'y0', 'r0', 'rotation'), (x0, y0, r0, rotation)
        ):
            self.param_vars[name].set(f'{value:.4f}')

    def update_plot(self) -> None:
        """Redraw the observation image and wireframe overlay."""
        if self.observation is None:
            return
        obs = self.observation
        self.ax.clear()
        img = np.nansum(obs.data, axis=0)
        self.ax.imshow(
            img, origin='lower', **self.plot_settings.get('image', {})
        )
        formatting = {
            k: v for k, v in self.plot_settings.items() if k != 'image'
        }
        try:
            obs.plot_wireframe_xy(
                ax=self.ax,
                add_axis_labels=False,
                add_title=False,
                formatting=formatting,  # type: ignore[arg-type]
            )
        except Exception:  # keep GUI responsive if the wireframe fails
            traceback.print_exc()
        self.ax.set_xlim(-0.5, obs.get_img_size()[0] - 0.5)
        self.ax.set_ylim(-0.5, obs.get_img_size()[1] - 0.5)
        self.canvas.draw_idle()

    # ------------------------------------------------------------------
    # Open / save popups
    # ------------------------------------------------------------------
    def open_observation(self) -> None:
        if not self.allow_open:
            return
        path = filedialog.askopenfilename(
            title='Open observation',
            filetypes=[
                ('FITS files', '*.fits *.fits.gz'),
                ('Images', '*.png *.jpg *.jpeg'),
                ('All files', '*'),
            ],
        )
        if not path:
            return
        try:
            kwargs: dict[str, Any] = {}
            if not any(
                path.endswith(ext)
                for ext in Observation.FITS_FILE_EXTENSIONS
            ):
                target = _ask_string('Target body (e.g. jupiter):')
                utc = _ask_string('Observation time (UTC):')
                kwargs = dict(target=target, utc=utc)
            self.set_observation(Observation(path, **kwargs))
        except Exception as exc:
            messagebox.showerror('Error opening file', str(exc))
            return
        self.update_param_entries()
        self.update_plot()

    def save_observation(self) -> None:
        if self.observation is None:
            return
        path = filedialog.asksaveasfilename(
            title='Save navigated observation',
            defaultextension='.fits',
            initialfile=self.observation.make_filename(),
        )
        if not path:
            return
        SavingProgressWindow(self, path).start()


def _ask_string(prompt: str) -> str:
    from tkinter import simpledialog

    value = simpledialog.askstring('planetmapper_tpu', prompt)
    return value or ''


class SavingProgressWindow:
    """
    Modal progress window for save operations: runs the save on a worker
    thread, maps progress-hook events to a progress bar, and cancels by
    raising :class:`CancelSave` from the hook (the same mechanism as the
    reference, gui.py:3382-3506).
    """

    def __init__(self, gui: GUI, path: str) -> None:
        self.gui = gui
        self.path = path
        self.cancelled = False
        self.window: tk.Toplevel | None = None
        self.progress_value = 0.0

    def start(self) -> None:
        assert self.gui.root is not None
        self.window = tk.Toplevel(self.gui.root)
        self.window.title('Saving...')
        ttk.Label(self.window, text=f'Saving to {self.path}').pack(
            padx=10, pady=5
        )
        self.bar = ttk.Progressbar(
            self.window, maximum=1.0, length=300, mode='determinate'
        )
        self.bar.pack(padx=10, pady=5)
        ttk.Button(self.window, text='Cancel', command=self.cancel).pack(
            pady=5
        )
        thread = threading.Thread(target=self._save_worker, daemon=True)
        thread.start()
        self._poll()

    def cancel(self) -> None:
        self.cancelled = True

    def _progress_hook(self, progress: float, stack: list[str]) -> None:
        if self.cancelled:
            raise CancelSave()
        self.progress_value = progress

    def _save_worker(self) -> None:
        obs = self.gui.get_observation()
        obs._set_progress_hook(self._progress_hook)  # type: ignore[arg-type]
        try:
            obs.save_observation(self.path, print_info=False)
            self.error: Exception | None = None
        except CancelSave:
            self.error = None
            try:
                if os.path.exists(self.path):
                    os.remove(self.path)
            except OSError:
                pass
        except Exception as exc:  # pragma: no cover - unexpected I/O errors
            self.error = exc
        finally:
            obs._remove_progress_hook()
            self.finished = True

    finished = False
    error: Exception | None = None

    def _poll(self) -> None:
        if self.window is None:
            return
        self.bar['value'] = self.progress_value
        if self.finished:
            if self.error is not None:
                messagebox.showerror('Error saving file', str(self.error))
            self.window.destroy()
            self.window = None
            return
        self.window.after(100, self._poll)
