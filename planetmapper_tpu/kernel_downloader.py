"""
SPICE kernel download utility (parity with planetmapper/kernel_downloader.py).

Mirrors the naif.jpl.nasa.gov URL tree into the local kernel directory
(:func:`planetmapper_tpu.set_kernel_path` controls the destination), with
index-page scraping, atomic temp-file downloads and tqdm progress.
"""

from __future__ import annotations

import os
import urllib.parse
import urllib.request

from . import utils
from .base import get_kernel_path

URL_ROOT = 'https://naif.jpl.nasa.gov/pub/'


def download_urls(*urls: str, **kwargs) -> None:
    """
    Download kernels (or index pages of kernels) from naif.jpl.nasa.gov and
    save them locally with the same directory structure.
    """
    for url in urls:
        path = urllib.parse.urlsplit(url).path
        if '.' in os.path.split(path)[1]:
            download_kernel(url, **kwargs)
        else:
            download_kernels_from_webpage(url, **kwargs)


def download_kernels_from_webpage(index_url: str, **kwargs) -> None:
    """Download all first-level kernels listed on an index page."""
    urls = get_kernel_paths_from_webpage(index_url)
    print(f'{len(urls)} to download from {index_url}')
    for idx, url in enumerate(urls):
        download_kernel(url, note=f'[{idx + 1}/{len(urls)}] ', **kwargs)
    print(f'All kernels downloaded from {index_url}')
    print()


def download_kernel(
    url: str, force_download: bool = False, note: str = ''
) -> None:
    """Download a single kernel (skipped if it already exists locally)."""
    kp = _get_kernel_path(url)
    print(f'{note}Checking {kp}')
    if _check_kernel_exists_locally(url):
        if force_download:
            print('  Kernel already exists, downloading anyway')
        else:
            print('  OK - Kernel already exists locally')
            return
    local_path = _convert_url_to_local_path(url)
    print(f'  Downloading to {local_path}')
    download_file(url, local_path)
    print('    Done')


def get_kernel_paths_from_webpage(index_url: str) -> list[str]:
    """
    Kernel URLs scraped from a naif.jpl.nasa.gov index page (fragile by
    nature - depends on the JPL page format).
    """
    assert index_url.startswith(URL_ROOT), f'URL must begin with {URL_ROOT}'
    webpage = urllib.request.urlopen(index_url).read().decode()
    data = webpage.split('<!--start data_content-->')[1].split('</table>')[0]
    lines = data.splitlines()
    paths = []
    for line in lines:
        if not line.startswith('<img src="/icons/'):
            continue
        href = line.split('<a href="')[1].split('"')[0]
        if '.' in href:
            paths.append(index_url + '/' + href)
    return paths


def _check_kernel_exists_locally(url: str) -> bool:
    return os.path.exists(_convert_url_to_local_path(url))


def _convert_url_to_local_path(url: str) -> str:
    assert url.startswith(URL_ROOT), f'URL must begin with {URL_ROOT}'
    return _kernel_path_to_local_path(_get_kernel_path(url))


def _standardise_path(p: str) -> str:
    return os.path.normpath(os.path.expanduser(p))


def _get_kernel_path(p: str) -> str:
    """
    The kernel-tree-relative part of a URL or local path, e.g. both
    ``https://naif.jpl.nasa.gov/pub/naif/generic_kernels/pck/`` and
    ``~/spice_kernels/naif/generic_kernels/pck/`` give
    ``naif/generic_kernels/pck``.
    """
    p = _standardise_path(p)
    for prefix in (URL_ROOT, get_kernel_path()):
        prefix = _standardise_path(prefix)
        if p.startswith(prefix):
            return _standardise_path(os.path.relpath(p, prefix))
    raise ValueError('Cannot get kernel path from "{}"'.format(p))


def _kernel_path_to_url(kp: str) -> str:
    return URL_ROOT + kp


def _kernel_path_to_local_path(kp: str) -> str:
    return _standardise_path(get_kernel_path() + os.path.sep + kp)


def download_file(url: str, local_path: str) -> None:
    """
    Download a file, writing to a temp path and atomically renaming so
    partial downloads never corrupt the kernel directory.
    """
    utils.check_path(local_path)
    temp_path = local_path + '.temp'
    urllib.request.urlretrieve(url, temp_path, reporthook=_DownloadProgressBar())
    os.replace(temp_path, local_path)


class _DownloadProgressBar:
    """tqdm-based urlretrieve report hook."""

    def __init__(self) -> None:
        self.pbar = None
        self.previous_downloaded = 0

    def __call__(self, block_num, block_size, total_size):
        import tqdm

        if not self.pbar:
            self.pbar = tqdm.tqdm(
                total=total_size, unit_scale=True, unit='B', unit_divisor=1024
            )
        downloaded = block_num * block_size
        change = downloaded - self.previous_downloaded
        self.previous_downloaded = downloaded
        self.pbar.update(change)
