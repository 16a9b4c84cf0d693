"""
Tests of the kernel ingestion layer (DAF/SPK/LSK/PCK parsing) and the time
system against golden values computed with CSPICE (via the reference
project's committed test expectations).
"""

import glob
import math
import os

import numpy as np
import pytest

from common import KERNEL_PATH

import planetmapper_tpu  # noqa: F401  (enables x64)
from planetmapper_tpu.core.ephemeris import Ephemeris
from planetmapper_tpu.core.time import (
    LeapSecondData,
    et_to_utc_string,
    utc_string_to_et,
)
from planetmapper_tpu.kernels import naif_ids
from planetmapper_tpu.kernels.daf import read_daf
from planetmapper_tpu.kernels.pool import KernelPool, sort_kernel_paths


@pytest.fixture(scope='module')
def pool():
    p = KernelPool()
    paths = []
    for pattern in ('**/*.bsp', '**/*.tls', '**/*.tpc'):
        paths.extend(glob.glob(os.path.join(KERNEL_PATH, pattern), recursive=True))
    for path in sort_kernel_paths(paths):
        p.furnsh(path)
    return p


@pytest.fixture(scope='module')
def lsk(pool):
    return LeapSecondData.from_pool(pool.text)


@pytest.fixture(scope='module')
def eph(pool):
    return Ephemeris(pool)


class TestDaf:
    def test_read_all_fixture_kernels(self):
        paths = glob.glob(os.path.join(KERNEL_PATH, '**/*.bsp'), recursive=True)
        assert len(paths) >= 5
        for path in paths:
            daf = read_daf(path)
            assert daf.nd == 2 and daf.ni == 6
            assert len(daf.summaries) >= 1


class TestTime:
    # Golden: reference tests/test_body.py:110
    def test_str2et_golden(self, lsk):
        assert utc_string_to_et('2005-01-01T00:00:00', lsk) == pytest.approx(
            157809664.1839331, abs=1e-6
        )

    def test_round_trip(self, lsk):
        for utc in ['2005-01-01T00:00:00.000000', '1999-12-31T23:59:59.123456',
                    '2016-02-29T12:34:56.500000']:
            et = utc_string_to_et(utc, lsk)
            assert et_to_utc_string(et, lsk) == utc

    def test_formats(self, lsk):
        et_ref = utc_string_to_et('2005-01-01T00:00:00', lsk)
        assert utc_string_to_et('2005-01-01', lsk) == et_ref
        assert utc_string_to_et('2005 JAN 01 00:00:00', lsk) == et_ref
        assert utc_string_to_et('2005-001', lsk) == et_ref
        assert utc_string_to_et('JD 2453371.5', lsk) == pytest.approx(et_ref, abs=1e-5)

    def test_leap_second_offsets(self, lsk):
        # delta (ET - UTC) straddling the 2006 leap second
        et_2005 = utc_string_to_et('2005-06-01T00:00:00', lsk)
        et_2006 = utc_string_to_et('2006-06-01T00:00:00', lsk)
        raw_gap = 365 * 86400.0
        assert et_2006 - et_2005 == pytest.approx(raw_gap + 1.0, abs=1e-3)


class TestNaifIds:
    def test_round_trips(self):
        assert naif_ids.bods2c('jupiter') == 599
        assert naif_ids.bods2c(' JuPiTeR ') == 599
        assert naif_ids.bods2c('599') == 599
        assert naif_ids.bods2c(599) == 599
        assert naif_ids.bodc2s(599) == 'JUPITER'
        assert naif_ids.bods2c('HST') == -48
        assert naif_ids.bods2c('daphnis') == 635
        with pytest.raises(naif_ids.BodyNotFoundError):
            naif_ids.bods2c('<<< test >>>')


class TestPck:
    def test_jupiter_radii(self, pool):
        radii = pool.bodvar(599, 'RADII', 3)
        assert list(radii) == [71492.0, 71492.0, 66854.0]

    def test_pm_spin_sense(self, pool):
        assert pool.bodvar(599, 'PM')[1] > 0  # Jupiter prograde
        assert pool.bodvar(799, 'PM')[1] < 0  # Uranus retrograde


class TestEphemeris:
    """Golden values from reference tests (CSPICE-derived)."""

    ET = 157809664.1839331  # 2005-01-01T00:00:00 UTC

    def test_jupiter_from_hst_cn(self, eph):
        # Goldens: reference tests/test_basic_body.py:28-33. HST positions
        # come from an independent SGP4 implementation so agree with CSPICE
        # to ~15 m; angular tolerances here are ~100x tighter than the
        # sub-millidegree parity requirement.
        state, lt = eph.spkezr(599, -48, self.ET, 'CN')
        state = np.asarray(state)
        assert float(lt) == pytest.approx(2734.018326542542, abs=1e-6)
        pos = state[:3]
        ra = math.degrees(math.atan2(pos[1], pos[0])) % 360
        dec = math.degrees(math.asin(pos[2] / np.linalg.norm(pos)))
        assert ra == pytest.approx(196.37198562427025, abs=1e-7)
        assert dec == pytest.approx(-5.565793847134351, abs=1e-7)

    def test_jupiter_from_earth_geometric_vs_lt(self, eph):
        state_none, lt_none = eph.spkezr(599, 399, self.ET, 'NONE')
        state_cn, lt_cn = eph.spkezr(599, 399, self.ET, 'CN')
        # Light time correction moves apparent position by ~ lt * omega
        assert float(lt_none) == pytest.approx(float(lt_cn), rel=1e-4)
        assert not np.allclose(state_none[:3], state_cn[:3], atol=100.0)

    def test_cn_plus_s_differs(self, eph):
        state_cn, _ = eph.spkezr(599, 399, self.ET, 'CN')
        state_cns, _ = eph.spkezr(599, 399, self.ET, 'CN+S')
        # Stellar aberration: up to v/c ~ 1e-4 rad at 8.2e8 km distance
        shift = np.linalg.norm(np.asarray(state_cns[:3] - state_cn[:3]))
        assert 1e3 < shift < 2e5

    def test_batched_times_match_scalar(self, eph):
        ets = self.ET + np.linspace(0, 3600.0, 5)
        states, lts = eph.spkezr(599, 399, ets, 'CN')
        for i, et in enumerate(ets):
            s, lt = eph.spkezr(599, 399, float(et), 'CN')
            np.testing.assert_allclose(np.asarray(states)[i], np.asarray(s),
                                       rtol=0, atol=1e-6)

    def test_moon_type17_equinoctial(self, eph):
        # AMALTHEA (505) is a type 17 segment in a B1950 frame: check the
        # orbit radius is physically correct (~181,400 km from Jupiter).
        state = np.asarray(eph.rel_state_geometric(505, 599, self.ET))
        r = np.linalg.norm(state[:3])
        assert 175000 < r < 186000
        # speed of a circular orbit at that radius ~ 26.5 km/s
        v = np.linalg.norm(state[3:])
        assert 20.0 < v < 35.0
