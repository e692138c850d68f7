"""Device-built inter-step twiddles and the companion-free (wp=None) path.

These are production-critical at n >= 2^16 / 2^26 (plan/planner.py
thresholds) but the CPU suite tops out far below; here the thresholds are
forced down so the device `lax.scan` builder and the `mont_mul_full`
companion-free multiply run at small n against the host tables and the
golden model (advisor round-1 finding #3).
"""

import numpy as np
import pytest

from sventt_tpu.field.golden import GoldenNTT
from sventt_tpu.field.limb import u64_to_numpy
from sventt_tpu.field.modulus import (
    FLAGSHIP_GENERATOR,
    FLAGSHIP_MODULUS,
    TEST_GENERATOR,
    TEST_MODULUS,
    Modulus,
)
from sventt_tpu.ops.twiddle import (
    sixstep_row_twiddles,
    sixstep_row_twiddles_device,
    sixstep_row_twiddles_inverse,
)
from sventt_tpu.plan import NTT, NttConfig, planner

MODULI = [
    (TEST_MODULUS, TEST_GENERATOR),
    (FLAGSHIP_MODULUS, FLAGSHIP_GENERATOR),
]


@pytest.mark.parametrize("modulus,generator", MODULI)
@pytest.mark.parametrize("inverse", [False, True])
def test_device_builder_matches_host(modulus, generator, inverse):
    mod = Modulus(modulus, generator)
    n0, n1 = 16, 32
    host = (
        sixstep_row_twiddles_inverse(mod, n0, n1)
        if inverse
        else sixstep_row_twiddles(mod, n0, n1)
    )
    dev = sixstep_row_twiddles_device(mod, n0, n1, inverse=inverse)
    assert (u64_to_numpy(dev.w) == u64_to_numpy(host.w)).all()
    assert (u64_to_numpy(dev.wp) == u64_to_numpy(host.wp)).all()


@pytest.mark.parametrize("modulus,generator", MODULI)
def test_device_builder_companion_free(modulus, generator):
    mod = Modulus(modulus, generator)
    host = sixstep_row_twiddles(mod, 8, 16)
    dev = sixstep_row_twiddles_device(mod, 8, 16, with_companion=False)
    assert dev.wp is None
    assert (u64_to_numpy(dev.w) == u64_to_numpy(host.w)).all()


@pytest.mark.parametrize("inverse", [False, True])
def test_device_builder_solinas_plain(inverse):
    """Solinas-mode device builder: PLAIN canonical values matching the
    host plain tables bit-for-bit, always companion-free."""
    from sventt_tpu.ops.twiddle import sixstep_row_twiddles_plain

    mod = Modulus(FLAGSHIP_MODULUS, FLAGSHIP_GENERATOR)
    n0, n1 = 16, 32
    host = sixstep_row_twiddles_plain(mod, n0, n1, inverse=inverse)
    dev = sixstep_row_twiddles_device(
        mod, n0, n1, inverse=inverse, modmul="solinas"
    )
    assert dev.wp is None and host.wp is None
    assert (u64_to_numpy(dev.w) == u64_to_numpy(host.w)).all()


def test_wrapper_solinas_device_twiddles(rng, monkeypatch):
    """Full wrapper path with the solinas engine forced onto the device
    twiddle builder (thresholds lowered): bit-exact vs golden + roundtrip."""
    monkeypatch.setattr(planner, "DEVICE_TWIDDLE_THRESHOLD", 1 << 6)
    cfg = NttConfig(
        FLAGSHIP_MODULUS, FLAGSHIP_GENERATOR, 1 << 10, modmul="solinas",
        strategy="six_step",
    )
    ntt = NTT(cfg)
    assert ntt._fwd_tables.split_tw[cfg.split].wp is None
    x = rng.integers(0, cfg.modulus, cfg.n, dtype=np.uint64)
    fwd = ntt.forward_numpy(x)
    golden = GoldenNTT(cfg.n, cfg.mod)
    assert [int(v) for v in fwd] == golden.forward([int(v) for v in x])
    assert (ntt.inverse_numpy(fwd) == x).all()


def test_wrapper_shoup_device_twiddles(rng, monkeypatch):
    """Shoup STAGE engine + device-built split twiddles: the inter-step
    tables stay Montgomery-form (regression: passing modmul='shoup' into
    the device builder raised 'shoup engine requires lazy mode' for every
    shoup config above DEVICE_TWIDDLE_THRESHOLD)."""
    monkeypatch.setattr(planner, "DEVICE_TWIDDLE_THRESHOLD", 1 << 6)
    cfg = NttConfig(
        TEST_MODULUS, TEST_GENERATOR, 1 << 10, modmul="shoup",
        strategy="six_step",
    )
    ntt = NTT(cfg)
    x = rng.integers(0, cfg.modulus, cfg.n, dtype=np.uint64)
    fwd = ntt.forward_numpy(x)
    golden = GoldenNTT(cfg.n, cfg.mod)
    assert [int(v) for v in fwd] == golden.forward([int(v) for v in x])
    assert (ntt.inverse_numpy(fwd) == x).all()


@pytest.mark.parametrize("modulus,generator", MODULI)
def test_wrapper_on_device_twiddles_wp_none(modulus, generator, rng, monkeypatch):
    """Full transform through the device-built, companion-free table path
    (thresholds forced to 0 so every Split level exercises it)."""
    monkeypatch.setattr(planner, "DEVICE_TWIDDLE_THRESHOLD", 0)
    monkeypatch.setattr(planner, "W_ONLY_THRESHOLD", 0)
    cfg = NttConfig(modulus, generator, 1 << 10, strategy="six_step")
    mod = cfg.mod
    ntt = NTT(cfg)
    assert ntt._fwd_tables.split_tw[cfg.split].wp is None
    x = rng.integers(0, modulus, size=cfg.n, dtype=np.uint64)
    fwd = ntt.forward_numpy(x)
    golden = GoldenNTT(cfg.n, mod)
    want = golden.forward([int(v) for v in x])
    assert [int(v) % modulus for v in fwd] == want
    assert (ntt.inverse_numpy(fwd) == x).all()


def test_crosscheck_shared_modulus_parity():
    """shared_modulus must search odd n only (advisor round-1 finding #1:
    an inverted parity made the search loop spin forever on even n)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from examples.magic_series_crosscheck import shared_modulus

    N, g, n = shared_modulus(30)
    assert n == 13051
    assert N == 0x3FFFFFFEA6928001
    assert (N - 1) % (n << 15) == 0


def test_kinnaes_m1():
    from sventt_tpu.apps.kinnaes import kinnaes_magic_series_count

    assert kinnaes_magic_series_count(1) == 1
