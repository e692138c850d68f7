"""Autotuner mechanics: knob plumbing, staged search, persistent cache.

The search's TIMING quality can only be judged on real hardware (the tuner
is exercised there by benchmarks/bench_autotune.py); these tests pin the
machinery: candidate enumeration, winner selection, cache round-trip, and
that tuned knobs actually reach the kernels and stay bit-exact.
"""

import json

import numpy as np
import pytest

from sventt_tpu import TEST_GENERATOR, TEST_MODULUS, GoldenNTT, Modulus
from sventt_tpu.plan import NTT, NttConfig, autotune


def _cfg(n=1 << 10, **kw):
    return NttConfig(TEST_MODULUS, TEST_GENERATOR, n, **kw)


def test_knob_fields_validate():
    _cfg(block_b=128, stages_per_call=3, lane_rows=32, max_fused=128)
    with pytest.raises(ValueError):
        _cfg(block_b=100)
    with pytest.raises(ValueError):
        _cfg(lane_rows=-8)


def test_knobs_reach_kernels_bit_exact(rng):
    """Non-default knobs through the full NTT wrapper stay bit-exact."""
    n = 1 << 8
    cfg = _cfg(
        n, engine="pallas", strategy="six_step", n0=16, n1=16,
        block_b=128, stages_per_call=2, lane_rows=16, max_fused=16,
    )
    ntt = NTT(cfg)
    mod = Modulus(TEST_MODULUS, TEST_GENERATOR)
    x = rng.integers(0, TEST_MODULUS, n, dtype=np.uint64)
    out = ntt.forward_numpy(x)
    want = GoldenNTT(n, mod).forward(list(map(int, x)))
    assert list(map(int, out)) == want
    assert (ntt.inverse_numpy(out) == x).all()
    # knobs actually reached the prepared tables
    leaf = ntt._fwd_tables.leaf[(16, "pallas")]
    assert leaf.block_b == 128 and leaf.spc == 2


def test_tune_cpu_picks_jnp_and_caches(tmp_path, monkeypatch):
    """On the CPU backend the tuner only races XLA candidates (interpret-
    mode pallas timings are meaningless) and persists its winner."""
    cache = tmp_path / "tune.json"
    monkeypatch.setattr(autotune, "_time_candidate", lambda cfg, iters, reps=2: 1.0)
    cfg = _cfg(1 << 10, tune=True)
    tuned = autotune.tune(cfg, cache_path=cache)
    assert tuned.tune is False
    assert tuned.engine == "jnp"
    assert tuned.modmul in ("montgomery", "shoup")
    data = json.loads(cache.read_text())
    [entry] = data.values()
    assert entry["knobs"]["engine"] == "jnp"

    # second call must hit the cache, never the search
    def boom(*a, **k):
        raise AssertionError("search ran on a cache hit")

    monkeypatch.setattr(autotune, "search", boom)
    tuned2 = autotune.tune(cfg, cache_path=cache)
    assert tuned2 == tuned


def test_staged_search_selects_measured_minimum(monkeypatch):
    """Force a pallas candidate space with a synthetic cost model and check
    greedy coordinate descent lands on the cost minimum."""
    monkeypatch.setattr(autotune, "_engine_candidates", lambda cfg: ["pallas"])
    monkeypatch.setattr(
        autotune, "_modmul_candidates", lambda cfg: ["montgomery", "shoup"]
    )

    def fake_time(cfg, iters, reps=2):
        cost = 10.0
        if cfg.modmul == "shoup":
            cost -= 1.0
        if cfg.max_fused == 128:
            cost -= 0.5
        if cfg.block_b == 512:
            cost -= 0.25
        if cfg.stages_per_call == 3:
            cost -= 0.25
        if cfg.lane_rows == 128:
            cost -= 0.125
        return cost

    monkeypatch.setattr(autotune, "_time_candidate", fake_time)
    best, _, timings = autotune.search(_cfg(1 << 12, engine="pallas"))
    assert best.modmul == "shoup"
    assert best.max_fused == 128
    assert best.block_b == 512
    assert best.stages_per_call == 3
    assert best.lane_rows == 128
    # stage A raced both modmuls, stages B/C walked every grid value once
    assert "pallas/montgomery" in timings and "pallas/shoup" in timings


def test_search_survives_failing_candidates(monkeypatch):
    monkeypatch.setattr(autotune, "_engine_candidates", lambda cfg: ["pallas"])
    monkeypatch.setattr(
        autotune, "_modmul_candidates", lambda cfg: ["montgomery", "shoup"]
    )

    def flaky(cfg, iters, reps=2):
        if cfg.modmul == "shoup" or cfg.block_b == 512:
            raise RuntimeError("compile blew up")
        return 5.0

    monkeypatch.setattr(autotune, "_time_candidate", flaky)
    best, _, timings = autotune.search(_cfg(1 << 12, engine="pallas"))
    assert best.modmul == "montgomery"
    assert best.block_b != 512
    assert timings["pallas/shoup"] == float("inf")


def test_tune_true_resolves_via_wrapper(tmp_path, monkeypatch):
    """NTT(NttConfig(..., tune=True)) transparently builds with tuned knobs."""
    monkeypatch.setenv(autotune.CACHE_ENV, str(tmp_path / "t.json"))
    monkeypatch.setattr(autotune, "_time_candidate", lambda cfg, iters, reps=2: 1.0)
    ntt = NTT(_cfg(1 << 10, tune=True))
    assert ntt.config.tune is False
    assert ntt.config.engine == "jnp"
    x = np.arange(1 << 10, dtype=np.uint64)
    out = ntt.forward_numpy(x)
    assert int(out[0]) == int(x.astype(object).sum() % TEST_MODULUS)
    assert (ntt.inverse_numpy(out) == x).all()


def test_playoff_finalist_selection(monkeypatch):
    """Near-tied candidates are re-raced interleaved; the playoff winner is
    returned even when the greedy pass ranked it second."""
    monkeypatch.setattr(autotune, "_backend", lambda: "tpu")
    monkeypatch.setattr(autotune, "_engine_candidates", lambda cfg: ["jnp"])
    monkeypatch.setattr(
        autotune, "_modmul_candidates", lambda cfg: ["montgomery", "shoup"]
    )
    # greedy pass: shoup barely wins; montgomery within the 1.2x margin
    costs = {"montgomery": 1.05, "shoup": 1.0}
    monkeypatch.setattr(
        autotune, "_time_candidate",
        lambda cfg, iters, reps=2: costs[cfg.modmul],
    )
    seen = {}

    def fake_playoff(finalists, iters, timings):
        seen["tags"] = [tag for tag, _ in finalists]
        # interleaved re-race flips the ranking
        winner = next(cfg for tag, cfg in finalists if cfg.modmul == "montgomery")
        return winner, 0.9

    monkeypatch.setattr(autotune, "_playoff", fake_playoff)
    best, _, _ = autotune.search(_cfg(1 << 10))
    assert best.modmul == "montgomery"
    assert seen["tags"] == ["jnp/shoup", "jnp/montgomery"]


def test_playoff_skipped_when_clear_winner(monkeypatch):
    """No playoff when the runner-up is outside the margin."""
    monkeypatch.setattr(autotune, "_backend", lambda: "tpu")
    monkeypatch.setattr(autotune, "_engine_candidates", lambda cfg: ["jnp"])
    monkeypatch.setattr(
        autotune, "_modmul_candidates", lambda cfg: ["montgomery", "shoup"]
    )
    costs = {"montgomery": 2.0, "shoup": 1.0}
    monkeypatch.setattr(
        autotune, "_time_candidate",
        lambda cfg, iters, reps=2: costs[cfg.modmul],
    )

    def boom(*a, **k):
        raise AssertionError("playoff ran with a clear winner")

    monkeypatch.setattr(autotune, "_playoff", boom)
    best, _, _ = autotune.search(_cfg(1 << 10))
    assert best.modmul == "shoup"


def test_subprocess_timer_child():
    """The isolated per-candidate measurement (the TPU path's subprocess
    child) round-trips a config through JSON, times a real transform in a
    fresh interpreter, and reports a sane median."""
    ms = autotune._time_candidate_isolated(_cfg(1 << 8), seconds=0.05, reps=2)
    assert 0 < ms < 60_000


def test_subprocess_verify_winner(monkeypatch):
    """The isolated winner-verification child compares base vs tuned
    configs bit-exactly in a fresh interpreter (the TPU path)."""
    monkeypatch.setattr(autotune, "_backend", lambda: "tpu")
    base = _cfg(1 << 8, tune=True)
    # identical math, different knob -> must pass
    autotune._verify_winner(base, base.with_(tune=False, modmul="shoup"))
    # a different generator is a different transform -> must fail
    bad = NttConfig(TEST_MODULUS, 11, 1 << 8, tune=False)
    with pytest.raises(AssertionError):
        autotune._verify_winner(base, bad)


def test_cache_key_pins_constraints():
    """A search constrained by pinned engine/modmul/knobs explores a
    different candidate set, so its cache entry must not collide with the
    unconstrained tune of the same (N, g, n, device)."""
    free = autotune.cache_key(_cfg(1 << 10))
    pinned = autotune.cache_key(_cfg(1 << 10, engine="pallas"))
    assert free != pinned
    assert "engine=pallas" in pinned
    # unconstrained keys keep the legacy bare format (shipped cache stays
    # valid)
    assert free.count(":") == 4
    assert autotune.cache_key(_cfg(1 << 10, modmul="shoup")) != pinned


def test_cpu_tune_does_not_write_repo_cache(tmp_path, monkeypatch):
    """Host-CPU timings are machine-local noise; tune() must not dirty the
    repo-shipped default cache on a non-tpu backend."""
    fake_default = tmp_path / "repo_cache.json"
    monkeypatch.setattr(autotune, "_DEFAULT_CACHE", fake_default)
    monkeypatch.delenv(autotune.CACHE_ENV, raising=False)
    monkeypatch.setattr(autotune, "_time_candidate", lambda cfg, iters, reps=2: 1.0)
    tuned = autotune.tune(_cfg(1 << 10, tune=True))
    assert tuned.engine == "jnp"  # search still ran and resolved knobs
    assert not fake_default.exists()
    # an explicit cache path still persists (test/bench isolation)
    explicit = tmp_path / "explicit.json"
    autotune.tune(_cfg(1 << 10, tune=True), cache_path=explicit)
    assert explicit.exists()
