"""Round-11 additions: isolation-time bench drift sampling and the
composed corpus curation pipeline."""

from __future__ import annotations


def test_bench_prev_name_drift_prefers_per_entry_stamp():
    """VERDICT r10 #1: isolated movers must band against the drift
    their PREVIOUS numbers were measured under. r11+ artifacts stamp
    `iso_drift` per entry (sampled immediately before that entry's
    fresh-JVM run); older artifacts only carry the run-wide
    `drift_used`, which sampled ambience mid-suite — hours before
    the end-of-suite isolated pass it was used to band."""
    from bench import _prev_name_drift

    # per-name stamp wins over the run-wide fallback
    assert _prev_name_drift({"cold": 10.0, "iso_drift": 1.46}, 1.072) == 1.46
    # legacy artifact rows (no stamp) fall back to run-wide
    assert _prev_name_drift({"cold": 10.0}, 1.072) == 1.072
    # a zero/absent stamp never divides by zero downstream
    assert _prev_name_drift({"iso_drift": 0.0}, 1.2) == 1.2
    assert _prev_name_drift({}, 1.0) == 1.0
