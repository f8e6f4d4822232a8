"""Config + observability smoke tests."""

import numpy as np
import jax.numpy as jnp

from radix_sort_tpu.config import DEFAULT, EngineConfig
from radix_sort_tpu.utils.profiling import PhaseTimer, speed_of_light_s


def test_config_pipeline_kwargs_round_trip():
    cfg = EngineConfig(chunk_elems=4096, buckets_per_round=32)
    kw = cfg.pipeline_kwargs()
    assert kw == dict(
        m=4096,
        K=32,
        alpha=DEFAULT.capacity_factor,
        samples1=DEFAULT.round1_samples_per_chunk,
        samples2=DEFAULT.round2_samples,
    )


def test_config_is_frozen():
    import dataclasses
    import pytest

    with pytest.raises(dataclasses.FrozenInstanceError):
        DEFAULT.chunk_elems = 1


def test_phase_timer_report(rng):
    t = PhaseTimer()
    x = jnp.asarray(rng.integers(0, 100, 1024, dtype=np.uint32))
    t.time_fn("add", lambda a: a + 1, x, bytes_moved=x.size * 8)
    with t.phase("noop"):
        pass
    rep = t.report()
    assert "add" in rep and "total" in rep and "GB/s" in rep


def test_speed_of_light_monotone():
    assert speed_of_light_s(2_000_000) == 2 * speed_of_light_s(1_000_000)
