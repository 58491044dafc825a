"""Session-scoped Ray fixture — tests never call ray.init themselves."""

from __future__ import annotations

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def synth_small():
    """Shared small synthetic corpus (generated once per session)."""
    from mix_blink_ray.sources.synth import SynthConfig, generate

    return generate(SynthConfig(n_convs=80))
