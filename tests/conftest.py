import pytest


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    """One Ray session per pytest run (driver contract: tests own it)."""
    import ray
    import ray.data

    from ves_ray.tuning import tune_memory_allocator
    tune_memory_allocator()
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
