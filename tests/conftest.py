"""Test configuration: force CPU with 8 virtual devices for sharding tests.

Mirrors the reference test strategy (SURVEY.md §4): unit tests run on a fake
multi-device CPU mesh so multi-chip sharding is exercised without TPU pods.

NOTE: the environment pins JAX_PLATFORMS=axon (remote TPU tunnel) and a
sitecustomize registers the axon PJRT plugin at interpreter startup, so we
must override both the env var (for subprocesses) and jax.config here,
before any test module imports jax ops.
"""
import os

# the dryrun's config-#5 weak-scaling sweep spawns 1024^2 CPU renders —
# minutes per point; the unit suite exercises the sweep machinery via
# the entry test at small shapes instead
os.environ.setdefault("KAOLIN_SKIP_WEAK_SCALE", "1")

if os.environ.get("KAOLIN_TPU_TESTS") == "1":
    # opt-in real-TPU mode: leave the axon platform active so the
    # @pytest.mark.tpu smoke tests exercise compiled Mosaic kernels
    # (run: KAOLIN_TPU_TESTS=1 pytest tests/test_tpu_smoke.py)
    import jax  # noqa: F401
else:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: the suite is XLA-CPU-compile-bound on
    # small hosts; reruns hit the cache and finish in a fraction
    _cache = os.path.join(os.path.dirname(__file__), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
