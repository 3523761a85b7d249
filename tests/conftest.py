"""Test harness: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU PJRT plugin in every
python process and forces ``jax_platforms="axon,cpu"``, so plain env vars are
not enough — we must override via jax.config before any backend initializes
(SURVEY.md §4: test multi-host DP with ``--xla_force_host_platform_device_count``
fakes).
"""

import os
import sys

# The sitecustomize registers the axon TPU PJRT client in every python
# process (it runs at interpreter start).  Even with jax_platforms=cpu the
# live tunnel client can SIGABRT the process mid-suite when other processes
# load the tunnel (observed twice in test_train_steps readbacks).  Re-exec
# the interpreter without the trigger env var so sitecustomize skips
# registration entirely and the suite runs on a pure-CPU backend.  The exec
# happens in pytest_configure (not at import) so global capture can be
# suspended first — the re-exec'd process must inherit the ORIGINAL stdout,
# not pytest's capture temp file.
#
# Escape hatch: CONAN_TPU_TESTS_KEEP_AXON=1 skips the re-exec entirely (for
# non-CLI invocations that can't tolerate it).  The child is marked with
# CONAN_TPU_TESTS_REEXECED so it never re-execs again, and xdist workers
# (PYTEST_XDIST_WORKER) never re-exec — only their controller may.
_REEXEC = bool(os.environ.get("PALLAS_AXON_POOL_IPS")) and \
    not os.environ.get("CONAN_TPU_TESTS_KEEP_AXON") and \
    not os.environ.get("CONAN_TPU_TESTS_REEXECED") and \
    not os.environ.get("PYTEST_XDIST_WORKER")

if not _REEXEC:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = \
            flags + " --xla_force_host_platform_device_count=8"

    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    if _REEXEC:
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            capman.suspend_global_capture(in_=True)
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS")
        env["JAX_PLATFORMS"] = "cpu"
        env["CONAN_TPU_TESTS_REEXECED"] = "1"
        # own cache namespace: axon-registered processes compile CPU AOT
        # results with different machine-feature flags (+prefer-no-scatter…);
        # loading those here logs ISA-mismatch errors and risks SIGILL
        env.setdefault("CONAN_TPU_COMP_CACHE",
                       os.path.expanduser("~/.cache/jax_comp_cache_cputests"))
        # invocation_params.args is the canonical argument tuple pytest was
        # invoked with — correct for both CLI runs and pytest.main([...]),
        # unlike sys.argv (which a programmatic caller never set for us).
        args = list(config.invocation_params.args)
        os.execve(sys.executable,
                  [sys.executable, "-m", "pytest", *args], env)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
