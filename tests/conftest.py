"""Test harness: force an 8-device virtual CPU platform so sharding/pjit
paths are exercised without TPU hardware (SURVEY.md §4 test strategy)."""

import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize prepends 'axon' to jax_platforms,
# silently routing tests through the TPU tunnel; force pure-CPU here.
jax.config.update('jax_platforms', 'cpu')
assert all(d.platform == 'cpu' for d in jax.devices())

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: tests marked `slow` (the heaviest differential runs)
    are opt-in via RUN_SLOW=1 so the default inner loop stays fast."""
    if os.environ.get('RUN_SLOW') == '1':
        return
    skip = pytest.mark.skip(reason='slow tier; RUN_SLOW=1 to enable')
    for item in items:
        if 'slow' in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope='session')
def repo_root():
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
