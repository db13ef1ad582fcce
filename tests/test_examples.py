"""CI harness for the example scripts + doctests.

Mirrors the reference's CI, which executes every tutorial/example and the
doc snippets on each run (``ci/gitlab_jenkins_templates/
ubuntu_test_CI.jenkins:113-231``).  Examples run as subprocesses on CPU
with tiny configs.
"""
import doctest
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, 'examples')


def _run_example(name, *args, timeout=600):
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    result = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, name), *args],
        capture_output=True, text=True, timeout=timeout, env=env)
    assert result.returncode == 0, (
        f'{name} failed:\n{result.stdout[-2000:]}\n{result.stderr[-2000:]}')
    return result.stdout


def test_example_dibr_inverse_rendering(tmp_path):
    out = _run_example(
        'dibr_inverse_rendering.py', '--height', '32', '--width', '32',
        '--num-views', '2', '--steps', '3',
        '--logdir', str(tmp_path / 'timelapse'))
    assert 'done' in out


def test_example_dmtet_demo():
    out = _run_example('dmtet_demo.py', '--res', '4', '--steps', '2')
    assert 'done' in out


def test_example_spc_raytrace_demo():
    out = _run_example('spc_raytrace_demo.py', '--level', '4',
                       '--rays', '256')
    assert 'integrated features' in out


def test_example_sg_lighting_demo():
    out = _run_example('sg_lighting_demo.py', '--size', '32',
                       '--steps', '3')
    assert 'done' in out


def test_example_camera_tour():
    out = _run_example('camera_tour.py')
    assert 'done' in out
    assert 'round-trip close: True' in out


def _all_modules():
    """Every importable kaolin_tpu module (reference CI runs
    ``pytest --doctest-modules`` over the whole package,
    ``ubuntu_test_CI.jenkins:113-117``)."""
    import pkgutil
    import kaolin_tpu
    names = ['kaolin_tpu']
    for info in pkgutil.walk_packages(kaolin_tpu.__path__,
                                      prefix='kaolin_tpu.'):
        names.append(info.name)
    return sorted(names)


@pytest.mark.parametrize('module_name', _all_modules())
def test_doctests(module_name):
    import importlib
    try:
        mod = importlib.import_module(module_name)
    except ImportError as e:  # optional heavy deps (pxr, ipycanvas, ...)
        pytest.skip(f'optional dependency missing: {e}')
    results = doctest.testmod(mod, verbose=False)
    assert results.failed == 0, f'{results.failed} doctest failures'
