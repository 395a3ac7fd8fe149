"""Driver entry contract (__graft_entry__.py).

Regression: the container's sitecustomize pre-imports jax and can
override JAX_PLATFORMS, so ``dryrun_multichip`` must force the CPU
platform via jax.config itself — including when the caller has set
JAX_PLATFORMS=cpu in the environment (the case that used to skip the
forcing and fail with "need N devices, have 1").
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("env_platforms", [None, "cpu"])
def test_dryrun_multichip_2dev_subprocess(env_platforms):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    if env_platforms is not None:
        env["JAX_PLATFORMS"] = env_platforms
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(2); print('OK')"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "OK" in out.stdout
    # all seven regimes ran
    for tag in ("dryrun_multichip(2)", "column-slice", "a2a lookup",
                "cache-mode", "dynamic-hash", "multitable", "online loop"):
        assert tag in out.stdout, (tag, out.stdout)
