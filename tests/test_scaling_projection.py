"""Pin the sharded streamed step's per-step collective-byte LAW.

The multi-chip projection (benchmarks/scaling_projection.py) rests on
two structural facts about the compiled row-slice streamed step:

* the only batch-scale collective traffic is the forward buffer
  all-gather class (~width bytes/sample) — nothing all-to-alls or
  all-reduces per POSITION;
* the backward gradient reduction all-reduces [width, bucket]-scale
  payloads (bytes per UNIQUE, saturating at the derived bucket), never
  table-scale.

A regression that adds a collective proportional to batch*width or to
the table breaks the projected 94-96% scaling efficiency; this test
fails it.
"""

import numpy as np
import pytest

from benchmarks.scaling_projection import collective_bytes, sharded_step_hlo

B, V = 128, 131072
U0, U1 = 2048, 4096


@pytest.fixture(scope="module")
def laws(mesh_env):
    h0 = sharded_step_hlo(8, B, V, layers=(32, 16), unique_bucket=U0)
    h1 = sharded_step_hlo(8, B, V, layers=(32, 16), unique_bucket=U1)
    return collective_bytes(h0), collective_bytes(h1)


@pytest.fixture(scope="module")
def mesh_env():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh (conftest)")
    return True


def test_no_alien_collectives(laws):
    c0, _ = laws
    kinds = set(c0) - {"_count"}
    assert kinds <= {"all_gather", "all_reduce", "reduce_scatter",
                     "collective_permute"}, kinds
    assert "all_to_all" not in kinds


def test_allreduce_scales_with_bucket_not_positions(laws):
    c0, c1 = laws
    ar0, ar1 = c0.get("all_reduce", 0), c1.get("all_reduce", 0)
    per_unique = (ar1 - ar0) / (U1 - U0)
    # the grad psum carries width (128 lanes) f32 per unique slot, for
    # a small number of psums (deep+wide grads + tiny scalars); pin a
    # 3x-psum budget and a floor that proves the reduction exists
    assert 0 < per_unique <= 3 * 128 * 4, per_unique
    # the bucket-independent remainder must be batch/dense-scale, far
    # below table bytes (table = 128-sublane * V/8 cols * 4B ~ 8.4 MB)
    assert ar0 - per_unique * U0 < 4 * B * 39 * 4 + 2_000_000


def test_gather_traffic_is_batch_scale(laws):
    c0, c1 = laws
    for c in (c0, c1):
        ag = c.get("all_gather", 0) + c.get("collective_permute", 0)
        # forward unique-row buffer exchange: bounded by a few
        # width-lane f32 rows per position
        assert ag <= 4 * B * 39 * 128 * 4, ag
